"""Significance level maps on TPU (JAX): the parallel heart of the codec.

The reference answers every per-coefficient significance query by walking
the spatial-orientation subtree (reference: src/encoder_decoder.rs:78-121 —
`is_set_sig` / `is_l_sig` recursion, the dominant encode cost). Here the
whole question is precomputed once, data-parallel, as three level maps:

  M[k,i,j] = floor(log2 |x|)   (-1 for 0)      element significance level
  D[k,i,j] = max over all strict descendants of M     ("desc-sig" level)
  G[k,i,j] = max over children of D            ("l-sig" / grandchild level)

With these, `is_element_sig(n) == M >= n`, `is_set_sig(n)` for offspring
sets `== D >= n`, and `is_l_sig(n) == G >= n` — every bit-plane test is a
single comparison. The serial C++ scheduler consumes them directly
(spiht_kernel.cpp computes identical maps on host; this module is the
TPU-resident equivalent for batched pipelines).

Tree structure (SURVEY.md §3.4, reference encoder_decoder.rs:43-75):
  * non-LL node (i,j): children = 2x2 block at (2i, 2j), existing iff
    2i+1 < h and 2j+1 < w  ->  a plain 2x2 max-pool over the top-left
    (h//2, w//2) quadrant of the packed array.
  * LL root (i,j), i<ll_h, j<ll_w: (even,even) has no children; the other
    three map to the 2x2 block at ((i%2)*ll_h + (i//2)*2,
    (j%2)*ll_w + (j//2)*2)  ->  a static gather.

D is computed by fixpoint iteration of "child-max of max(M, D)": after t
rounds every node within height t of the leaves is final, so tree-height
rounds (≈ DWT levels + 1) suffice. Each round is one fused max-pool +
gather over the full array — O(HW log HW) bandwidth-bound work, no
recursion, no data-dependent control flow.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax.numpy as jnp

__all__ = ["significance_maps", "tree_height", "max_n_from_maps"]


@lru_cache(maxsize=None)
def _ll_child_index(ll_h: int, ll_w: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static child-block origins (oi, oj) and no-child mask for LL roots."""
    i = np.arange(ll_h)[:, None]
    j = np.arange(ll_w)[None, :]
    oi = (i % 2) * ll_h + (i // 2) * 2
    oj = (j % 2) * ll_w + (j // 2) * 2
    oi, oj = np.broadcast_arrays(oi, oj)
    nochild = (i % 2 == 0) & (j % 2 == 0)
    return oi, oj, np.broadcast_to(nochild, (ll_h, ll_w))


def tree_height(h: int, w: int, ll_h: int, ll_w: int) -> int:
    """Rounds needed for the descendant-max fixpoint (tree height + slack)."""
    r = max(h / max(ll_h, 1), w / max(ll_w, 1), 2.0)
    return int(np.ceil(np.log2(r))) + 2


def _child_max(X: jnp.ndarray, ll_h: int, ll_w: int) -> jnp.ndarray:
    """max over spatial-orientation-tree children of X, per cell (-1 if none).

    X: (..., H, W) integer array.
    """
    h, w = X.shape[-2], X.shape[-1]
    hh, ww = h // 2, w // 2
    out = jnp.full_like(X, -1)
    if hh > 0 and ww > 0:
        blk = X[..., : 2 * hh, : 2 * ww]
        blk = blk.reshape(X.shape[:-2] + (hh, 2, ww, 2))
        out = out.at[..., :hh, :ww].set(blk.max(axis=(-3, -1)))
    oi, oj, nochild = _ll_child_index(ll_h, ll_w)
    g = jnp.maximum(
        jnp.maximum(X[..., oi, oj], X[..., oi, oj + 1]),
        jnp.maximum(X[..., oi + 1, oj], X[..., oi + 1, oj + 1]),
    )
    g = jnp.where(jnp.asarray(nochild), jnp.asarray(-1, X.dtype), g)
    return out.at[..., :ll_h, :ll_w].set(g)


def significance_maps(
    arr: jnp.ndarray, ll_h: int, ll_w: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute (M, D, G) int8 level maps for an int32 packed coeff array.

    arr: (..., H, W) int32 (any leading batch/channel dims). Jittable,
    static shapes, no host sync.
    """
    h, w = arr.shape[-2], arr.shape[-1]
    absx = jnp.abs(arr)
    # floor(log2 |x|) via 31 monotone threshold counts — exact on integers,
    # no float rounding hazards (hazard #2 applies to max_n only).
    m = jnp.full(arr.shape, -1, dtype=jnp.int8)
    for k in range(31):
        m = m + (absx >= np.int32(1 << k)).astype(jnp.int8)

    d = jnp.full_like(m, -1)
    for _ in range(tree_height(h, w, ll_h, ll_w)):
        d = _child_max(jnp.maximum(m, d), ll_h, ll_w)
    g = _child_max(d, ll_h, ll_w)
    return m, d, g


def max_n_from_maps(m: jnp.ndarray) -> jnp.ndarray:
    """Exact-integer initial bit-plane index, max(floor(log2 |x|), 0).

    NOTE: the bitstream-authoritative max_n is the reference's f32-truncated
    log2 (hazard #2, replicated by the C++ kernel and the oracle); for
    magnitudes >= 2^24 sitting just below a power of two the f32 cast rounds
    up and yields one MORE than this exact value (e.g. |x| = 2^25 - 2).
    This device-side variant is for planning/statistics (bit budgeting,
    plane counts), not for stream framing. max == 0 saturates to 0.
    """
    return jnp.maximum(m.max(axis=(-2, -1)), 0).astype(jnp.int32)
