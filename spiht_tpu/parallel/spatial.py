"""Spatially-sharded DWT: one huge image split across devices along W.

The reference does whole-image DWTs with no tiling (README.md:9); scaling
to 8K+ images on a TPU pod slice means sharding the image across chips and
exchanging only filter-support-sized halos over ICI. This module implements
that with explicit collectives inside `shard_map`:

 * The level-1 column pass (the dominant cost: full-resolution data) runs
   with the W axis sharded over a mesh axis. Each shard pulls a left halo
   of F-2 columns from its neighbor via `lax.ppermute` (one ICI hop); the
   global boundary extension (reflect/symmetric/...) is materialized
   locally by the edge shards, so results are EXACTLY the unsharded
   transform — boundary semantics included.
 * The row pass is along the unsharded H axis — fully local.
 * Deeper levels operate on geometrically shrinking data (<= 1/4 of the
   work); they run replicated after one `all_gather` of the level-1
   subbands. (Recursively sharding deeper levels is a later optimization;
   the non-dyadic boundary growth of pywt geometry makes their shard
   bookkeeping irregular.)

Output-ownership math (per 1D pass of global length W, n shards,
Ws = W/n): out_len = (W+F-1)//2; shard s owns outputs [s*q, s*q+q),
q = Ws//2; the last shard additionally owns the e = (F-1)//2 tail outputs
whose windows read only right-extension values. All shards compute
q + e outputs so shapes stay uniform; interior shards' tail outputs are
dropped at reassembly. For output j on shard s, the window in local
"halo + block + tail" coordinates is exactly [2j, 2j+F), so the same
shifted-MAC kernel as the single-device path applies verbatim.

Requires: W % n == 0 and Ws even. Exactness is asserted against the
single-device transform in tests/test_parallel.py on a virtual 8-device
CPU mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import inspect

try:  # jax>=0.8: top-level function; older: experimental module
    from jax import shard_map as _shard_map  # type: ignore[attr-defined]
except ImportError:
    from jax.experimental.shard_map import shard_map as _shard_map  # type: ignore

# replication checking kwarg was renamed check_rep -> check_vma in jax 0.8;
# outputs here are all_gather-reassembled (identical on every shard) but the
# varying-axis tracker can't see that, so it must be disabled either way
_CHECK_KW = (
    "check_vma"
    if "check_vma" in inspect.signature(_shard_map).parameters
    else "check_rep"
)


def shard_map(f, *, mesh, in_specs, out_specs):
    return _shard_map(
        f,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        **{_CHECK_KW: False},
    )

from ..wavelets import dwt
from ..wavelets.filters import Wavelet, build_wavelet, dwt_coeff_len

__all__ = ["sharded_dwt2_level1", "sharded_wavedec2_packed"]


def _col_pass_local(x_local, wav: Wavelet, mode: str, axis_name: str, n: int):
    """Per-shard body: level-1 column (last-axis) DWT with halo exchange.

    x_local: (..., H, Ws). Returns (cA, cD) of shape (..., H, q+e) where
    the last e columns are only meaningful on the last shard.
    """
    F = wav.dec_len
    halo = F - 2
    e = (F - 1) // 2
    Ws = x_local.shape[-1]
    q = Ws // 2
    s = lax.axis_index(axis_name)

    # neighbor halo: shard s receives the rightmost F-2 columns of s-1
    right_edge = x_local[..., Ws - halo :]
    left_recv = lax.ppermute(
        right_edge, axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )
    # edge shards materialize the global boundary extension locally
    ext_full = dwt.extend(x_local, F - 1, mode)  # (..., Ws + 2F - 2)
    left0 = ext_full[..., 1 : 1 + halo]          # x_ext[-(F-2) .. -1]
    left = jnp.where(s == 0, left0, left_recv)
    right_tail = ext_full[..., F - 1 + Ws : F - 1 + Ws + 2 * e]

    xl = jnp.concatenate([left, x_local, right_tail], axis=-1)
    out_max = q + e
    cA = dwt._shift_mac(xl, np.asarray(wav.dec_lo)[::-1], 2, out_max)
    cD = dwt._shift_mac(xl, np.asarray(wav.dec_hi)[::-1], 2, out_max)
    return cA, cD


def _reassemble(g, n: int, q: int, e: int):
    """(n, ..., L, q+e) gathered blocks -> (..., L, n*q+e) global array."""
    parts = [g[s][..., :q] for s in range(n)]
    if e:
        parts.append(g[n - 1][..., q:])
    return jnp.concatenate(parts, axis=-1)


def sharded_dwt2_level1(
    x: jnp.ndarray,
    wavelet: Union[str, Wavelet],
    mode: str,
    mesh: Mesh,
    axis_name: str = "tile",
):
    """One 2D DWT level with W sharded over ``mesh[axis_name]``.

    x: (..., H, W) with W % n == 0 and (W//n) even. Returns the dict
    {'aa','ad','da','dd'} (replicated), exactly equal to dwt.dwt2(x).
    """
    wav = wavelet if isinstance(wavelet, Wavelet) else build_wavelet(wavelet)
    n = mesh.shape[axis_name]
    W = x.shape[-1]
    F = wav.dec_len
    if W % n != 0 or (W // n) % 2 != 0:
        raise ValueError(
            f"W={W} must be divisible by {n} shards with even shard width"
        )
    if W // n < F:
        # edge shards materialize the global boundary extension from their
        # local block (reflect reaches column F-2) and neighbor halos come
        # from ONE ppermute hop — both need shard width >= filter length
        raise ValueError(
            f"shard width {W // n} must be >= filter length {F}"
        )
    e = (F - 1) // 2
    q = (W // n) // 2
    lead = len(x.shape) - 2

    in_spec = P(*([None] * lead), None, axis_name)
    out_spec = P()  # replicated output

    def body(x_local):
        # row pass along H first (matches dwt2's axis order bit-for-bit;
        # H is unsharded so this is fully local)
        a, d = dwt.dwt1d(x_local, wav, mode, axis=-2)
        # column pass along the sharded W axis, with halo exchange
        aa, ad = _col_pass_local(a, wav, mode, axis_name, n)
        da, dd = _col_pass_local(d, wav, mode, axis_name, n)
        # gather level-1 subbands; each is (..., H', q+e) per shard
        out = []
        for b in (aa, ad, da, dd):
            g = lax.all_gather(b, axis_name)  # (n, ..., H', q+e)
            out.append(_reassemble(g, n, q, e))
        return tuple(out)

    aa, ad, da, dd = shard_map(
        body,
        mesh=mesh,
        in_specs=(in_spec,),
        out_specs=(out_spec,) * 4,
    )(x)
    # note pywt key convention (dwt2): first char = row axis
    return {"aa": aa, "ad": ad, "da": da, "dd": dd}


def sharded_wavedec2_packed(
    x: jnp.ndarray,
    wavelet: Union[str, Wavelet],
    mode: str,
    level: int,
    mesh: Mesh,
    axis_name: str = "tile",
) -> Tuple[jnp.ndarray, int, int]:
    """Multilevel packed DWT of a W-sharded image.

    Level 1 runs sharded with halo exchange; remaining levels run
    replicated on the (4x smaller) approximation. Bit-equal to
    dwt.wavedec2_packed on a single device.
    """
    wav = wavelet if isinstance(wavelet, Wavelet) else build_wavelet(wavelet)
    if level < 1:
        raise ValueError("level must be >= 1")
    d1 = sharded_dwt2_level1(x, wav, mode, mesh, axis_name)
    aa = d1["aa"]
    if level == 1:
        coeffs = [aa, {"ad": d1["ad"], "da": d1["da"], "dd": d1["dd"]}]
    else:
        deeper = dwt.wavedec2(aa, wav, mode, level - 1)
        coeffs = deeper + [{"ad": d1["ad"], "da": d1["da"], "dd": d1["dd"]}]
    # pack (same layout logic as dwt.wavedec2_packed)
    a = coeffs[0]
    ll_h, ll_w = a.shape[-2], a.shape[-1]
    total_h, total_w = ll_h, ll_w
    for d in coeffs[1:]:
        total_h += d["dd"].shape[-2]
        total_w += d["dd"].shape[-1]
    arr = jnp.zeros(a.shape[:-2] + (total_h, total_w), dtype=x.dtype)
    arr = arr.at[..., :ll_h, :ll_w].set(a)
    sh, sw = ll_h, ll_w
    for d in coeffs[1:]:
        ad, da, dd = d["ad"], d["da"], d["dd"]
        arr = arr.at[..., : ad.shape[-2], sw : sw + ad.shape[-1]].set(ad)
        arr = arr.at[..., sh : sh + da.shape[-2], : da.shape[-1]].set(da)
        arr = arr.at[..., sh : sh + dd.shape[-2], sw : sw + dd.shape[-1]].set(dd)
        sh += dd.shape[-2]
        sw += dd.shape[-1]
    return arr, ll_h, ll_w
