"""Device-side stream planning: exact per-plane bit counts from the maps.

Implements step 1-2 of DESIGN_DEVICE_SCHEDULER.md: every SPIHT event's
bit-plane is a closed-form function of the significance maps, so the
number of bits the encoder will emit at each plane — and therefore the
cut plane for any byte budget — is computable cell-parallel WITHOUT
running the encoder. Validated bit-for-bit against an instrumented run
of the oracle encoder (tests/test_planning.py); this is the load-bearing
evidence for the fully-device-side scheduler design.

Event-plane rules (derived in the design doc; ES = set LIS-entry plane,
EC = cell visit plane, both propagated top-down through the tree):

  * initial LL cells sit in LIP from plane max_n; a cell added by its
    parent's type-A fire at plane EC = D(parent) is first LIP-visited at
    EC-1 (hazard #4) and only if M < EC (else it went straight to LSP).
    LIP test bits: planes [max(M,0), hi], hi = max_n | EC-1; sign at M.
  * a set s in LIS emits one desc-sig test per plane in [max(D,0), ES];
    at plane D (its fire) it emits 4 offspring tests plus one sign per
    child with M(child) == D; it re-enters type-B iff the raw-coordinate
    grandchild gate holds, emitting l-sig tests on [max(G,0), D] and
    promoting its children to type-A entries at plane G.
  * refinement: every coded-significant cell emits one bit per plane
    below M.

Limitations: requires even ll dims (odd LL dims make the parity child
map non-injective — two parents can claim one cell, a reference-tree
quirk the planner does not model) and the exact full-stream counts.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax.numpy as jnp

from .maps import tree_height

__all__ = [
    "bits_per_plane_from_maps",
    "bits_per_plane_from_maps_np",
    "cut_plane",
    "cut_plane_np",
    "plan_supported",
    "plan_image",
]

_PLANES = 32  # static histogram size (planes 0..30 + headroom)


def plan_supported(ll_h: int, ll_w: int) -> bool:
    return ll_h % 2 == 0 and ll_w % 2 == 0


@lru_cache(maxsize=None)
def _static_geometry(h: int, w: int, ll_h: int, ll_w: int):
    """Parent index maps + masks (numpy, trace-time constants)."""
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    in_ll = (i < ll_h) & (j < ll_w)
    ll_ee = in_ll & (i % 2 == 0) & (j % 2 == 0)
    initial_set = in_ll & ~ll_ee

    # parent map: parity-inverse inside the first ring, dyadic elsewhere
    in_ring = (i < 2 * ll_h) & (j < 2 * ll_w) & ~in_ll
    chunk_i, bi = i // ll_h, i % ll_h
    chunk_j, bj = j // ll_w, j % ll_w
    par_i = np.where(in_ring, (bi // 2) * 2 + chunk_i, i // 2)
    par_j = np.where(in_ring, (bj // 2) * 2 + chunk_j, j // 2)
    par_i = np.broadcast_to(par_i, (h, w)).copy()
    par_j = np.broadcast_to(par_j, (h, w)).copy()

    # does the would-be parent actually own offspring (all-or-nothing)?
    p_in_ll = (par_i < ll_h) & (par_j < ll_w)
    p_ll_ee = p_in_ll & (par_i % 2 == 0) & (par_j % 2 == 0)
    p_dyadic_ok = (2 * par_i + 1 < h) & (2 * par_j + 1 < w)
    has_parent = ~in_ll & np.where(p_in_ll, ~p_ll_ee, p_dyadic_ok)

    par_i = np.clip(par_i, 0, h - 1)
    par_j = np.clip(par_j, 0, w - 1)

    # raw-coordinate grandchild gate (reference encoder_decoder.rs:7-12)
    hg_raw = ((2 * i + 1) * 2 + 1 < h) & ((2 * j + 1) * 2 + 1 < w)
    # offspring existence per cell-as-set
    off_exists = np.where(in_ll, initial_set | (in_ll & ~ll_ee),
                          (2 * i + 1 < h) & (2 * j + 1 < w))
    off_exists = np.where(in_ll, ~ll_ee, off_exists)
    return (
        np.broadcast_to(in_ll, (h, w)),
        np.broadcast_to(initial_set, (h, w)),
        par_i,
        par_j,
        np.broadcast_to(has_parent, (h, w)),
        np.broadcast_to(hg_raw, (h, w)),
        np.broadcast_to(off_exists, (h, w)),
    )


def _interval_hist(hist, lo, hi, valid):
    """Add +1 to hist bins [lo, hi] for each valid cell (diff trick)."""
    v = valid.astype(jnp.int32).reshape(-1)
    lo = jnp.clip(lo, 0, _PLANES - 1).reshape(-1)
    hi = jnp.clip(hi, -1, _PLANES - 1).reshape(-1)
    v = v * (hi >= lo)
    hist = hist.at[lo].add(v)
    hist = hist.at[hi + 1].add(-v)
    return hist


def _point_hist(hist2, p, valid):
    v = valid.astype(jnp.int32).reshape(-1)
    p = jnp.clip(p, 0, _PLANES - 1).reshape(-1)
    return hist2.at[p].add(v)


def bits_per_plane_from_maps(
    m: jnp.ndarray,
    d: jnp.ndarray,
    g: jnp.ndarray,
    ll_h: int,
    ll_w: int,
    max_n,
) -> jnp.ndarray:
    """Exact full-stream bits per plane, shape (_PLANES,), index = plane n.

    m/d/g: (C, H, W) int8 significance maps; max_n: the stream's starting
    plane (reference f32-log2 semantics, passed in).
    """
    c, h, w = m.shape
    if not plan_supported(ll_h, ll_w):
        raise ValueError("planner requires even ll dims")
    (in_ll, initial_set, par_i, par_j, has_parent, hg_raw, off_exists) = (
        _static_geometry(h, w, ll_h, ll_w)
    )
    in_ll = jnp.asarray(in_ll)
    initial_set = jnp.asarray(initial_set)
    hg_raw = jnp.asarray(hg_raw)
    off_exists = jnp.asarray(off_exists)
    has_parent_j = jnp.asarray(has_parent)

    m32 = m.astype(jnp.int32)
    d32 = d.astype(jnp.int32)
    g32 = g.astype(jnp.int32)
    max_n = jnp.asarray(max_n, dtype=jnp.int32)

    def parent(x):
        return x[..., par_i, par_j]

    # --- top-down propagation of ES (set entry) and EC (cell visit) -----
    es = jnp.where(initial_set, max_n, -1)
    es = jnp.broadcast_to(es, m.shape)
    for _ in range(tree_height(h, w, ll_h, ll_w)):
        pes = parent(es)
        pg = parent(g32)
        child_es = jnp.where(
            has_parent_j & (pes >= 0) & parent(hg_raw) & (pg >= 0), pg, -1
        )
        es = jnp.where(initial_set, max_n, child_es)
    pes = parent(es)
    pd = parent(d32)
    ec = jnp.where(has_parent_j & (pes >= 0) & (pd >= 0), pd, -1)

    # --- histograms ------------------------------------------------------
    # interval counts via diff arrays (cumsum at the end)
    diff = jnp.zeros(_PLANES + 1, dtype=jnp.int32)
    point = jnp.zeros(_PLANES, dtype=jnp.int32)

    # LIP tests + signs
    lip_init = jnp.broadcast_to(in_ll, m.shape)
    lo_i = jnp.maximum(m32, 0)
    diff = _interval_hist(diff, lo_i, jnp.broadcast_to(max_n, m.shape), lip_init)
    point = _point_hist(point, m32, lip_init & (m32 >= 0))

    lip_added = (ec >= 0) & (m32 < ec)
    diff = _interval_hist(diff, jnp.maximum(m32, 0), ec - 1, lip_added)
    point = _point_hist(point, m32, lip_added & (m32 >= 0))

    # LIS type-A desc-sig tests
    set_in = (es >= 0)
    diff = _interval_hist(diff, jnp.maximum(d32, 0), es, set_in)
    # fire at plane D: 4 offspring tests...
    fired = set_in & (d32 >= 0)
    point4 = _point_hist(jnp.zeros(_PLANES, jnp.int32), d32, fired)
    point = point + 4 * point4
    # ...plus a sign per child whose element level equals the fire plane
    child_sig_now = (ec >= 0) & (m32 == ec)
    point = _point_hist(point, ec, child_sig_now)

    # LIS type-B l-sig tests
    bset = fired & hg_raw
    diff = _interval_hist(diff, jnp.maximum(g32, 0), d32, bset)

    # refinement: coded-significant cells, one bit per plane < M
    coded = (lip_init | (ec >= 0)) & (m32 >= 1)
    diff = _interval_hist(diff, jnp.zeros_like(m32), m32 - 1, coded)

    counts = jnp.cumsum(diff[:_PLANES]) + point
    return counts


def bits_per_plane_from_maps_np(m, d, g, ll_h: int, ll_w: int, max_n: int):
    """Numpy twin of bits_per_plane_from_maps for host use.

    Identical semantics; eager numpy is far faster than compiling the
    gather-heavy jax version on CPU for large images. Validated against
    the jnp version and the instrumented oracle in tests.
    """
    c, h, w = m.shape
    if not plan_supported(ll_h, ll_w):
        raise ValueError("planner requires even ll dims")
    (in_ll, initial_set, par_i, par_j, has_parent, hg_raw, _) = (
        _static_geometry(h, w, ll_h, ll_w)
    )
    m32 = m.astype(np.int64)
    d32 = d.astype(np.int64)
    g32 = g.astype(np.int64)
    max_n = int(max_n)

    def parent(x):
        return x[:, par_i, par_j]

    es = np.where(initial_set[None], max_n, -1) * np.ones((c, 1, 1), np.int64)
    hgb = np.broadcast_to(hg_raw[None], m.shape)
    hpb = np.broadcast_to(has_parent[None], m.shape)
    for _ in range(tree_height(h, w, ll_h, ll_w)):
        pes = parent(es)
        pg = parent(g32)
        child_es = np.where(
            hpb & (pes >= 0) & parent(hgb) & (pg >= 0), pg, -1
        )
        es = np.where(initial_set[None], max_n, child_es)
    pes = parent(es)
    pd = parent(d32)
    ec = np.where(hpb & (pes >= 0) & (pd >= 0), pd, -1)

    diff = np.zeros(_PLANES + 1, dtype=np.int64)
    point = np.zeros(_PLANES, dtype=np.int64)

    def interval(lo, hi, valid):
        v = valid.ravel()
        lo = np.clip(lo, 0, _PLANES - 1).ravel()[v]
        hi = np.clip(hi, -1, _PLANES - 1).ravel()[v]
        keep = hi >= lo
        np.add.at(diff, lo[keep], 1)
        np.add.at(diff, hi[keep] + 1, -1)

    def pt(p, valid, weight=1):
        v = valid.ravel()
        p = np.clip(p, 0, _PLANES - 1).ravel()[v]
        np.add.at(point, p, weight)

    lip_init = np.broadcast_to(in_ll[None], m.shape)
    interval(np.maximum(m32, 0), np.full(m.shape, max_n), lip_init)
    pt(m32, lip_init & (m32 >= 0))
    lip_added = (ec >= 0) & (m32 < ec)
    interval(np.maximum(m32, 0), ec - 1, lip_added)
    pt(m32, lip_added & (m32 >= 0))

    set_in = es >= 0
    interval(np.maximum(d32, 0), es, set_in)
    fired = set_in & (d32 >= 0)
    pt(d32, fired, weight=4)
    pt(ec, (ec >= 0) & (m32 == ec))
    interval(np.maximum(g32, 0), d32, fired & hgb)

    coded = (lip_init | (ec >= 0)) & (m32 >= 1)
    interval(np.zeros_like(m32), m32 - 1, coded)

    return np.cumsum(diff[:_PLANES]) + point


def plan_image(image, settings, level=None, max_bits=None):
    """Rate plan for an image WITHOUT encoding it.

    Returns a dict with:
      'bits_per_plane'  {plane n: exact bits the full stream emits at n}
      'total_bits'      full-stream length
      'max_n'           starting plane
      'cut_plane'       plane where a max_bits budget runs out (-1 = fits)
      'bits_before_cut' bits emitted before that plane starts

    Uses the host transform + native maps; the per-plane math runs in
    jax (CPU or device). Unsupported (odd-LL) geometries raise.
    """
    import numpy as np

    from .. import transform
    from ..native import runtime

    arr, ll_h, ll_w = transform.forward(image, settings, level)
    if not plan_supported(ll_h, ll_w):
        raise ValueError("planner requires even ll dims")
    nat = runtime.load()
    if nat is not None:
        m, d, g = nat.compute_maps(arr, ll_h, ll_w)
    else:
        from . import maps as _m

        m, d, g = (np.asarray(x) for x in _m.significance_maps(
            jnp.asarray(arr), ll_h, ll_w
        ))
    from .oracle import compute_max_n

    max_n = compute_max_n(arr)
    counts = bits_per_plane_from_maps_np(
        np.asarray(m), np.asarray(d), np.asarray(g), ll_h, ll_w, max_n
    )
    out = {
        "bits_per_plane": {
            int(n): int(counts[n]) for n in range(max_n, -1, -1)
        },
        "total_bits": int(counts.sum()),
        "max_n": int(max_n),
        "cut_plane": -1,
        "bits_before_cut": int(counts.sum()),
    }
    if max_bits is not None:
        plane, before = cut_plane_np(counts, max_n, int(max_bits))
        out["cut_plane"] = plane
        out["bits_before_cut"] = before
    return out


def cut_plane_np(counts, max_n: int, max_bits: int):
    """Host-side numpy cut_plane (identical semantics; no device dispatch —
    on tunneled accelerators tiny jnp ops cost a round trip each)."""
    counts = np.asarray(counts)
    idx = np.arange(counts.shape[0])
    c = np.where(idx <= max_n, counts, 0)
    suffix_incl = np.cumsum(c[::-1])[::-1]
    suffix_excl = suffix_incl - c
    hit = (suffix_excl < max_bits) & (max_bits <= suffix_incl)
    if hit.any():
        plane = int((idx * hit).sum())
        return plane, int((suffix_excl * hit).sum())
    return -1, int(suffix_incl[0])


def cut_plane(counts: jnp.ndarray, max_n, max_bits: int):
    """The plane in which a max_bits budget runs out (descending scan).

    Returns (plane, bits_before_plane). plane == -1 means the full stream
    fits the budget. Useful for rate allocation and for bounding which
    magnitude bits of the coefficient array the encoder can ever touch
    (bits below plane-1 are dead for this budget).
    """
    counts = jnp.asarray(counts)
    idx = jnp.arange(counts.shape[0])
    c = jnp.where(idx <= jnp.asarray(max_n), counts, 0)
    # planes are emitted max_n, max_n-1, ..., 0:
    # suffix_incl[n] = bits through the END of plane n;
    # suffix_excl[n] = bits BEFORE plane n starts
    suffix_incl = jnp.cumsum(c[::-1])[::-1]
    suffix_excl = suffix_incl - c
    # the budget runs out during plane n iff excl[n] < max_bits <= incl[n]
    hit = (suffix_excl < max_bits) & (max_bits <= suffix_incl)
    plane = jnp.where(hit.any(), (idx * hit).sum(), -1)
    before = jnp.where(
        hit.any(), (suffix_excl * hit).sum(), suffix_incl[0]
    )
    return plane, before
