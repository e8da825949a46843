"""Spatially-sharded DWT: one huge image split across devices along W.

The reference does whole-image DWTs with no tiling (README.md:9); scaling
to 8K+ images on a TPU pod slice means sharding the image across chips and
exchanging only filter-support-sized halos over ICI. This module implements
that with explicit collectives inside `shard_map`:

 * Every level's column pass runs with the W axis sharded over a mesh
   axis while its geometry permits (`_level_shardable`): each shard
   pulls a filter-support halo from its neighbor via `lax.ppermute`
   (one ICI hop); the global boundary extensions are materialized
   locally by the edge shards, so results are EXACTLY the unsharded
   transform — boundary semantics included.
 * The row pass is along the unsharded H axis — fully local.
 * Arbitrary global widths are supported (round 2): the image is padded
   internally to equal shard blocks, only valid columns are ever read,
   and between levels a RESHARD step (a static number of ppermute hops
   + a dynamic slice) absorbs the drift between the previous level's
   output blocks and the next level's input blocks that pywt's
   non-dyadic boundary growth creates. Tiny deep levels (shard width
   below ~filter length + 2n) and periodization's ring wraparound fall
   back to one gather + replicated compute.

Exactness (identical to the single-device jitted transform, f64) is
asserted in tests/test_parallel.py on a virtual 8-device CPU mesh,
including an 8-shard 8K-wide image with no manual padding and all
levels sharded.
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

__all__ = [
    "sharded_dwt2_level1",
    "sharded_wavedec2_packed",
    "sharded_plane_stats",
]


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


# ---------------------------------------------------------------------------
# Recursive sharded multilevel DWT (round 2): every level runs with W
# sharded while its geometry permits, with NO constraints on the global
# width — arbitrary images are padded internally to equal shard blocks
# and only valid columns are ever read. Ownership convention per level:
# the global width Wl is padded to n*S (S = Wl/n rounded up to even);
# shard s owns global columns [s*S, (s+1)*S), the last shard's block
# being partially valid (V = Wl - (n-1)*S columns, a static count).
# The column pass gives shard s the outputs [s*S/2, ...), so the next
# level starts with a RESHARD step: a static number of ppermute hops
# brings the few columns of drift between the old output blocks and the
# new input blocks (the non-dyadic pywt boundary growth makes the two
# block sizes differ by O(F/n) columns per level).
# ---------------------------------------------------------------------------


def _even_ceil(W: int, n: int) -> int:
    s = -(-W // n)
    return s + (s % 2)


def _level_shardable(W: int, n: int, F: int, mode: str) -> bool:
    if mode in ("periodic", "periodization"):
        return False  # ring wraparound halos not implemented
    S = _even_ceil(W, n)
    V = W - (n - 1) * S
    # one-hop halos + locally-computable boundary extensions + no empty
    # shards + headroom for the reshard drift
    return S >= F + 2 * n and V >= max(F - 1, 1)


def _col_pass_general(
    xbuf, wav: Wavelet, mode: str, axis_name: str, n: int, W: int, S: int
):
    """Column (last-axis) DWT of the equal-block sharded signal.

    xbuf: (..., H, S) per shard holding global cols [s*S, (s+1)*S)
    (last block valid only up to V = W - (n-1)*S). Returns (cA, cD) of
    shape (..., H, OBUF) where shard s owns outputs [s*S/2, ...): full
    shards own Ol = S/2, the last shard V' = W' - (n-1)*Ol (OBUF =
    max(Ol, V')).
    """
    F = wav.dec_len
    hw = F - 2
    Ol = S // 2
    Wp = dwt_coeff_len(W, F, mode)
    V = W - (n - 1) * S
    Vp = Wp - (n - 1) * Ol
    eo = max(0, Vp - Ol)
    OBUF = Ol + eo
    s = lax.axis_index(axis_name)

    # left halo: rightmost hw cols of the left neighbor (full blocks)
    right_edge = xbuf[..., S - hw :]
    left_recv = lax.ppermute(
        right_edge, axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )
    ext_full = dwt.extend(xbuf, F - 1, mode)
    left0 = ext_full[..., 1 : 1 + hw]  # global left boundary extension
    left = jnp.where(s == 0, left0, left_recv)

    # right fill (2*eo cols): interior shards read the right neighbor's
    # first cols; the LAST shard substitutes its valid block + the
    # global right boundary extension
    rf = 2 * eo
    if rf > 0:
        first_cols = xbuf[..., :rf]
        right_recv = lax.ppermute(
            first_cols, axis_name, perm=[(i + 1, i) for i in range(n - 1)]
        )
        xl = jnp.concatenate([left, xbuf, right_recv], axis=-1)
    else:
        xl = jnp.concatenate([left, xbuf], axis=-1)
    # last shard: [halo | valid V | extension+pad to S - V + rf]
    valid = xbuf[..., :V]
    ext_last = dwt.extend(valid, F - 1, mode)[..., F - 1 + V :]  # F-1 cols
    fill_len = S - V + rf
    if fill_len > F - 1:
        pad = jnp.zeros(
            ext_last.shape[:-1] + (fill_len - (F - 1),), xbuf.dtype
        )
        fill = jnp.concatenate([ext_last, pad], axis=-1)
    else:
        fill = ext_last[..., :fill_len]
    xl_last = jnp.concatenate([left, valid, fill], axis=-1)
    xl = jnp.where(s == n - 1, xl_last, xl)

    cA = dwt._shift_mac(xl, np.asarray(wav.dec_lo)[::-1], 2, OBUF)
    cD = dwt._shift_mac(xl, np.asarray(wav.dec_hi)[::-1], 2, OBUF)
    return cA, cD


def _reshard_plan(n: int, Ol: int, eo: int, W_new: int, S_new: int):
    """Static plan to move from output blocks (stride Ol, buffer Ol+eo,
    last block valid to Ol+eo) to input blocks of stride S_new.

    Returns (KL, KR) hop counts, or None if the drift exceeds what the
    frame construction covers (then the caller falls back to gathering).
    """
    def holder(c):
        return min(c // Ol, n - 1)

    KL = KR = 0
    for s in range(n):
        start = s * S_new
        end = min(min(start + S_new, W_new), n * Ol)
        if end <= start:
            continue
        KL = max(KL, s - holder(start))
        KR = max(KR, holder(end - 1) - s)
    # frame validity: the part of shard s's slice below n*Ol must sit in
    # [(s-KL)*Ol, (s+KR+1)*Ol); global cols >= n*Ol (the last block's eo
    # tail) are patched in afterwards from a broadcast of that tail
    fixups = []
    for s in range(n):
        start = s * S_new
        end = min(start + S_new, W_new)
        lo = (s - KL) * Ol
        hi = (s + KR + 1) * Ol
        if start < lo or min(end, n * Ol) > hi:
            return None
        if end > n * Ol:
            t_len = end - n * Ol
            if t_len > eo or start > n * Ol:
                return None
            # tail goes at local position n*Ol - start (static)
            fixups.append((s, n * Ol - start, t_len))
    return KL, KR, fixups


def _reshard(buf, axis_name: str, n: int, Ol: int, eo: int, S_new: int,
             KL: int, KR: int, fixups):
    """Per-shard body: rebuild the S_new-block from neighboring output
    buffers using KL left + KR right ppermute hops + a dynamic slice;
    global columns past n*Ol (the last output block's tail) are patched
    from a broadcast of that tail for the statically-known shards that
    need them."""
    s = lax.axis_index(axis_name)
    blocks = []
    for d in range(-KL, KR + 1):
        if d == 0:
            blocks.append(buf)
        else:
            # bring block s+d to shard s
            perm = [
                (i + d, i)
                for i in range(n)
                if 0 <= i + d < n
            ]
            blocks.append(lax.ppermute(buf, axis_name, perm=perm))
    frame = jnp.concatenate([b[..., :Ol] for b in blocks], axis=-1)
    off = s * (S_new - Ol) + KL * Ol
    off = jnp.clip(off, 0, frame.shape[-1] - S_new)
    out = lax.dynamic_slice_in_dim(frame, off, S_new, axis=-1)
    if fixups:
        tail = lax.all_gather(buf[..., Ol:], axis_name)[n - 1]
        for st, pos, t_len in fixups:
            patched = jnp.concatenate(
                [out[..., :pos], tail[..., :t_len],
                 out[..., pos + t_len :]],
                axis=-1,
            )
            out = jnp.where(s == st, patched, out)
    return out


def sharded_wavedec2_packed(
    x: jnp.ndarray,
    wavelet: Union[str, Wavelet],
    mode: str,
    level: int,
    mesh: Mesh,
    axis_name: str = "tile",
) -> Tuple[jnp.ndarray, int, int]:
    """Multilevel packed DWT of a W-sharded image, recursively sharded.

    Any global width (no divisibility/padding requirements): every level
    whose geometry passes `_level_shardable` runs with W sharded and
    ppermute halo exchange; the residue (tiny deep levels, or
    periodization wraparound) runs replicated after one gather.
    Bit-equal to dwt.wavedec2_packed on a single device
    (tests/test_parallel.py, incl. an 8-shard 8K-wide image).
    """
    wav = wavelet if isinstance(wavelet, Wavelet) else build_wavelet(wavelet)
    if level < 1:
        raise ValueError("level must be >= 1")
    F = wav.dec_len
    n = mesh.shape[axis_name]
    lead = len(x.shape) - 2
    Wl = x.shape[-1]
    details = []  # fine -> coarse

    state = None  # sharded: (global buffers (..., H, n*OBUF), Ol, eo)
    lvl = 0
    while lvl < level and _level_shardable(Wl, n, F, mode):
        S = _even_ceil(Wl, n)
        if state is None:
            pad = n * S - Wl
            xg = jnp.pad(
                x, [(0, 0)] * (lead + 1) + [(0, pad)]
            ) if pad else x
            plan = (None, None)
        else:
            xg, Ol_prev, eo_prev = state
            plan = _reshard_plan(n, Ol_prev, eo_prev, Wl, S)
            if plan is None:
                break
        Wp = dwt_coeff_len(Wl, F, mode)
        Ol = S // 2
        Vp = Wp - (n - 1) * Ol
        eo = max(0, Vp - Ol)

        in_spec = P(*([None] * (lead + 1)), axis_name)

        def body(xloc):
            if state is not None:
                xloc = _reshard(
                    xloc, axis_name, n, Ol_prev, eo_prev, S, *plan
                )
            # row pass (H axis, fully local)
            a, d = dwt.dwt1d(xloc, wav, mode, axis=-2)
            aa, ad = _col_pass_general(a, wav, mode, axis_name, n, Wl, S)
            da, dd = _col_pass_general(d, wav, mode, axis_name, n, Wl, S)
            # details: gather + trim to the true global width
            outs = []
            for b in (ad, da, dd):
                gathered = lax.all_gather(b, axis_name)
                parts = [gathered[t][..., :Ol] for t in range(n - 1)]
                parts.append(gathered[n - 1][..., :Vp])
                outs.append(jnp.concatenate(parts, axis=-1))
            return (aa, *outs)

        aa_g, ad_g, da_g, dd_g = shard_map(
            body,
            mesh=mesh,
            in_specs=(in_spec,),
            out_specs=(in_spec, P(), P(), P()),
        )(xg if state is None else state[0])
        details.append({"ad": ad_g, "da": da_g, "dd": dd_g})
        state = (aa_g, Ol, eo)
        Wl = Wp
        lvl += 1

    # residue: gather the sharded approximation, finish replicated
    if state is not None:
        aa_g, Ol, eo = state
        OBUF = Ol + eo
        blocks = [
            aa_g[..., t * OBUF : t * OBUF + (Ol if t < n - 1 else OBUF)]
            for t in range(n)
        ]
        a = jnp.concatenate(blocks, axis=-1)[..., :Wl]
    else:
        a = x
    if lvl < level:
        deeper = dwt.wavedec2(a, wav, mode, level - lvl)
        coeffs = deeper + details[::-1]
    else:
        coeffs = [a] + details[::-1]
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


def sharded_plane_stats(
    arr: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "tile",
    planes: int = 32,
):
    """Per-shard significance tallies + psum reduction (no gather).

    The SURVEY §2 "subband-partial reductions" component: every shard
    tallies its local columns of the W-sharded quantized coefficient
    array and the mesh combines with one `psum` — the global
    max-magnitude (for the f32-truncated max_n rule) and per-bit-plane
    significance counts (what the stream planner's budget narrowing
    consumes) never require materializing the full array anywhere.

    arr: (..., H, W) int32, W divisible by the axis size (the packed
    array's W is under the caller's control, unlike raw images).
    Returns (max_abs scalar, counts[planes] int32) replicated.
    """
    n = mesh.shape[axis_name]
    if arr.shape[-1] % n != 0:
        raise ValueError("packed width must divide the mesh axis")
    lead = arr.ndim - 1

    def body(a):
        mag = jnp.abs(a).astype(jnp.int32)
        local_max = mag.max()
        shifts = jnp.arange(planes, dtype=jnp.int32)
        # mag >> p nonzero  <=>  mag >= 2^p (int32-safe for p up to 31)
        local_counts = (
            ((mag[..., None] >> shifts) > 0)
            .reshape(-1, planes)
            .sum(axis=0, dtype=jnp.int32)
        )
        gmax = lax.pmax(local_max, axis_name)
        gcounts = lax.psum(local_counts, axis_name)
        return gmax, gcounts

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(*([None] * lead), axis_name),),
        out_specs=(P(), P()),
    )(arr)
