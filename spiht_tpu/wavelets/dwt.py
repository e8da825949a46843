"""JAX multilevel 2D DWT — the TPU compute path.

Jittable, static-shape implementation of the same transform semantics as the
trusted numpy reference (``spiht_tpu.wavelets.ref_dwt``, which itself mirrors
the PyWavelets behavior the reference framework relies on at
spiht/spiht_wrapper.py:163-165). Design notes (TPU-first):

* Boundary extension is a static gather (`jnp.take` with trace-time numpy
  index maps) — no data-dependent shapes under `jit`.
* Each filter pass is F static shifted multiply-accumulates on the VPU
  (see `_shift_mac`): the DWT is bandwidth-bound at ~F MACs/sample, and
  XLA fuses each shifted-slice chain into one pass over memory. A conv/MXU
  formulation was measured to be layout-pathological on TPU for these thin
  1D strips (minutes of compile time); the slice+FMA form compiles fast
  and runs at HBM speed.
* Everything operates on (..., H, W); leading dims (batch, channels) ride
  along elementwise.

The packed-array layout helpers mirror ``ref_dwt.coeffs_to_array`` (the
reference layout contract, spiht/spiht_wrapper.py:111-134).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

import jax.numpy as jnp

from .filters import Wavelet, build_wavelet, dwt_coeff_len, dwt_max_level

__all__ = [
    "extend",
    "dwt1d",
    "idwt1d",
    "dwt2",
    "idwt2",
    "wavedec2",
    "waverec2",
    "wavedec2_packed",
]


def _as_wavelet(wavelet: Union[str, Wavelet]) -> Wavelet:
    if isinstance(wavelet, Wavelet):
        return wavelet
    return build_wavelet(wavelet)


# ---------------------------------------------------------------------------
# Boundary extension (static gathers; semantics identical to ref_dwt.extend)
# ---------------------------------------------------------------------------


def _sym_idx(i: np.ndarray, n: int) -> np.ndarray:
    period = 2 * n
    i = np.mod(i, period)
    return np.where(i < n, i, period - 1 - i)


def _refl_idx(i: np.ndarray, n: int) -> np.ndarray:
    if n == 1:
        return np.zeros_like(i)
    period = 2 * n - 2
    i = np.mod(i, period)
    return np.where(i < n, i, period - i)


def extend(x: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    """Extend the last axis of ``x`` by ``pad`` samples on both ends."""
    if pad == 0:
        return x
    n = x.shape[-1]
    spec = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    if mode == "zero":
        return jnp.pad(x, spec)
    if mode == "constant":
        return jnp.pad(x, spec, mode="edge")
    i = np.arange(-pad, n + pad)
    if mode == "symmetric":
        return jnp.take(x, _sym_idx(i, n), axis=-1)
    if mode == "reflect":
        return jnp.take(x, _refl_idx(i, n), axis=-1)
    if mode in ("periodic", "periodization"):
        return jnp.take(x, i % n, axis=-1)
    if mode == "antisymmetric":
        idx = _sym_idx(i, n)
        period = 2 * n
        sign = np.where(np.mod(i, period) < n, 1.0, -1.0)
        return jnp.take(x, idx, axis=-1) * jnp.asarray(sign, dtype=x.dtype)
    if mode == "smooth":
        if n == 1:
            return jnp.repeat(x, 2 * pad + 1, axis=-1)
        k = np.arange(1, pad + 1)
        kl = jnp.asarray(k[::-1], dtype=x.dtype)
        kr = jnp.asarray(k, dtype=x.dtype)
        left = x[..., :1] + (x[..., :1] - x[..., 1:2]) * kl
        right = x[..., -1:] + (x[..., -1:] - x[..., -2:-1]) * kr
        return jnp.concatenate([left, x, right], axis=-1)
    if mode == "antireflect":
        idx_l = _refl_idx(np.arange(pad, 0, -1), n)
        idx_r = _refl_idx(np.arange(n - 2, n - 2 - pad, -1), n)
        left = 2 * x[..., :1] - jnp.take(x, idx_l, axis=-1)
        right = 2 * x[..., -1:] - jnp.take(x, idx_r, axis=-1)
        return jnp.concatenate([left, x, right], axis=-1)
    raise ValueError(f"unsupported mode {mode!r}")


# ---------------------------------------------------------------------------
# Single-level 1D analysis / synthesis as strided convs
# ---------------------------------------------------------------------------


def _shift_mac(ext2: jnp.ndarray, taps, stride: int, out_len: int):
    """Correlation as F shifted multiply-accumulates along the last axis.

    out[o] = sum_j taps[j] * ext2[stride*o + j]. This is the TPU-friendly
    formulation: F static strided slices + fused multiply-adds on the VPU
    (the DWT is bandwidth-bound at ~F MACs/sample — an MXU conv would be
    layout-pathological here because the "image" is a thin 1D strip with a
    huge batch dim). XLA fuses the whole chain into one pass over memory.
    """
    acc = None
    for j, t in enumerate(taps):
        sl = ext2[..., j : j + stride * (out_len - 1) + 1 : stride]
        term = sl * jnp.asarray(t, dtype=ext2.dtype)
        acc = term if acc is None else acc + term
    return acc


def dwt1d(
    x: jnp.ndarray,
    wavelet: Union[str, Wavelet],
    mode: str = "reflect",
    axis: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level 1D DWT along ``axis``. Returns (cA, cD).

    Semantics: cX[o] = sum_j filt[j] * ext[1 + 2o + (F-1) - j], with ``ext``
    the signal extended by F-1 on both sides (ref_dwt._downconv).
    """
    w = _as_wavelet(wavelet)
    F = w.dec_len
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    out_len = dwt_coeff_len(n, F, mode)
    if mode == "periodization":
        # pywt periodization: duplicate the last sample if odd, then
        # periodic extension; out_len = ceil(n/2). Static shapes only.
        if n % 2 == 1:
            x = jnp.concatenate([x, x[..., -1:]], axis=-1)
        ext2 = extend(x, F - 1, "periodic")[..., 1:]
    else:
        ext2 = extend(x, F - 1, mode)[..., 1:]

    cA = _shift_mac(ext2, np.asarray(w.dec_lo)[::-1], 2, out_len)
    cD = _shift_mac(ext2, np.asarray(w.dec_hi)[::-1], 2, out_len)
    return jnp.moveaxis(cA, -1, axis), jnp.moveaxis(cD, -1, axis)


def idwt1d(
    cA: Optional[jnp.ndarray],
    cD: Optional[jnp.ndarray],
    wavelet: Union[str, Wavelet],
    mode: str = "reflect",
    axis: int = -1,
) -> jnp.ndarray:
    """Single-level inverse DWT along ``axis`` (pywt.idwt semantics).

    out = full_conv(upsample2(c), filt)[F-2 : F-2 + (2n - F + 2)], summed
    over the (cA, rec_lo) and (cD, rec_hi) branches. Computed polyphase:
    even/odd output samples are separate shifted-MAC chains over the
    non-upsampled coefficients (no zero-stuffed conv), interleaved at the
    end — again pure VPU work with static slices.
    """
    w = _as_wavelet(wavelet)
    F = w.rec_len
    if cA is None and cD is None:
        raise ValueError("need at least one of cA, cD")
    ref = cA if cA is not None else cD
    ref = jnp.moveaxis(ref, axis, -1)
    n = ref.shape[-1]
    if mode == "periodization":
        # circular synthesis via periodic coefficient padding (p = F
        # covers all wrapped contributions), linear synthesis, central
        # window [2p, 2p + 2n). Static gather; jit-friendly.
        p = F
        idx = np.arange(-p, n + p) % n

        def _pad(c):
            if c is None:
                return None
            return jnp.take(jnp.moveaxis(c, axis, -1), idx, axis=-1)

        full = idwt1d(_pad(cA), _pad(cD), w, "zero", axis=-1)
        return jnp.moveaxis(full[..., 2 * p : 2 * p + 2 * n], -1, axis)
    out_len = 2 * n - F + 2
    lead = ref.shape[:-1]
    n_half = (out_len + 1) // 2  # even-position outputs; odd = out_len//2

    # out[2m]   = sum_u c[m+u] * filt[F-2-2u]   (u over odd taps t=2u+1)
    # out[2m+1] = sum_v c[m+v] * filt[F-1-2v]   (v over even taps t=2v)
    # (derived from out[o] = sum_t up[o-1+t] * filt[F-1-t], up[2i]=c[i])
    pad = F // 2  # enough right-padding for the largest shifted slice
    out = jnp.zeros(lead + (out_len,), dtype=ref.dtype)

    def acc_branch(out, c, filt):
        if c is None:
            return out
        c = jnp.moveaxis(c, axis, -1)
        cp = jnp.pad(c, [(0, 0)] * len(lead) + [(0, pad)])
        even = None
        for u in range((F - 1) // 2 + 1):
            t = 2 * u + 1
            if t >= F:
                break
            term = cp[..., u : u + n_half] * jnp.asarray(
                filt[F - 1 - t], dtype=ref.dtype
            )
            even = term if even is None else even + term
        odd = None
        for v in range(F // 2):
            t = 2 * v
            term = cp[..., v : v + (out_len // 2)] * jnp.asarray(
                filt[F - 1 - t], dtype=ref.dtype
            )
            odd = term if odd is None else odd + term
        # interleave even/odd output phases
        if out_len % 2 == 1:
            # pad odd phase by one to interleave, then drop the extra
            odd = jnp.pad(odd, [(0, 0)] * len(lead) + [(0, 1)])
            inter = jnp.stack([even, odd], axis=-1).reshape(
                lead + (2 * n_half,)
            )[..., :out_len]
        else:
            inter = jnp.stack([even, odd], axis=-1).reshape(
                lead + (out_len,)
            )
        return out + inter

    out = acc_branch(out, cA, np.asarray(w.rec_lo))
    out = acc_branch(out, cD, np.asarray(w.rec_hi))
    return jnp.moveaxis(out, -1, axis)


# ---------------------------------------------------------------------------
# 2D and multilevel (mirrors ref_dwt structure; jit-friendly static shapes)
# ---------------------------------------------------------------------------


def dwt2(
    x: jnp.ndarray,
    wavelet: Union[str, Wavelet],
    mode: str = "reflect",
    axes: Tuple[int, int] = (-2, -1),
):
    """Single-level 2D DWT -> dict with keys 'aa','ad','da','dd'."""
    ax0, ax1 = axes
    a, d = dwt1d(x, wavelet, mode, axis=ax0)
    aa, ad = dwt1d(a, wavelet, mode, axis=ax1)
    da, dd = dwt1d(d, wavelet, mode, axis=ax1)
    return {"aa": aa, "ad": ad, "da": da, "dd": dd}


def idwt2(
    coeffs,
    wavelet: Union[str, Wavelet],
    mode: str = "reflect",
    axes: Tuple[int, int] = (-2, -1),
) -> jnp.ndarray:
    ax0, ax1 = axes
    a = idwt1d(coeffs.get("aa"), coeffs.get("ad"), wavelet, mode, axis=ax1)
    d = idwt1d(coeffs.get("da"), coeffs.get("dd"), wavelet, mode, axis=ax1)
    return idwt1d(a, d, wavelet, mode, axis=ax0)


def wavedec2(
    x: jnp.ndarray,
    wavelet: Union[str, Wavelet],
    mode: str = "reflect",
    level: Optional[int] = None,
    axes: Tuple[int, int] = (-2, -1),
) -> List:
    """Multilevel 2D DWT -> [cA_n, {'ad','da','dd'}_n, ..., level1]."""
    w = _as_wavelet(wavelet)
    if level is None:
        level = min(
            dwt_max_level(x.shape[axes[0]], w.dec_len),
            dwt_max_level(x.shape[axes[1]], w.dec_len),
        )
    if level < 0:
        raise ValueError("level must be >= 0")
    coeffs: List = []
    a = x
    for _ in range(level):
        d = dwt2(a, w, mode, axes)
        a = d.pop("aa")
        coeffs.append(d)
    coeffs.append(a)
    return coeffs[::-1]


def waverec2(
    coeffs: Sequence,
    wavelet: Union[str, Wavelet],
    mode: str = "reflect",
    axes: Tuple[int, int] = (-2, -1),
) -> jnp.ndarray:
    """Inverse of wavedec2 (incl. pywt's odd-length cA crops)."""
    w = _as_wavelet(wavelet)
    a = coeffs[0]
    for d in coeffs[1:]:
        dd_shape = d["dd"].shape
        slices = [slice(None)] * a.ndim
        for ax in axes:
            if a.shape[ax] == dd_shape[ax] + 1:
                slices[ax] = slice(0, dd_shape[ax])
        a = a[tuple(slices)]
        a = idwt2({"aa": a, **d}, w, mode, axes)
    return a


def wavedec2_packed(
    x: jnp.ndarray,
    wavelet: Union[str, Wavelet],
    mode: str = "reflect",
    level: Optional[int] = None,
) -> Tuple[jnp.ndarray, int, int]:
    """Multilevel DWT of (..., H, W) -> (packed array, ll_h, ll_w).

    Packs into the reference coeffs_to_array layout (SURVEY.md §3.1): LL at
    the top-left, then per level 'ad' top-right / 'da' bottom-left /
    'dd' bottom-right. All slice offsets are static python ints.
    """
    coeffs = wavedec2(x, wavelet, mode, level, axes=(-2, -1))
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
