"""Forward/inverse transform pipelines (color + DWT + quantization).

Two interchangeable backends:
  * 'numpy' — float64 host reference (always available, trusted).
  * 'jax'   — jitted TPU pipeline (spiht_tpu.wavelets.dwt), the default when
              JAX is importable; used for batched/sharded encoding.

Both produce the packed coefficient-array layout of SURVEY.md §3.1.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .color import models as color_models
from .ops.quantize import quantize, dequantize
from .settings import SpihtSettings
from .wavelets import ref_dwt
from .wavelets.geometry import get_slices_and_h_w

__all__ = [
    "forward_numpy",
    "inverse_numpy",
    "forward_native",
    "inverse_native",
    "forward",
    "inverse",
    "get_backend",
]

_BACKEND = os.environ.get("SPIHT_TPU_TRANSFORM", "auto")


def get_backend() -> str:
    if _BACKEND in ("numpy", "jax", "native"):
        return _BACKEND
    try:
        from . import jax_transform  # noqa: F401

        return "jax"
    except Exception:
        return "numpy"


def forward_numpy(
    image: np.ndarray, settings: SpihtSettings, level: Optional[int]
) -> Tuple[np.ndarray, int, int]:
    """image (C,H,W) float -> (quantized i32 packed coeff array, ll_h, ll_w)."""
    if settings.color_model is not None:
        image = color_models.convert(image, "RGB", settings.color_model)
    coeffs = ref_dwt.wavedec2(
        image, settings.wavelet, mode=settings.mode, level=level, axes=(-2, -1)
    )
    ll_h, ll_w = coeffs[0].shape[1], coeffs[0].shape[2]
    arr, _ = ref_dwt.coeffs_to_array(coeffs, axes=(-2, -1))
    if settings.per_channel_quant_scales is not None:
        mults = np.array(settings.per_channel_quant_scales, dtype=np.float64)
        arr = mults[:, None, None] * arr
    arr = quantize(arr, settings.quantization_scale)
    return arr, ll_h, ll_w


def inverse_numpy(
    rec_arr: np.ndarray,
    h: int,
    w: int,
    level: Optional[int],
    settings: SpihtSettings,
    slices=None,
) -> np.ndarray:
    """Packed i32 array -> reconstructed (C,H,W) float image."""
    if slices is None:
        slices, _, _ = get_slices_and_h_w(h, w, settings, level)
    rec = np.asarray(rec_arr, dtype=np.float64)
    if settings.per_channel_quant_scales is not None:
        mults = np.array(settings.per_channel_quant_scales, dtype=np.float64)
        rec = rec / mults[:, None, None]
    rec = dequantize(rec, settings.quantization_scale)
    coeffs = ref_dwt.array_to_coeffs(rec, slices)
    image = ref_dwt.waverec2(coeffs, settings.wavelet, mode=settings.mode)
    if settings.color_model is not None:
        image = color_models.convert(image, settings.color_model, "RGB")
    return image


def forward_native(
    image: np.ndarray,
    settings: SpihtSettings,
    level: Optional[int],
    precision: Optional[str] = None,
) -> Tuple[np.ndarray, int, int]:
    """Native C++ DWT + quantization (host production path).

    Same semantics as forward_numpy; color conversion stays in numpy (3x3
    matmuls, negligible), the multilevel transform + quantization run in
    the native kernel. Falls back to forward_numpy when the kernel is
    unavailable or the level is not >= 1. precision: 'f64' (default,
    bit-compatible with the numpy reference) or 'f32' (~2x speed mode;
    also via SPIHT_TPU_PRECISION).
    """
    if precision is None:
        precision = os.environ.get("SPIHT_TPU_PRECISION", "f64")
    from .native import runtime
    from .wavelets.filters import build_wavelet, dwt_max_level

    nat = runtime.load()
    image = np.asarray(image)
    h, w = image.shape[-2], image.shape[-1]
    wav = build_wavelet(settings.wavelet)
    lv = level
    if lv is None:
        lv = min(dwt_max_level(h, wav.dec_len), dwt_max_level(w, wav.dec_len))
    if nat is None or lv < 1 or settings.mode == "periodization":
        # periodization (wraparound + odd-length duplication per level)
        # is implemented in the numpy/JAX paths only
        return forward_numpy(image, settings, level)
    if settings.color_model is not None:
        image = color_models.convert(image, "RGB", settings.color_model)
    slices, ph, pw = get_slices_and_h_w(h, w, settings, level)
    arr, ll_h, ll_w = nat.dwt_forward(
        image,
        wav.dec_lo,
        wav.dec_hi,
        settings.mode,
        lv,
        ph,
        pw,
        chan_scales=settings.per_channel_quant_scales,
        q_scale=settings.quantization_scale,
        precision=precision,
    )
    return arr, ll_h, ll_w


def inverse_native(
    rec_arr: np.ndarray,
    h: int,
    w: int,
    level: Optional[int],
    settings: SpihtSettings,
    slices=None,
    precision: Optional[str] = None,
) -> np.ndarray:
    """Native C++ dequantize + inverse DWT + inverse color.

    Same semantics as inverse_numpy (incl. no final crop — reference
    parity); falls back to it when the kernel is unavailable. precision
    'f64' (default) or 'f32' speed mode (SPIHT_TPU_PRECISION honored).
    """
    if precision is None:
        precision = os.environ.get("SPIHT_TPU_PRECISION", "f64")
    from .native import runtime
    from .wavelets.filters import build_wavelet, dwt_max_level

    nat = runtime.load()
    rec_arr = np.asarray(rec_arr)
    wav = build_wavelet(settings.wavelet)
    lv = level
    if lv is None:
        lv = min(dwt_max_level(h, wav.dec_len), dwt_max_level(w, wav.dec_len))
    if nat is None or lv < 1 or settings.mode == "periodization":
        return inverse_numpy(rec_arr, h, w, level, settings, slices)
    if slices is None:
        slices, _, _ = get_slices_and_h_w(h, w, settings, level)
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    F = wav.rec_len
    lvl_rects = []
    ah, aw = ll_h, ll_w
    for d in slices[1:]:
        s = d["dd"]
        dh, dw = s[1].stop - s[1].start, s[2].stop - s[2].start
        lvl_rects.append((s[1].start, s[2].start, dh, dw))
        ah, aw = 2 * dh - F + 2, 2 * dw - F + 2
    image = nat.dwt_inverse(
        rec_arr,
        wav.rec_lo,
        wav.rec_hi,
        lv,
        ll_h,
        ll_w,
        lvl_rects,
        ah,
        aw,
        chan_scales=settings.per_channel_quant_scales,
        q_scale=settings.quantization_scale,
        precision=precision,
    )
    if settings.color_model is not None:
        image = color_models.convert(image, settings.color_model, "RGB")
    return image


def forward(image, settings: SpihtSettings, level: Optional[int]):
    backend = get_backend()
    if backend == "jax":
        from . import jax_transform

        return jax_transform.forward(image, settings, level)
    if backend == "native":
        return forward_native(image, settings, level)
    return forward_numpy(image, settings, level)


def inverse(rec_arr, h, w, level, settings: SpihtSettings, slices=None):
    backend = get_backend()
    if backend == "jax":
        from . import jax_transform

        return jax_transform.inverse(rec_arr, h, w, level, settings, slices)
    if backend == "native":
        return inverse_native(rec_arr, h, w, level, settings, slices)
    return inverse_numpy(rec_arr, h, w, level, settings, slices)
