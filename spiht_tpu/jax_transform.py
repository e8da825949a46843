"""Jitted JAX transform pipelines (color + DWT + quantization + maps).

This is the device-resident half of the codec: everything up to (and
including) the significance level maps runs as one compiled XLA program;
only the serial bit scheduling leaves the device (to the C++ kernel).

Compiled callables are cached per (settings, level, shape, dtype) — reuse
with same-shaped batches hits the jit cache. All functions accept leading
batch dims: (C, H, W) or (B, C, H, W).

Reference pipeline being re-architected: spiht/spiht_wrapper.py:142-189
(encode: color -> wavedec2 -> coeffs_to_array -> scales -> quantize) and
:259-281 (decode: dequantize -> array_to_coeffs -> waverec2 -> color).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .color import jax_models
from .settings import SpihtSettings
from .wavelets import dwt
from .wavelets.geometry import get_slices_and_h_w
from .codec import maps as _maps

__all__ = [
    "forward",
    "forward_with_maps",
    "forward_compact",
    "inverse",
    "analysis_fn",
    "synthesis_fn",
    "decode_pipeline_fn",
    "decode_pipeline_batch_fn",
    "encode_pipeline_fn",
    "encode_pipeline_batch_fn",
    "default_dtype",
]


def default_dtype() -> jnp.dtype:
    """float64 when x64 is enabled (exactness vs the f64 reference),
    float32 otherwise (TPU-native)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _settings_key(s: SpihtSettings) -> Tuple:
    pcs = s.per_channel_quant_scales
    return (
        s.wavelet,
        float(s.quantization_scale),
        s.mode,
        s.color_model,
        tuple(float(v) for v in pcs) if pcs is not None else None,
    )


@lru_cache(maxsize=None)
def _forward_jit(key: Tuple, level: Optional[int], with_maps: bool, dtype_name: str):
    wavelet, qscale, mode, color_model, pcs = key
    dtype = jnp.dtype(dtype_name)

    def f(image):
        image = image.astype(dtype)
        if color_model is not None:
            image = jax_models.convert(image, "RGB", color_model)
        arr, ll_h, ll_w = dwt.wavedec2_packed(image, wavelet, mode, level)
        if pcs is not None:
            mults = jnp.asarray(pcs, dtype=dtype)[..., :, None, None]
            arr = arr * mults
        # truncate-toward-zero int cast (hazard #1): XLA convert semantics
        arr = (arr * jnp.asarray(qscale, dtype=dtype)).astype(jnp.int32)
        if with_maps:
            m, d, g = _maps.significance_maps(arr, ll_h, ll_w)
            return arr, m, d, g
        return arr

    return jax.jit(f)


def _use_pallas() -> bool:
    """Fused Pallas kernels: on by default on TPU backends.

    SPIHT_TPU_PALLAS=1/0 overrides. CPU keeps the plain XLA path (Mosaic
    compiles for TPU only; tests exercise the kernel in interpreter mode).
    Verified bit-exact against the XLA path on TPU hardware.
    """
    import os

    flag = os.environ.get("SPIHT_TPU_PALLAS")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() not in ("cpu",)


@lru_cache(maxsize=None)
def _forward_compact_jit(key: Tuple, level: Optional[int], dtype_name: str):
    """Like _forward_jit(with_maps=False) but emits an int16-compacted
    coefficient array plus an overflow flag.

    Rationale: on tunneled single-chip setups device->host bandwidth is the
    pipeline bottleneck (measured ~20 MB/s vs ~2 GB/s host->device here);
    quantized coefficients at practical quality settings fit int16, halving
    the transfer. The (rare) overflow case is detected on device and the
    caller falls back to the full int32 path.
    """
    wavelet, qscale, mode, color_model, pcs = key
    dtype = jnp.dtype(dtype_name)
    # the Pallas kernel quantizes in f32; taking it with an f64 working
    # dtype could flip borderline truncations vs the documented bit-exact
    # f64 XLA path, so only use it when the dtypes already agree
    if _use_pallas() and dtype == jnp.float32:
        from .ops.pallas_kernels import quantize_compact_m

        def f(image):
            image = image.astype(dtype)
            if color_model is not None:
                image = jax_models.convert(image, "RGB", color_model)
            coeffs, _, _ = dwt.wavedec2_packed(image, wavelet, mode, level)
            if pcs is not None:
                mults = jnp.asarray(pcs, dtype=dtype)[..., :, None, None]
                coeffs = coeffs * mults
            # fused quantize + int16 compaction + overflow in one pass
            _, arr16, _, overflow = quantize_compact_m(
                coeffs.astype(jnp.float32), qscale
            )
            return arr16, overflow

        return jax.jit(f)

    base = _forward_jit(key, level, False, dtype_name)

    def f(image):
        arr = base.__wrapped__(image)
        overflow = (jnp.abs(arr) > 32767).any()
        arr16 = jnp.clip(arr, -32767, 32767).astype(jnp.int16)
        return arr16, overflow

    return jax.jit(f)


@lru_cache(maxsize=None)
def _inverse_jit(
    key: Tuple,
    h: int,
    w: int,
    level: Optional[int],
    dtype_name: str,
    as_uint8: bool = False,
):
    wavelet, qscale, mode, color_model, pcs = key
    dtype = jnp.dtype(dtype_name)
    settings = SpihtSettings(
        wavelet=wavelet,
        quantization_scale=qscale,
        mode=mode,
        color_model=color_model,
        per_channel_quant_scales=list(pcs) if pcs is not None else None,
    )
    slices, _, _ = get_slices_and_h_w(h, w, settings, level)

    def f(rec_arr):
        rec = rec_arr.astype(dtype)
        if pcs is not None:
            mults = jnp.asarray(pcs, dtype=dtype)[..., :, None, None]
            rec = rec / mults
        rec = rec / jnp.asarray(qscale, dtype=dtype)
        lead = rec.ndim - 3
        coeffs = [rec[(...,) + slices[0][1:]]]
        for d in slices[1:]:
            coeffs.append({k: rec[(...,) + v[1:]] for k, v in d.items()})
        # NOTE: no crop to (h, w) — the reference returns waverec2's output
        # as-is, which can exceed the original dims for odd-sized images
        # (spiht/spiht_wrapper.py:276-281).
        image = dwt.waverec2(coeffs, wavelet, mode)
        if color_model is not None:
            image = jax_models.convert(image, color_model, "RGB")
        if as_uint8:
            # display-ready output: 4x less device->host transfer on
            # bandwidth-bound (tunneled) setups
            image = jnp.round(
                jnp.clip(image, 0.0, 1.0) * 255.0
            ).astype(jnp.uint8)
        return image

    return jax.jit(f)


def analysis_fn(
    settings: SpihtSettings,
    level: Optional[int] = None,
    with_maps: bool = True,
    dtype: Optional[str] = None,
):
    """The jitted device-side encode step: image(s) -> (arr_i32[, M, D, G]).

    This is the flagship compiled program: color conversion, multilevel
    DWT, per-channel scaling, quantization, and the descendant-max
    significance pyramids, fused into one XLA executable.
    """
    dtype = dtype or str(np.dtype(default_dtype()).name)
    return _forward_jit(
        _settings_key(settings), level, with_maps, str(np.dtype(dtype).name)
    )


def synthesis_fn(
    settings: SpihtSettings,
    h: int,
    w: int,
    level: Optional[int] = None,
    dtype: Optional[str] = None,
    as_uint8: bool = False,
):
    """The jitted device-side decode step: rec_arr i32 -> image(s)."""
    dtype = dtype or str(np.dtype(default_dtype()).name)
    return _inverse_jit(
        _settings_key(settings), h, w, level, str(np.dtype(dtype).name),
        as_uint8,
    )


def _pick_machine(flag_env: str) -> str:
    """'pallas' on real TPU backends, 'xla' on CPU (Mosaic interpret is
    test-only); env flag overrides."""
    flag = os.environ.get(flag_env)
    if flag is not None:
        return "pallas" if flag == "1" else "xla"
    try:
        return "pallas" if jax.default_backend() != "cpu" else "xla"
    except Exception:
        return "xla"


@lru_cache(maxsize=None)
def _decode_pipeline_jit(
    key: Tuple,
    h: int,
    w: int,
    level: Optional[int],
    c: int,
    enc_h: int,
    enc_w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    dtype_name: str,
    as_uint8: bool,
    machine: str = "xla",
):
    inv = _inverse_jit(key, h, w, level, dtype_name, as_uint8)

    pallas_machine = None
    if machine == "pallas":
        from .codec.pallas_decoder import machine_fits

        if not machine_fits(c, enc_h, enc_w, ll_h, ll_w, cap_words):
            # 4096^2-class tier: geometry table HBM-resident
            # (round 5; valid at any max_n, so safe at trace time;
            # SPIHT_TPU_DISABLE_HBM_MACHINES=1 opts out)
            if os.environ.get(
                "SPIHT_TPU_DISABLE_HBM_MACHINES"
            ) != "1" and machine_fits(
                c, enc_h, enc_w, ll_h, ll_w, cap_words, geo_hbm=True
            ):
                pallas_machine = "hybrid_hbm"
            else:
                machine = "xla"  # exceeds VMEM: XLA machine instead
    if machine == "pallas":
        from .codec.pallas_decoder import pallas_decode_fn

        # CPU backends get Mosaic interpret mode (test path)
        dec = pallas_decode_fn(
            c, enc_h, enc_w, ll_h, ll_w, cap_words,
            interpret=jax.default_backend() == "cpu",
            machine=pallas_machine,
        )
    else:
        from .codec.device_decoder import _build_hybrid

        dec = _build_hybrid(c, enc_h, enc_w, ll_h, ll_w, cap_words)

    def f(words, nbits, max_n):
        return inv(dec(words, nbits, max_n))

    return jax.jit(f)


def decode_pipeline_fn(
    settings: SpihtSettings,
    h: int,
    w: int,
    level: Optional[int],
    c: int,
    enc_h: int,
    enc_w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    dtype: Optional[str] = None,
    as_uint8: bool = False,
):
    """ONE jitted program for the whole decode: SPIHT bit-parse (hybrid
    plane-phase machine) -> dequantize -> inverse DWT -> inverse color.

    Stream words in HBM -> image in HBM, no host round-trip — the
    decode mirror of `analysis_fn` + the device encoder, i.e. the
    serving shape where a model consumes the decoded image on the same
    chip. fn(words_u32[cap_words], nbits, max_n) -> image.
    """
    dtype = dtype or str(np.dtype(default_dtype()).name)
    return _decode_pipeline_jit(
        _settings_key(settings), h, w, level, c, enc_h, enc_w, ll_h,
        ll_w, cap_words, str(np.dtype(dtype).name), as_uint8,
        machine=_pick_machine("SPIHT_TPU_PALLAS_DECODER"),
    )


def _cap_bits_hint(max_bits: Optional[int]) -> int:
    """Static stream-capacity key for the encode pipelines: the caller's
    bit budget rounded up to a power of two (>= 4096), so nearby budgets
    share one compiled program. None = full provable capacity. A
    narrowed capacity keeps large geometries (e.g. 3x1024x1024, whose
    full 40-bits/cell buffer would push the machine past the VMEM
    budget) on the Pallas machine; runtime max_bits beyond the hint
    raises the overflow flag and callers fall back."""
    if max_bits is None:
        return 2**31 - 2
    cap = 4096
    mb = min(int(max_bits), 2**31 - 2)
    while cap < mb:
        cap <<= 1
    return cap


@lru_cache(maxsize=None)
def _encode_pipeline_jit(
    key: Tuple,
    h: int,
    w: int,
    level: Optional[int],
    c: int,
    dtype_name: str,
    machine: str = "xla",
    cap_bits: int = 2**31 - 2,
):
    from .codec.device_encoder import device_max_n, encode_device_fn

    wavelet, qscale, mode, color_model, pcs = key
    settings = SpihtSettings(
        wavelet=wavelet,
        quantization_scale=qscale,
        mode=mode,
        color_model=color_model,
        per_channel_quant_scales=list(pcs) if pcs is not None else None,
    )
    slices, enc_h, enc_w = get_slices_and_h_w(h, w, settings, level)
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    ana = _forward_jit(key, level, False, dtype_name)
    if machine == "pallas":
        from .codec.pallas_encoder import _cap_words_for, machine_fits

        cap_words = _cap_words_for(c, enc_h, enc_w, cap_bits)
        if not machine_fits(c, enc_h, enc_w, ll_h, ll_w, cap_words):
            machine = "xla"  # state exceeds VMEM: XLA machine instead
    if machine == "pallas":
        from .codec.pallas_encoder import pallas_encode_fn

        enc = pallas_encode_fn(
            c, enc_h, enc_w, ll_h, ll_w, cap_words,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        enc = encode_device_fn(c, enc_h, enc_w, ll_h, ll_w)

    def f(image, max_bits):
        arr = ana.__wrapped__(image)
        max_n = device_max_n(arr)
        words, total, overflow = enc(arr, max_n, max_bits)
        return words, total, overflow, max_n

    return jax.jit(f)


@lru_cache(maxsize=None)
def _decode_pipeline_batch_jit(
    key: Tuple,
    h: int,
    w: int,
    level: Optional[int],
    c: int,
    enc_h: int,
    enc_w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    dtype_name: str,
    as_uint8: bool,
    machine: str = "xla",
):
    base = _decode_pipeline_jit(
        key, h, w, level, c, enc_h, enc_w, ll_h, ll_w, cap_words,
        dtype_name, as_uint8, machine=machine,
    )
    if machine != "pallas":
        return jax.jit(jax.vmap(base.__wrapped__, in_axes=(0, 0, 0)))

    # Pallas route: the B-chain INTERLEAVED machine when a >=2-chain
    # chunk fits VMEM (one kernel steps all chains per iteration —
    # 24.9 MP/s kernel-side at the 512^2 headline vs ~2 MP/s for the
    # serialized lax.map loop, BASELINE.md round 4), else the lax.map
    # loop of single machines (vmap cannot grid-batch SMEM operands).
    from .codec import pallas_decoder as pd

    inv = _inverse_jit(key, h, w, level, dtype_name, as_uint8)
    interp = jax.default_backend() == "cpu"

    def _chunk_for(bb: int) -> int:
        bc = min(pd._ilv_chunk_b(), bb)
        while bc >= 1 and not pd.interleaved_fits(
            bc, c, enc_h, enc_w, ll_h, ll_w, cap_words
        ):
            bc //= 2
        return bc

    @jax.jit
    def f(ws, nb, mn):
        B = ws.shape[0]
        bc = _chunk_for(B)  # static: shapes are trace-time constants
        if bc < 2:
            return jax.lax.map(
                lambda t: base.__wrapped__(t[0], t[1], t[2]),
                (ws, nb, mn),
            )
        g, r = divmod(B, bc)
        parts = []
        if g:
            dfn = pd._interleaved_fn(
                bc, c, enc_h, enc_w, ll_h, ll_w, cap_words, interp,
                "int32",
            )
            if g == 1:
                parts.append(dfn.__wrapped__(ws[:bc], nb[:bc], mn[:bc]))
            else:
                recs = jax.lax.map(
                    lambda t: dfn.__wrapped__(t[0], t[1], t[2]),
                    (
                        ws[: g * bc].reshape(g, bc, cap_words),
                        nb[: g * bc].reshape(g, bc),
                        mn[: g * bc].reshape(g, bc),
                    ),
                )
                parts.append(
                    recs.reshape(g * bc, c, enc_h, enc_w)
                )
        if r:
            dfr = pd._interleaved_fn(
                r, c, enc_h, enc_w, ll_h, ll_w, cap_words, interp,
                "int32",
            )
            parts.append(
                dfr.__wrapped__(ws[g * bc:], nb[g * bc:], mn[g * bc:])
            )
        recs = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        return jax.vmap(inv.__wrapped__)(recs)

    return f


def decode_pipeline_batch_fn(
    settings: SpihtSettings,
    h: int,
    w: int,
    level: Optional[int],
    c: int,
    enc_h: int,
    enc_w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    dtype: Optional[str] = None,
    as_uint8: bool = False,
):
    """Batched fused decode: ONE program vmapping the whole
    stream->image pipeline over same-geometry streams.
    fn(words[B], nbits[B], max_n[B]) -> images[B].
    """
    dtype = dtype or str(np.dtype(default_dtype()).name)
    return _decode_pipeline_batch_jit(
        _settings_key(settings), h, w, level, c, enc_h, enc_w, ll_h,
        ll_w, cap_words, str(np.dtype(dtype).name), as_uint8,
        machine=_pick_machine("SPIHT_TPU_PALLAS_DECODER"),
    )


def encode_pipeline_fn(
    settings: SpihtSettings,
    h: int,
    w: int,
    level: Optional[int],
    c: int = 3,
    dtype: Optional[str] = None,
    max_bits: Optional[int] = None,
):
    """ONE jitted program for the whole encode: color -> DWT -> quantize
    -> max_n (exact f32-truncation semantics, no transcendental) ->
    SPIHT bit emission. Image in HBM -> stream words in HBM.

    The encode mirror of `decode_pipeline_fn`; bit-identical to the
    host path at matching transform dtype. Requires even LL dims (the
    device encoder's parent-gather formulation).
    fn(image, max_bits) -> (words_u32, total_bits, overflow, max_n).

    max_bits: optional bit-budget hint that narrows the static stream
    buffer (see `_cap_bits_hint`); runtime budgets beyond the hint set
    the overflow flag instead of emitting.
    """
    dtype = dtype or str(np.dtype(default_dtype()).name)
    return _encode_pipeline_jit(
        _settings_key(settings), h, w, level, c,
        str(np.dtype(dtype).name),
        machine=_pick_machine("SPIHT_TPU_PALLAS_ENCODER"),
        cap_bits=_cap_bits_hint(max_bits),
    )


@lru_cache(maxsize=None)
def _encode_pipeline_batch_jit(
    key: Tuple,
    h: int,
    w: int,
    level: Optional[int],
    c: int,
    dtype_name: str,
    machine: str = "xla",
    cap_bits: int = 2**31 - 2,
):
    base = _encode_pipeline_jit(key, h, w, level, c, dtype_name,
                                machine=machine, cap_bits=cap_bits)
    if machine != "pallas":
        return jax.jit(jax.vmap(base.__wrapped__, in_axes=(0, 0)))

    # Pallas route: the COMPACT B-chain INTERLEAVED machine when a
    # >=2-chain chunk fits VMEM (30.1 MP/s aggregate at the 512^2
    # headline vs ~5 MP/s for the serialized lax.map loop, BASELINE.md
    # round 4), else the lax.map loop of single machines (vmap cannot
    # grid-batch SMEM operands). The compact layout packs |coeff| in 16
    # bits, so chains with max_n > 15 raise their overflow flag and
    # callers fall back per image (api.encode_images_device does).
    from .codec import pallas_encoder as pe
    from .codec.device_encoder import device_max_n

    wavelet, qscale, mode, color_model, pcs = key
    settings = SpihtSettings(
        wavelet=wavelet,
        quantization_scale=qscale,
        mode=mode,
        color_model=color_model,
        per_channel_quant_scales=list(pcs) if pcs is not None else None,
    )
    slices, enc_h, enc_w = get_slices_and_h_w(h, w, settings, level)
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    cap_words = pe._cap_words_for(c, enc_h, enc_w, cap_bits)
    ana = _forward_jit(key, level, False, dtype_name)
    interp = jax.default_backend() == "cpu"

    def _chunk_for(bb: int) -> int:
        bc = min(pe._ilv_chunk_b(), bb)
        while bc >= 1 and not pe.interleaved_fits(
            bc, c, enc_h, enc_w, ll_h, ll_w, cap_words, compact=True
        ):
            bc //= 2
        return bc

    @jax.jit
    def f(ims, mbs):
        B = ims.shape[0]
        bc = _chunk_for(B) if c <= 8 else 0  # static at trace time
        if bc < 2:
            return jax.lax.map(
                lambda t: base.__wrapped__(t[0], t[1]), (ims, mbs)
            )
        arrs = jax.vmap(ana.__wrapped__)(ims)
        max_ns = jax.vmap(device_max_n)(arrs)
        g, r = divmod(B, bc)
        parts = []
        if g:
            efn = pe._interleaved_fn(
                bc, c, enc_h, enc_w, ll_h, ll_w, cap_words, interp,
                compact=True,
            )
            if g == 1:
                parts.append(
                    efn.__wrapped__(arrs[:bc], max_ns[:bc], mbs[:bc])
                )
            else:
                wt = jax.lax.map(
                    lambda t: efn.__wrapped__(t[0], t[1], t[2]),
                    (
                        arrs[: g * bc].reshape(g, bc, c, enc_h, enc_w),
                        max_ns[: g * bc].reshape(g, bc),
                        mbs[: g * bc].reshape(g, bc),
                    ),
                )
                parts.append(
                    tuple(
                        x.reshape((g * bc,) + x.shape[2:]) for x in wt
                    )
                )
        if r:
            efr = pe._interleaved_fn(
                r, c, enc_h, enc_w, ll_h, ll_w, cap_words, interp,
                compact=True,
            )
            parts.append(
                efr.__wrapped__(arrs[g * bc:], max_ns[g * bc:],
                                mbs[g * bc:])
            )
        if len(parts) == 1:
            words, totals, ovf = parts[0]
        else:
            words = jnp.concatenate([p[0] for p in parts])
            totals = jnp.concatenate([p[1] for p in parts])
            ovf = jnp.concatenate([p[2] for p in parts])
        # compact-layout validity: 16-bit magnitude field
        ovf = ovf | (max_ns > 15)
        return words, totals, ovf, max_ns

    return f


def encode_pipeline_batch_fn(
    settings: SpihtSettings,
    h: int,
    w: int,
    level: Optional[int],
    c: int = 3,
    dtype: Optional[str] = None,
    max_bits: Optional[int] = None,
):
    """Batched fused encode: ONE program vmapping the whole
    image->stream pipeline over a same-shape batch.
    fn(images[B], max_bits[B]) -> (words[B], totals[B], overflows[B],
    max_ns[B]) — per-image max_n and budgets, B streams out.

    max_bits: optional hint covering the LARGEST per-image budget; it
    narrows the static stream buffer (see `_cap_bits_hint`).
    """
    dtype = dtype or str(np.dtype(default_dtype()).name)
    return _encode_pipeline_batch_jit(
        _settings_key(settings), h, w, level, c,
        str(np.dtype(dtype).name),
        machine=_pick_machine("SPIHT_TPU_PALLAS_ENCODER"),
        cap_bits=_cap_bits_hint(max_bits),
    )


def forward(
    image: np.ndarray, settings: SpihtSettings, level: Optional[int]
) -> Tuple[np.ndarray, int, int]:
    """Host-facing forward transform: (C,H,W) float -> (i32 arr, ll_h, ll_w)."""
    image = np.asarray(image)
    slices, _, _ = get_slices_and_h_w(
        image.shape[-2], image.shape[-1], settings, level
    )
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    fn = _forward_jit(
        _settings_key(settings), level, False, str(np.dtype(default_dtype()).name)
    )
    arr = np.asarray(jax.device_get(fn(jnp.asarray(image))))
    return arr, ll_h, ll_w


def forward_with_maps(
    image: np.ndarray, settings: SpihtSettings, level: Optional[int]
):
    """Forward transform + significance maps, one device round-trip.

    Returns (arr_i32, (M, D, G), ll_h, ll_w) as host numpy arrays, ready
    for the C++ scheduling kernel.
    """
    image = np.asarray(image)
    slices, _, _ = get_slices_and_h_w(
        image.shape[-2], image.shape[-1], settings, level
    )
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    fn = _forward_jit(
        _settings_key(settings), level, True, str(np.dtype(default_dtype()).name)
    )
    arr, m, d, g = (np.asarray(x) for x in jax.device_get(fn(jnp.asarray(image))))
    return arr, (m, d, g), ll_h, ll_w


@lru_cache(maxsize=None)
def _forward_plan_jit(
    key: Tuple, level: Optional[int], ll: Tuple[int, int], dtype_name: str
):
    """Device phase 1 of the budget-narrowed transfer (see encode_images):
    full analysis, keeping the i32 coefficient array ON DEVICE and shipping
    only per-image (max |x|, per-plane bit counts) — a few hundred bytes.

    Counts are computed at the exact per-image max(M); the caller extends
    them to the reference's f32-rule max_n on host (the planes in between
    emit one all-zero test per initial LIP/LIS entity).
    """
    wavelet, qscale, mode, color_model, pcs = key
    ll_h, ll_w = ll
    dtype = jnp.dtype(dtype_name)
    base = _forward_jit(key, level, False, dtype_name)

    from .codec import planning as _planning

    def f(images):  # (B, C, H, W)
        arr = base.__wrapped__(images)
        mx = jnp.abs(arr).max(axis=(-3, -2, -1))
        m, d, g = _maps.significance_maps(arr, ll_h, ll_w)
        max_n_dev = jnp.maximum(
            m.max(axis=(-3, -2, -1)).astype(jnp.int32), 0
        )
        counts = jax.vmap(
            _planning.bits_per_plane_from_maps,
            in_axes=(0, 0, 0, None, None, 0),
        )(m, d, g, ll_h, ll_w, max_n_dev)
        return arr, mx, counts, max_n_dev

    return jax.jit(f)


@lru_cache(maxsize=None)
def _narrow_jit(out_dtype_name: str):
    """Device phase 2: shift magnitudes right by per-image s and narrow."""
    out_dtype = jnp.dtype(out_dtype_name)

    def f(arr, s):  # arr (B, C, H, W) i32; s (B,) i32
        sh = s[:, None, None, None]
        mag = jnp.abs(arr) >> sh
        return jnp.where(arr >= 0, mag, -mag).astype(out_dtype)

    return jax.jit(f)


def forward_compact(
    image: np.ndarray, settings: SpihtSettings, level: Optional[int]
) -> Tuple[np.ndarray, int, int]:
    """Forward transform with minimized device->host transfer.

    Ships an int16 coefficient array (half the bytes of int32) plus a
    1-byte overflow flag; falls back to the exact int32 path when any
    coefficient magnitude exceeds int16 range. Returns (arr_i32, ll_h,
    ll_w) — bit-identical to ``forward``.
    """
    image = np.asarray(image)
    slices, _, _ = get_slices_and_h_w(
        image.shape[-2], image.shape[-1], settings, level
    )
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    fn = _forward_compact_jit(
        _settings_key(settings), level, str(np.dtype(default_dtype()).name)
    )
    arr16, overflow = fn(jnp.asarray(image))
    if bool(overflow):
        return forward(image, settings, level)
    arr = np.asarray(arr16).astype(np.int32)
    return arr, ll_h, ll_w


def inverse(
    rec_arr: np.ndarray,
    h: int,
    w: int,
    level: Optional[int],
    settings: SpihtSettings,
    slices=None,
) -> np.ndarray:
    """Host-facing inverse transform: i32 rec array -> (C,H,W) float image."""
    del slices  # recomputed statically from (h, w, settings, level)
    fn = _inverse_jit(
        _settings_key(settings), h, w, level, str(np.dtype(default_dtype()).name)
    )
    return np.asarray(jax.device_get(fn(jnp.asarray(rec_arr))))
