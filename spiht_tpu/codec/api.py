"""Public codec API: raw core functions + high-level image encode/decode.

Mirrors the reference surface (spiht/spiht_wrapper.py:142-281 and the raw
``spiht.spiht`` module functions from src/lib.rs:24-56), with the compute
re-architected for TPU: transforms run through ``spiht_tpu.transform``
(JAX when available) and the serial bitstream scheduling dispatches to the
C++ kernel (``spiht_tpu.native``) with a pure-Python fallback.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import numpy as np

from .. import transform
from ..ops.bitpack import bits_to_bytes, bytes_to_bits
from ..settings import ENCODER_DECODER_VERSION, EncodingResult, SpihtSettings
from ..wavelets.geometry import get_slices_and_h_w, slices_to_wire
from . import oracle

__all__ = [
    "encode",
    "decode",
    "decode_with_metadata",
    "encode_image",
    "decode_image",
    "encode_images",
    "decode_images",
    "decode_rec_array",
    "decode_from_rec_arr",
    "decode_image_device",
    "decode_images_device",
    "encode_image_device",
    "encode_images_device",
    "get_slices_and_h_w",
]

_MAX_BITS_DEFAULT = 99999999999999999


def _native():
    """The C++ scheduling kernel, or None if unavailable."""
    try:
        from ..native import runtime

        return runtime.load()
    except Exception:
        return None


def encode(
    arr: np.ndarray, ll_h: int, ll_w: int, max_bits: int = _MAX_BITS_DEFAULT
) -> Tuple[bytes, int]:
    """SPIHT-encode a (C,H,W) int32 coefficient array -> (bytes, max_n)."""
    arr = np.ascontiguousarray(arr, dtype=np.int32)
    if (
        os.environ.get("SPIHT_TPU_DEVICE_ENCODER") == "1"
        and ll_h % 2 == 0
        and ll_w % 2 == 0
    ):
        # experimental: the whole bitstream as one jitted XLA program
        # (codec/device_encoder.py); bit-identical to the native kernel.
        # Odd-LL geometries fall through to the native path (the parity
        # child map is non-injective there), and adversarial streams
        # that exceed the device output buffer fall back to the host
        # scheduler instead of truncating.
        from .device_encoder import CapacityOverflow, encode_device

        try:
            return encode_device(arr, ll_h, ll_w, max_bits)
        except CapacityOverflow:
            pass
    nat = _native()
    if nat is not None:
        return nat.encode(arr, ll_h, ll_w, max_bits)
    bits, max_n = oracle.encode_bits(arr, ll_h, ll_w, max_bits)
    return bits_to_bytes(bits), max_n


def decode(
    data: bytes, n: int, c: int, h: int, w: int, ll_h: int, ll_w: int
) -> np.ndarray:
    """Decode bytes -> (C,H,W) int32 coefficient array (prefix-tolerant)."""
    if os.environ.get("SPIHT_TPU_DEVICE_DECODER") == "1":
        # the whole decode as one jitted XLA program (hybrid plane-phase
        # machine; see codec/device_decoder.py) — bit-identical to the
        # native kernel, works for any ll geometry. Geometries beyond
        # the packed-entry range (c*h*w >= 2^24) fall through to the
        # host kernel.
        from .device_decoder import decode_device

        try:
            return decode_device(data, n, c, h, w, ll_h, ll_w)
        except ValueError:
            pass
    nat = _native()
    if nat is not None:
        return nat.decode(data, n, c, h, w, ll_h, ll_w)
    bits = bytes_to_bits(data)
    return oracle.decode_bits(bits, n, c, h, w, ll_h, ll_w)


def decode_with_metadata(
    data: bytes,
    n: int,
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    top_slice,
    other_slices,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode bytes and emit the per-bit decoder-state trace array."""
    if os.environ.get("SPIHT_TPU_DEVICE_DECODER") == "1":
        from .device_decoder import decode_device_with_metadata

        return decode_device_with_metadata(
            data, n, c, h, w, ll_h, ll_w,
            tuple(tuple(t) for t in top_slice),
            tuple(
                tuple(tuple(tuple(p) for p in f) for f in lvl)
                for lvl in other_slices
            ),
        )
    nat = _native()
    if nat is not None:
        return nat.decode_with_metadata(
            data, n, c, h, w, ll_h, ll_w, top_slice, other_slices
        )
    bits = bytes_to_bits(data)
    return oracle.decode_bits_with_metadata(
        bits, n, c, h, w, ll_h, ll_w, (top_slice, other_slices)
    )


def _validate_image(image: np.ndarray) -> None:
    if image.ndim != 3:
        raise ValueError("image ndim must be 3: c,h,w")
    import os

    if os.environ.get("SPIHT_TPU_VALIDATE") == "1" and not np.isfinite(
        image
    ).all():
        # NaN/Inf would silently corrupt quantization (NaN -> 0 via the
        # int cast but poison neighboring DWT taps); opt-in guard since
        # the check costs a full pass over the input
        raise ValueError("image contains NaN/Inf")


def encode_image(
    image: np.ndarray,
    spiht_settings: SpihtSettings = SpihtSettings(),
    level: Optional[int] = None,
    max_bits: Optional[int] = None,
) -> EncodingResult:
    """DWT + quantize + SPIHT-encode an image (reference CS1 pipeline).

    image: (C,H,W) float ndarray.
    """
    image = np.asarray(image)
    _validate_image(image)
    c, h, w = image.shape

    arr, ll_h, ll_w = transform.forward(image, spiht_settings, level)

    if max_bits is None:
        max_bits = _MAX_BITS_DEFAULT

    encoded_bytes, max_n = encode(arr, ll_h, ll_w, max_bits)
    return EncodingResult(encoded_bytes, h, w, c, int(max_n), level)


def encode_image_device(
    image: np.ndarray,
    spiht_settings: SpihtSettings = SpihtSettings(),
    level: Optional[int] = None,
    max_bits: Optional[int] = None,
) -> EncodingResult:
    """Encode an image entirely on device, as ONE XLA program.

    Color conversion -> DWT -> quantization -> max_n (exact reference
    f32-truncation semantics) -> SPIHT bit emission, fused: the image
    ships host->device and only the finished stream comes back.
    Bit-identical to `encode_image` at matching transform dtype (f64
    under x64, f32 otherwise — f32 can flip borderline quantization
    truncations vs the f64 host path, exactly like the host f32 speed
    mode). Odd-LL geometries (the device encoder's parent-gather
    formulation does not apply) and streams that exceed the device bit
    buffer fall back to the host encoder.
    """
    from .. import jax_transform

    image = np.asarray(image)
    _validate_image(image)
    c, h, w = image.shape
    cap_hint = max_bits  # budget-narrowed stream buffer (None = full)
    if max_bits is None:
        max_bits = _MAX_BITS_DEFAULT
    try:
        fn = jax_transform.encode_pipeline_fn(
            spiht_settings, h, w, level, c, max_bits=cap_hint
        )
    except ValueError:
        return encode_image(image, spiht_settings, level, max_bits)
    words, total, overflow, max_n = fn(
        np.ascontiguousarray(image), min(int(max_bits), 2**31 - 2)
    )
    if bool(overflow):
        return encode_image(image, spiht_settings, level, max_bits)
    total = int(total)
    data = np.asarray(words).view(np.uint8)[: (total + 7) // 8].tobytes()
    return EncodingResult(data, h, w, c, int(max_n), level)


def encode_images_device(
    images,
    spiht_settings: SpihtSettings = SpihtSettings(),
    level: Optional[int] = None,
    max_bits=None,
):
    """Batched fully-on-device encode for a SAME-SHAPE image batch.

    One XLA program vmaps the fused pipeline (color -> DWT -> quantize
    -> max_n -> bit emission) over the batch: B images in HBM, B
    streams out. Mixed shapes, odd-LL geometries, or per-image overflow
    fall back to the standard `encode_images` / host path per image.
    Returns a list of EncodingResult.
    """
    from .. import jax_transform

    ims = [np.asarray(im) for im in images]
    if not ims:
        return []
    shapes = {im.shape for im in ims}
    if len(shapes) != 1:
        return encode_images(images, spiht_settings, level, max_bits)
    for im in ims:
        _validate_image(im)
    c, h, w = ims[0].shape
    B = len(ims)
    if max_bits is None:
        mbs = [_MAX_BITS_DEFAULT] * B
    elif np.isscalar(max_bits):
        mbs = [int(max_bits)] * B
    else:
        mbs = [int(m) for m in max_bits]
    try:
        fn = jax_transform.encode_pipeline_batch_fn(
            spiht_settings, h, w, level, c,
            max_bits=None if max_bits is None else max(mbs),
        )
    except ValueError:  # odd-LL geometry
        return encode_images(images, spiht_settings, level, max_bits)
    words, totals, overflows, max_ns = fn(
        np.ascontiguousarray(np.stack(ims)),
        np.asarray([min(m, 2**31 - 2) for m in mbs], np.int32),
    )
    words = np.asarray(words)
    out = []
    for b in range(B):
        if bool(overflows[b]):
            out.append(
                encode_image(ims[b], spiht_settings, level, mbs[b])
            )
            continue
        t = int(totals[b])
        data = words[b].view(np.uint8)[: (t + 7) // 8].tobytes()
        out.append(
            EncodingResult(data, h, w, c, int(max_ns[b]), level)
        )
    return out


def _encode_images_budget(images, groups, mb, spiht_settings, level, nat):
    """Budget-narrowed jax encode path (see encode_images). Returns the
    result list, or None to fall back to the standard path."""
    import jax
    import jax.numpy as jnp

    from .. import jax_transform
    from . import planning
    from .oracle import compute_max_n as _host_max_n

    n = len(images)
    results = [None] * n
    for shape, idxs in groups.items():
        slices, _, _ = get_slices_and_h_w(
            shape[-2], shape[-1], spiht_settings, level
        )
        ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
        if not planning.plan_supported(ll_h, ll_w):
            return None
        c = shape[0]
        # planes above the device's exact max(M) emit one all-zero test
        # per initial LIP/LIS entity
        n_ee = ((ll_h + 1) // 2) * ((ll_w + 1) // 2)
        n_init = c * ll_h * ll_w + c * (ll_h * ll_w - n_ee)

        fn = jax_transform._forward_plan_jit(
            jax_transform._settings_key(spiht_settings),
            level,
            (ll_h, ll_w),
            str(np.dtype(jax_transform.default_dtype()).name),
        )
        batch = np.stack([images[i] for i in idxs])
        arr_dev, mx, counts, max_n_dev = fn(jnp.asarray(batch))
        mx = np.asarray(mx)
        counts = np.asarray(counts).astype(np.int64)
        max_n_dev = np.asarray(max_n_dev)

        shifts = np.zeros(len(idxs), dtype=np.int32)
        max_ns = np.zeros(len(idxs), dtype=np.int32)
        for bi, i in enumerate(idxs):
            max_n = _host_max_n(np.asarray([[[mx[bi]]]], dtype=np.int64))
            max_ns[bi] = max_n
            ci = counts[bi].copy()
            ci[max_n_dev[bi] + 1 : max_n + 1] = n_init
            plane, _ = planning.cut_plane_np(ci, max_n, int(mb[i]))
            shifts[bi] = max(plane, 0)
        wmax = int(np.max(mx >> shifts)) if len(idxs) else 0
        if wmax <= 127:
            dtype = "int8"
        elif wmax <= 32767:
            dtype = "int16"
        else:
            return None  # narrowing doesn't pay; standard path
        narrow = jax_transform._narrow_jit(dtype)
        hi = np.asarray(narrow(arr_dev, jnp.asarray(shifts)))
        mag = np.abs(hi.astype(np.int32)) << shifts[:, None, None, None]
        arr = np.where(hi >= 0, mag, -mag).astype(np.int32)

        encoded = nat.encode_batch(
            list(arr),
            [ll_h] * len(idxs),
            [ll_w] * len(idxs),
            [mb[i] for i in idxs],
            use_maps=True,
            forced_max_ns=max_ns,
        )
        for bi, i in enumerate(idxs):
            ci_, h, w = images[i].shape
            results[i] = EncodingResult(
                encoded[bi][0], h, w, ci_, int(encoded[bi][1]), level
            )
    return results


def encode_images(
    images,
    spiht_settings: SpihtSettings = SpihtSettings(),
    level: Optional[int] = None,
    max_bits=None,
):
    """Batched encode: list of (C,H,W) float images -> list of EncodingResult.

    The TPU-first throughput path: images are grouped by shape, each group's
    transform + significance maps run as ONE jitted XLA program on device,
    and the serial bit scheduling for ALL images runs concurrently in native
    threads consuming those maps. Mixed resolutions are fine (they form
    separate jit groups).

    ``max_bits``: None, a scalar applied to all, or a per-image sequence.
    """
    images = [np.asarray(im) for im in images]
    n = len(images)
    if max_bits is None:
        mb = [_MAX_BITS_DEFAULT] * n
    elif np.isscalar(max_bits):
        mb = [int(max_bits)] * n
    else:
        mb = [int(v) if v is not None else _MAX_BITS_DEFAULT for v in max_bits]
    if len(mb) != n:
        raise ValueError("max_bits sequence length != number of images")
    for im in images:
        _validate_image(im)

    nat = _native()

    # group by shape for batched device transforms
    groups = {}
    for idx, im in enumerate(images):
        groups.setdefault(im.shape, []).append(idx)

    arrs = [None] * n
    lls = [None] * n
    backend = transform.get_backend()
    if (
        backend == "jax"
        and nat is not None
        and all(m < 2**40 for m in mb)
        and os.environ.get("SPIHT_TPU_BUDGET_TRANSFER") != "0"
    ):
        # budget-narrowed transfer: the device ships per-image (max|x|,
        # per-plane bit counts) — a few hundred bytes — the host computes
        # each stream's cut plane, and the device then ships only the
        # magnitude bits at or above it (often int8), unshifted on host.
        # The emitted streams are bit-identical: bits below the cut plane
        # are never touched within the budget. Falls back transparently
        # on odd-LL geometries or when narrowing wouldn't fit int16.
        done = _encode_images_budget(
            images, groups, mb, spiht_settings, level, nat
        )
        if done is not None:
            return done
    if backend == "jax":
        import jax
        import jax.numpy as jnp

        from .. import jax_transform

        # int16-compacted transfer; significance maps are recomputed by the
        # native kernel in O(N) (cheaper than shipping them over d2h).
        # Pipelined: all shape-groups are dispatched to the device first
        # (async), then all device->host copies started, then results are
        # consumed in order — so the serial bit scheduling of group k
        # overlaps the in-flight transfers/compute of groups k+1...
        launched = []
        for shape, idxs in groups.items():
            slices, _, _ = get_slices_and_h_w(
                shape[-2], shape[-1], spiht_settings, level
            )
            ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
            fn = jax_transform._forward_compact_jit(
                jax_transform._settings_key(spiht_settings),
                level,
                str(np.dtype(jax_transform.default_dtype()).name),
            )
            batch = np.stack([images[i] for i in idxs])
            arr16, overflow = fn(jnp.asarray(batch))
            launched.append((idxs, ll_h, ll_w, batch, arr16, overflow))
        for _, _, _, _, arr16, _ in launched:
            try:
                arr16.copy_to_host_async()
            except AttributeError:
                pass
        for idxs, ll_h, ll_w, batch, arr16, overflow in launched:
            if bool(overflow):
                # rare: coefficients exceed int16 — full-precision fallback
                arr, _, _ = jax_transform.forward(
                    batch, spiht_settings, level
                )
            else:
                arr = np.asarray(arr16).astype(np.int32)
            for bi, i in enumerate(idxs):
                arrs[i] = arr[bi]
                lls[i] = (ll_h, ll_w)
    elif backend == "native" and nat is not None:
        # host production path: transform AND scheduling fused per image
        # across a thread pool (the ctypes calls release the GIL), so no
        # barrier between the two stages
        from concurrent.futures import ThreadPoolExecutor

        def work(i):
            arr, ll_h, ll_w = transform.forward_native(
                images[i], spiht_settings, level
            )
            data, max_n = nat.encode(arr, ll_h, ll_w, mb[i])
            return i, data, max_n

        results = [None] * n
        with ThreadPoolExecutor() as pool:
            for i, data, max_n in pool.map(work, range(n)):
                c, h, w = images[i].shape
                results[i] = EncodingResult(data, h, w, c, int(max_n), level)
        return results
    else:
        for i, im in enumerate(images):
            arr, ll_h, ll_w = transform.forward(im, spiht_settings, level)
            arrs[i] = arr
            lls[i] = (ll_h, ll_w)

    results = [None] * n
    if nat is not None:
        encoded = nat.encode_batch(
            arrs,
            [ll[0] for ll in lls],
            [ll[1] for ll in lls],
            mb,
            use_maps=True,
        )
        for i, (data, max_n) in enumerate(encoded):
            c, h, w = images[i].shape
            results[i] = EncodingResult(data, h, w, c, int(max_n), level)
    else:
        for i in range(n):
            bits, max_n = oracle.encode_bits(arrs[i], lls[i][0], lls[i][1], mb[i])
            c, h, w = images[i].shape
            results[i] = EncodingResult(
                bits_to_bytes(bits), h, w, c, int(max_n), level
            )
    return results


def decode_images(encoding_results, spiht_settings: SpihtSettings):
    """Batched decode: list of EncodingResult -> list of (C,H,W) float images.

    Streams are decoded concurrently in native threads; the inverse
    transforms run as one jitted program per (enc shape, level) group.
    """
    n = len(encoding_results)
    geo = []
    for er in encoding_results:
        if er._encoding_version != ENCODER_DECODER_VERSION:
            raise ValueError(er._encoding_version)
        slices, enc_h, enc_w = get_slices_and_h_w(
            er.h, er.w, spiht_settings, er.level
        )
        geo.append((slices, enc_h, enc_w, slices[0][1].stop, slices[0][2].stop))

    nat = _native()
    if nat is not None and transform.get_backend() == "native":
        # fused per-image decode + inverse transform across threads
        from concurrent.futures import ThreadPoolExecutor

        def work(i):
            er = encoding_results[i]
            _, enc_h, enc_w, ll_h, ll_w = geo[i]
            rec = nat.decode(
                er.encoded_bytes, er.max_n, er.c, enc_h, enc_w, ll_h, ll_w
            )
            return i, transform.inverse(
                rec, er.h, er.w, er.level, spiht_settings
            )

        images = [None] * n
        with ThreadPoolExecutor() as pool:
            for i, im in pool.map(work, range(n)):
                images[i] = im
        return images
    if nat is not None:
        recs = nat.decode_batch(
            [er.encoded_bytes for er in encoding_results],
            [er.max_n for er in encoding_results],
            [er.c for er in encoding_results],
            [g[1] for g in geo],
            [g[2] for g in geo],
            [g[3] for g in geo],
            [g[4] for g in geo],
        )
    else:
        recs = [
            oracle.decode_bits(
                bytes_to_bits(er.encoded_bytes), er.max_n, er.c, g[1], g[2],
                g[3], g[4],
            )
            for er, g in zip(encoding_results, geo)
        ]

    images = [None] * n
    # group same-geometry results for one batched inverse transform each
    groups = {}
    for i, (er, g) in enumerate(zip(encoding_results, geo)):
        key = (recs[i].shape, er.h, er.w, er.level)
        groups.setdefault(key, []).append(i)
    if transform.get_backend() == "jax":
        for (shape, h, w, level), idxs in groups.items():
            batch = np.stack([recs[i] for i in idxs])
            out = transform.inverse(batch, h, w, level, spiht_settings)
            for bi, i in enumerate(idxs):
                images[i] = np.asarray(out[bi])
    else:
        # the numpy reference inverse is single-image (slice indexing)
        for i, er in enumerate(encoding_results):
            images[i] = transform.inverse(
                recs[i], er.h, er.w, er.level, spiht_settings
            )
    return images


def decode_rec_array(
    encoding_result: EncodingResult,
    spiht_settings: SpihtSettings,
    return_metadata: bool = False,
):
    """Decode to the packed coefficient array (reference CS2, first half)."""
    if encoding_result._encoding_version != ENCODER_DECODER_VERSION:
        raise ValueError(encoding_result._encoding_version)

    h, w, c = encoding_result.h, encoding_result.w, encoding_result.c
    slices, enc_h, enc_w = get_slices_and_h_w(
        h, w, spiht_settings, encoding_result.level
    )
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop

    if return_metadata:
        top_slice, other_slices = slices_to_wire(slices)
        rec_arr, spiht_metadata = decode_with_metadata(
            encoding_result.encoded_bytes,
            encoding_result.max_n,
            c,
            enc_h,
            enc_w,
            ll_h,
            ll_w,
            top_slice,
            other_slices,
        )
    else:
        rec_arr = decode(
            encoding_result.encoded_bytes,
            encoding_result.max_n,
            c,
            enc_h,
            enc_w,
            ll_h,
            ll_w,
        )
        spiht_metadata = None

    return dict(
        rec_arr=rec_arr,
        slices=slices,
        spiht_metadata=spiht_metadata,
        h=h,
        w=w,
        level=encoding_result.level,
    )


def decode_from_rec_arr(
    rec_arr: np.ndarray,
    h: int,
    w: int,
    level,
    spiht_settings: SpihtSettings,
    slices=None,
) -> np.ndarray:
    """Un-quantize + inverse DWT + inverse color (reference CS2, 2nd half)."""
    return transform.inverse(rec_arr, h, w, level, spiht_settings, slices)


def decode_image_device(
    encoding_result: EncodingResult,
    spiht_settings: SpihtSettings,
    as_uint8: bool = False,
) -> np.ndarray:
    """Decode an EncodingResult entirely on device, as ONE XLA program.

    SPIHT bit-parse (hybrid plane-phase machine) -> dequantize ->
    inverse DWT -> inverse color conversion, fused: stream words go up
    (host->device is the fast direction), the finished image comes back
    (or stays in HBM for an on-chip consumer — pass the returned jax
    array onward instead of materializing it). The serving-path mirror
    of `decode_image`; bit-parse identical to the native kernel, image
    equal to the host inverse transform at matching dtype.
    """
    from .. import jax_transform
    from .device_decoder import _words_of

    if encoding_result._encoding_version != ENCODER_DECODER_VERSION:
        raise ValueError(encoding_result._encoding_version)
    h, w, c = encoding_result.h, encoding_result.w, encoding_result.c
    slices, enc_h, enc_w = get_slices_and_h_w(
        h, w, spiht_settings, encoding_result.level
    )
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    data = encoding_result.encoded_bytes
    nbits = len(data) * 8
    cap_words = max((nbits + 31) // 32, 1)
    try:
        fn = jax_transform.decode_pipeline_fn(
            spiht_settings, h, w, encoding_result.level, c, enc_h,
            enc_w, ll_h, ll_w, cap_words, as_uint8=as_uint8,
        )
    except ValueError:  # geometry beyond the packed-entry range
        image = decode_image(encoding_result, spiht_settings)
        if as_uint8:
            image = np.round(
                np.clip(image, 0.0, 1.0) * 255.0
            ).astype(np.uint8)
        return image
    image = fn(
        _words_of(data, cap_words), nbits, int(encoding_result.max_n)
    )
    return np.asarray(image)


def decode_images_device(
    encoding_results,
    spiht_settings: SpihtSettings,
    as_uint8: bool = False,
):
    """Batched fully-on-device decode for same-geometry streams.

    One XLA program vmaps the fused stream->image pipeline (bit-parse,
    dequantize, inverse DWT, inverse color) over the batch. Mixed
    geometries fall back to per-image `decode_image_device`. Returns a
    list of images.
    """
    from .. import jax_transform
    from .device_decoder import _words_of

    ers = list(encoding_results)
    if not ers:
        return []
    keys = {(er.h, er.w, er.c, er.level) for er in ers}
    if len(keys) != 1:
        return [
            decode_image_device(er, spiht_settings, as_uint8)
            for er in ers
        ]
    for er in ers:
        if er._encoding_version != ENCODER_DECODER_VERSION:
            raise ValueError(er._encoding_version)
    h, w, c = ers[0].h, ers[0].w, ers[0].c
    slices, enc_h, enc_w = get_slices_and_h_w(
        h, w, spiht_settings, ers[0].level
    )
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    cap_words = max(
        (max(len(er.encoded_bytes) for er in ers) * 8 + 31) // 32, 1
    )
    fn = jax_transform.decode_pipeline_batch_fn(
        spiht_settings, h, w, ers[0].level, c, enc_h, enc_w, ll_h,
        ll_w, cap_words, as_uint8=as_uint8,
    )
    words = np.stack(
        [np.asarray(_words_of(er.encoded_bytes, cap_words)) for er in ers]
    )
    nbits = np.asarray(
        [len(er.encoded_bytes) * 8 for er in ers], np.int32
    )
    ns = np.asarray([er.max_n for er in ers], np.int32)
    images = fn(words, nbits, ns)
    return [np.asarray(im) for im in images]


def decode_image(
    encoding_result: EncodingResult,
    spiht_settings: SpihtSettings,
    return_metadata: bool = False,
) -> Union[np.ndarray, Tuple[np.ndarray, np.ndarray]]:
    """Decode an EncodingResult back to a (C,H,W) float image."""
    d = decode_rec_array(encoding_result, spiht_settings, return_metadata)
    spiht_metadata = d.pop("spiht_metadata", None)
    image = decode_from_rec_arr(**d, spiht_settings=spiht_settings)
    if return_metadata:
        return image, spiht_metadata
    return image
