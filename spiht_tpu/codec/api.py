"""Public codec API: raw core functions + high-level image encode/decode.

Mirrors the reference surface (spiht/spiht_wrapper.py:142-281 and the raw
``spiht.spiht`` module functions from src/lib.rs:24-56), with the compute
re-architected for TPU: transforms run through ``spiht_tpu.transform``
(JAX when available) and the serial bitstream scheduling dispatches to the
C++ kernel (``spiht_tpu.native``) with a pure-Python fallback.
"""

from __future__ import annotations

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
    "decode_rec_array",
    "decode_from_rec_arr",
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
    nat = _native()
    if nat is not None:
        return nat.encode(arr, ll_h, ll_w, max_bits)
    bits, max_n = oracle.encode_bits(arr, ll_h, ll_w, max_bits)
    return bits_to_bytes(bits), max_n


def decode(
    data: bytes, n: int, c: int, h: int, w: int, ll_h: int, ll_w: int
) -> np.ndarray:
    """Decode bytes -> (C,H,W) int32 coefficient array (prefix-tolerant)."""
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
    nat = _native()
    if nat is not None:
        return nat.decode_with_metadata(
            data, n, c, h, w, ll_h, ll_w, top_slice, other_slices
        )
    bits = bytes_to_bits(data)
    return oracle.decode_bits_with_metadata(
        bits, n, c, h, w, ll_h, ll_w, (top_slice, other_slices)
    )


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
    if image.ndim != 3:
        raise ValueError("image ndim must be 3: c,h,w")
    c, h, w = image.shape

    arr, ll_h, ll_w = transform.forward(image, spiht_settings, level)

    if max_bits is None:
        max_bits = _MAX_BITS_DEFAULT

    encoded_bytes, max_n = encode(arr, ll_h, ll_w, max_bits)
    return EncodingResult(encoded_bytes, h, w, c, int(max_n), level)


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
