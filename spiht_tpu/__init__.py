"""spiht_tpu — a TPU-native SPIHT progressive wavelet image codec.

A from-scratch JAX/XLA/Pallas + C++ framework with the capabilities of the
reference Python+Rust implementation (theAdamColton/spiht): multilevel 2D
DWT, color models, per-channel quantization, SPIHT zerotree bit-plane
coding with embedded (truncatable) bitstreams, and the per-bit decoder
metadata trace for ML consumption.

Architecture (TPU-first, not a port):
  * transforms + significance analysis run batched on TPU via JAX/XLA
    (DWT kernels, descendant-max pyramids, per-plane significance maps);
  * the inherently serial bitstream ordering runs in a multithreaded C++
    kernel driven by those precomputed maps (no tree recursion);
  * scaling is expressed with jax.sharding over device meshes.

Public API mirrors the reference surface (spiht/__init__.py:1-2).
"""

from . import interop
from .settings import ENCODER_DECODER_VERSION, EncodingResult, SpihtSettings
from .codec.api import (
    decode,
    decode_image,
    decode_image_device,
    decode_images_device,
    encode_image_device,
    encode_images_device,
    decode_rec_array,
    decode_from_rec_arr,
    decode_with_metadata,
    encode,
    encode_image,
    encode_images,
    decode_images,
    get_slices_and_h_w,
)

__all__ = [
    "ENCODER_DECODER_VERSION",
    "EncodingResult",
    "SpihtSettings",
    "encode",
    "decode",
    "decode_with_metadata",
    "encode_image",
    "decode_image",
    "decode_image_device",
    "decode_images_device",
    "encode_image_device",
    "encode_images_device",
    "encode_images",
    "decode_images",
    "decode_rec_array",
    "decode_from_rec_arr",
    "get_slices_and_h_w",
    "interop",
]

__version__ = "0.1.0"
