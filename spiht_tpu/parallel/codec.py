"""End-to-end sharded encode of one huge image across a device mesh.

Composes the pieces: color conversion and quantization partition
elementwise; the DWT runs with W sharded and ppermute halo exchange
(parallel/spatial.py); the significance scheduling consumes the gathered
coefficient array in the native kernel. The emitted stream is identical
to the single-device jax path (and bit-compatible with the host
backends modulo f32/f64 — use x64 for strict equality).

This is the "8K image tiled across chips" configuration
(BASELINE.json config 5); tests exercise it on a virtual CPU mesh.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codec import api as codec_api
from ..color import jax_models
from ..settings import EncodingResult, SpihtSettings
from ..wavelets.filters import build_wavelet, dwt_max_level
from ..wavelets.geometry import get_slices_and_h_w
from .. import jax_transform
from .spatial import sharded_wavedec2_packed

__all__ = ["encode_image_sharded"]


@lru_cache(maxsize=None)
def _sharded_forward_jit(
    key, level: int, mesh_key, axis_name: str, dtype_name: str,
    true_w: int = 0,
):
    wavelet, qscale, mode, color_model, pcs = key
    mesh = _MESHES[mesh_key]
    dtype = jnp.dtype(dtype_name)

    def f(image):
        if true_w and image.shape[-1] != true_w:
            # input was padded on host so device_put could shard W evenly
            image = image[..., :true_w]
        image = image.astype(dtype)
        if color_model is not None:
            image = jax_models.convert(image, "RGB", color_model)
        arr, ll_h, ll_w = sharded_wavedec2_packed(
            image, wavelet, mode, level, mesh, axis_name
        )
        if pcs is not None:
            mults = jnp.asarray(pcs, dtype=dtype)[..., :, None, None]
            arr = arr * mults
        arr = (arr * jnp.asarray(qscale, dtype=dtype)).astype(jnp.int32)
        overflow = (jnp.abs(arr) > 32767).any()
        arr16 = jnp.clip(arr, -32767, 32767).astype(jnp.int16)
        return arr, arr16, overflow

    return jax.jit(f)


# jit cache keys must be hashable; Mesh isn't — keep a registry
_MESHES = {}


def _mesh_key(mesh: Mesh) -> Tuple:
    key = (tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat))
    _MESHES[key] = mesh
    return key


def encode_image_sharded(
    image: np.ndarray,
    settings: SpihtSettings,
    mesh: Mesh,
    level: Optional[int] = None,
    max_bits: Optional[int] = None,
    axis_name: str = "tile",
) -> EncodingResult:
    """Encode one (C, H, W) image with its W axis sharded over the mesh.

    Any width: the recursive sharded DWT pads to equal blocks internally
    and shards every level whose geometry permits (parallel/spatial.py).
    The (C, H, W) input itself must still be placeable with W over the
    mesh axis, so the initial device_put pads W to the axis size if
    needed (handled here).
    """
    image = np.asarray(image)
    if image.ndim != 3:
        raise ValueError("image must be (c, h, w)")
    c, h, w = image.shape
    wav = build_wavelet(settings.wavelet)
    lv = level
    if lv is None:
        lv = min(dwt_max_level(h, wav.dec_len), dwt_max_level(w, wav.dec_len))
    slices, _, _ = get_slices_and_h_w(h, w, settings, level)
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop

    fn = _sharded_forward_jit(
        jax_transform._settings_key(settings),
        lv,
        _mesh_key(mesh),
        axis_name,
        str(np.dtype(jax_transform.default_dtype()).name),
        true_w=w,
    )
    n_ax = mesh.shape[axis_name]
    if w % n_ax:
        image = np.pad(image, [(0, 0), (0, 0), (0, n_ax - w % n_ax)])
    in_sharding = NamedSharding(mesh, P(None, None, axis_name))
    xs = jax.device_put(jnp.asarray(image), in_sharding)
    arr32, arr16, overflow = fn(xs)
    if bool(overflow):
        arr = np.asarray(arr32)
    else:
        arr = np.asarray(arr16).astype(np.int32)

    if max_bits is None:
        max_bits = codec_api._MAX_BITS_DEFAULT
    data, max_n = codec_api.encode(arr, ll_h, ll_w, max_bits)
    return EncodingResult(data, h, w, c, int(max_n), level)
