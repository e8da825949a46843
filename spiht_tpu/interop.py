"""Framework interop: torch / JAX / numpy bridges.

The reference's tooling is torch-adjacent (make_gif.py:1-20 feeds decoded
frames through torch/torchvision), so migrating users typically hold
`torch.Tensor` images. Every high-level API in this package already
accepts anything `np.asarray` understands (CPU torch tensors included);
this module adds the explicit, zero-copy bridges for the on-device
pipelines:

- `as_numpy_image`: torch/JAX/numpy -> (C,H,W) float numpy, no copy when
  the memory is already host-resident and contiguous.
- `jax_to_torch` / `torch_to_jax`: DLPack hand-off. Zero-copy when both
  frameworks address the same device memory (CPU<->CPU here; on a real
  TPU host, torch-XLA tensors share HBM the same way).

Serving shape: `decode_image_device(...)` leaves a uint8 image in HBM as
a JAX array; `jax_to_torch` hands exactly that buffer to the consuming
model when torch can address it, and falls back to one host copy when it
cannot (e.g. CPU torch next to a tunneled TPU).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "as_numpy_image",
    "jax_to_torch",
    "torch_to_jax",
]


def _is_torch(x) -> bool:
    mod = type(x).__module__
    return mod == "torch" or mod.startswith("torch.")


def _is_jax(x) -> bool:
    mod = type(x).__module__
    return mod.startswith("jax")


def as_numpy_image(image) -> np.ndarray:
    """Any (C,H,W) image-like (numpy / torch.Tensor / jax.Array) -> numpy.

    Zero-copy when the buffer is already host memory; detaches torch
    tensors from autograd and moves them off-device if needed.
    """
    if _is_torch(image):
        image = image.detach()
        if image.device.type != "cpu":
            image = image.cpu()
        return image.numpy()
    return np.asarray(image)


def torch_to_jax(tensor):
    """torch.Tensor -> jax.Array via DLPack (zero-copy on shared memory).

    Falls back to a host round-trip for tensors DLPack cannot export
    (non-contiguous, or device combinations with no common address
    space).
    """
    import jax

    try:
        return jax.dlpack.from_dlpack(tensor)
    except Exception:
        return jax.numpy.asarray(as_numpy_image(tensor))


def jax_to_torch(array):
    """jax.Array -> torch.Tensor via DLPack (zero-copy on shared memory).

    The intended consumer of `decode_image_device` outputs: on a real TPU
    host with torch-XLA the HBM buffer is shared; with CPU-only torch the
    fallback is one device-to-host copy.
    """
    import torch

    try:
        return torch.from_dlpack(array)
    except Exception:
        return torch.from_numpy(np.asarray(array))
