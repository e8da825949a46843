"""Device-mesh helpers for the codec's parallel paths.

The framework's two parallel axes (SURVEY.md §2, new-components table):
  * "batch" — data parallelism: independent images per device slice.
  * "tile"  — spatial parallelism: one image's W axis sharded, with DWT
    halo exchange over ICI (parallel/spatial.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "image_sharding"]


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("batch", "tile"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2D (batch, tile) mesh over the available devices.

    shape=None picks (n_devices, 1) — pure data parallelism; pass e.g.
    (2, 4) to dedicate 4-way spatial sharding within each DP group.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    dp, sp = shape
    if dp * sp > len(devices):
        raise ValueError(f"mesh {shape} needs {dp*sp} devices, have {len(devices)}")
    arr = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (B, C, H, W) image batch: B over 'batch'."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (B, C, H, W) batch with W over 'tile' as well."""
    a0, a1 = mesh.axis_names
    return NamedSharding(mesh, P(a0, None, None, a1))
