"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/mesh code paths execute
without TPU hardware. Must be set before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


REF_IMAGES = "/root/reference/images"


@pytest.fixture(scope="session")
def ref_image_paths():
    import glob
    import os.path

    if not os.path.isdir(REF_IMAGES):
        pytest.skip("reference image corpus not available")
    paths = sorted(glob.glob(os.path.join(REF_IMAGES, "*.jpg")))
    if not paths:
        pytest.skip("reference image corpus empty")
    return paths
