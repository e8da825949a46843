"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/mesh code paths execute
without TPU hardware, and with x64 enabled so transform exactness vs the
float64 numpy reference can be asserted.

NOTE: in the target environment a sitecustomize.py imports jax and
registers the TPU PJRT plugin before ANY user code runs, so setting
JAX_PLATFORMS / JAX_ENABLE_X64 via os.environ here is too late (jax
snapshots env-derived config at import). jax.config.update still works as
long as no backend has been initialized, and XLA_FLAGS is read at CPU
client creation — which also hasn't happened yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _bound_jit_mappings():
    """Shed jax's compiled executables before LLVM JIT mappings exhaust
    vm.max_map_count (default 65530).

    Every XLA-CPU compile adds memory mappings and the Pallas-heavy
    modules accumulate ~50k of them (measured), after which mmap
    failures SEGFAULT the compiler mid-run. jax.clear_caches() does
    unmap retired executables (verified: 2349 -> 571 maps), so clear
    once the count passes a threshold; within-test reuse is unaffected
    and cross-test recompiles only happen right after a shed.
    """
    yield
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            nmaps = sum(1 for _ in f)
    except OSError:
        return
    if nmaps > 30000:
        jax.clear_caches()


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
