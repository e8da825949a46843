"""Pallas fused quantize/compact/M kernel vs plain XLA ops.

Runs in interpreter mode on CPU (compiled mode requires a real TPU
runtime; see ops/pallas_kernels.py docstring).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spiht_tpu.ops.pallas_kernels import quantize_compact_m


@pytest.mark.parametrize("shape", [(3, 70, 130), (1, 256, 512), (2, 5, 31)])
@pytest.mark.parametrize("spread", [100.0, 900.0])
def test_fused_kernel_matches_xla(rng, shape, spread):
    x = (rng.standard_normal(shape) * spread).astype(np.float32)
    arr, a16, m, ofl = quantize_compact_m(jnp.asarray(x), 50.0, interpret=True)
    ref = (x * np.float32(50.0)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(arr), ref)
    np.testing.assert_array_equal(
        np.asarray(a16), np.clip(ref, -32767, 32767).astype(np.int16)
    )
    absref = np.abs(ref.astype(np.int64))
    mref = np.where(
        ref == 0, -1, np.floor(np.log2(np.maximum(absref, 1)))
    ).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(m), mref)
    assert bool(ofl) == bool((absref > 32767).any())


def test_fused_kernel_zero_input():
    x = jnp.zeros((1, 8, 16), dtype=jnp.float32)
    arr, a16, m, ofl = quantize_compact_m(x, 50.0, interpret=True)
    assert int(np.asarray(arr).max()) == 0
    assert int(np.asarray(m).max()) == -1
    assert not bool(ofl)
