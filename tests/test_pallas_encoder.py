"""Pallas sequential SPIHT encoder vs the native kernel: byte-identical
streams including mid-symbol max_bits cuts, on CPU via interpret mode
(hardware validation lives in device_bench's lanes).

Reference semantics: /root/reference/src/encoder_decoder.rs:155-303.
"""

import numpy as np
import pytest

from spiht_tpu.codec.pallas_encoder import pallas_encode
from spiht_tpu.native import runtime

pytestmark = pytest.mark.skipif(
    runtime.load() is None, reason="native kernel unavailable"
)


@pytest.mark.parametrize("machine", ["hybrid", "seq"])
@pytest.mark.parametrize(
    "shape,ll",
    [
        ((1, 16, 16), (4, 4)),
        ((3, 24, 32), (6, 8)),
        ((2, 34, 18), (4, 2)),
        ((1, 19, 19), (5, 5)),  # odd LL: no even-LL fallback needed
        ((2, 21, 13), (3, 2)),
    ],
)
def test_pallas_encoder_full_stream(rng, shape, ll, machine):
    nat = runtime.load()
    arr = (rng.standard_normal(shape) * rng.choice([7, 400, 3000])).astype(
        np.int32
    )
    want, wmn = nat.encode(arr, *ll, 2**31 - 2)
    got, gmn = pallas_encode(arr, *ll, interpret=True, machine=machine)
    assert gmn == wmn
    assert got == want


@pytest.mark.parametrize("machine", ["hybrid", "seq"])
@pytest.mark.parametrize(
    "shape,ll",
    [
        ((3, 24, 24), (6, 6)),
        ((1, 19, 19), (5, 5)),  # odd LL: duplicate-parent mid-symbol cuts
    ],
)
def test_pallas_encoder_budget_cuts(rng, shape, ll, machine):
    """max_bits stops mid-symbol exactly like the reference."""
    nat = runtime.load()
    arr = (rng.standard_normal(shape) * 2000).astype(np.int32)
    for mb in (1, 2, 64, 333, 1000, 2897):
        want, wmn = nat.encode(arr, *ll, mb)
        got, gmn = pallas_encode(arr, *ll, mb, interpret=True,
                                 machine=machine)
        assert gmn == wmn and got == want, f"mb={mb}"


def test_pallas_encoder_roundtrip_with_pallas_decoder(rng):
    from spiht_tpu.codec.pallas_decoder import pallas_decode

    arr = (rng.standard_normal((2, 16, 16)) * 500).astype(np.int32)
    data, mn = pallas_encode(arr, 4, 4, interpret=True)
    rec = pallas_decode(data, mn, 2, 16, 16, 4, 4, interpret=True)
    # full-stream round trip reconstructs the array exactly on the
    # tree-covered support (reference contract)
    nat = runtime.load()
    want = nat.decode(data, mn, 2, 16, 16, 4, 4)
    np.testing.assert_array_equal(rec, want)


def test_pallas_encoder_extreme_magnitudes():
    nat = runtime.load()
    arr = np.zeros((1, 16, 16), np.int32)
    arr[0, 3, 5] = 2**22
    arr[0, 9, 12] = -(2**22 - 1)
    arr[0, 0, 0] = 1
    want, wmn = nat.encode(arr, 4, 4, 2**31 - 2)
    got, gmn = pallas_encode(arr, 4, 4, interpret=True)
    assert gmn == wmn and got == want


def test_pallas_encoder_constant_array():
    nat = runtime.load()
    arr = np.full((1, 16, 16), 42, np.int32)
    want, wmn = nat.encode(arr, 4, 4, 2**31 - 2)
    got, gmn = pallas_encode(arr, 4, 4, interpret=True)
    assert gmn == wmn == 5
    assert got == want
