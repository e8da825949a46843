"""Randomized cross-checks: native kernel vs the pure-Python oracle.

The oracle is an independent expression of the bitstream contract
(SURVEY.md §3); any divergence between it and the fast paths on random
inputs is a correctness bug. Seeds are fixed — deterministic CI.
"""

import numpy as np
import pytest

from spiht_tpu.codec import oracle
from spiht_tpu.native import runtime
from spiht_tpu.ops.bitpack import bits_to_bytes, bytes_to_bits

pytestmark = pytest.mark.skipif(
    runtime.load() is None, reason="native kernel unavailable"
)


def _geometries(rng, n):
    for _ in range(n):
        c = int(rng.integers(1, 4))
        ll_h = int(rng.integers(2, 7))
        ll_w = int(rng.integers(2, 7))
        # grow like a packed pyramid: per level sizes roughly double
        levels = int(rng.integers(1, 4))
        h, w = ll_h, ll_w
        for _ in range(levels):
            h = 2 * h + int(rng.integers(0, 2))
            w = 2 * w + int(rng.integers(0, 2))
        yield c, h, w, ll_h, ll_w


def test_fuzz_encode_bit_exact_vs_oracle():
    rng = np.random.default_rng(1234)
    nat = runtime.load()
    for c, h, w, ll_h, ll_w in _geometries(rng, 12):
        arr = (rng.standard_normal((c, h, w)) * rng.choice([4, 64, 2000])).astype(
            np.int32
        )
        max_bits = int(rng.integers(64, 4 * c * h * w))
        bits, max_n = oracle.encode_bits(arr, ll_h, ll_w, max_bits)
        data_o = bits_to_bytes(bits)
        data_n, max_n_n = nat.encode(arr, ll_h, ll_w, max_bits)
        assert max_n == max_n_n
        assert data_o == data_n, (c, h, w, ll_h, ll_w, max_bits)
        # recursive (reference-architecture) encoder agrees too
        data_r, _ = nat.encode(arr, ll_h, ll_w, max_bits, use_maps=False)
        assert data_r == data_n


def test_fuzz_decode_bit_exact_vs_oracle():
    rng = np.random.default_rng(99)
    nat = runtime.load()
    for c, h, w, ll_h, ll_w in _geometries(rng, 8):
        arr = (rng.standard_normal((c, h, w)) * 300).astype(np.int32)
        data, max_n = nat.encode(arr, ll_h, ll_w, 10**9)
        # truncate at a random byte: embedded-stream decode must agree
        cut = int(rng.integers(1, max(2, len(data))))
        rec_n = nat.decode(data[:cut], max_n, c, h, w, ll_h, ll_w)
        rec_o = oracle.decode_bits(
            bytes_to_bits(data[:cut]), max_n, c, h, w, ll_h, ll_w
        )
        np.testing.assert_array_equal(rec_n, rec_o)


def test_fuzz_full_stream_roundtrip_exact_on_coverage():
    rng = np.random.default_rng(7)
    nat = runtime.load()
    for c, h, w, ll_h, ll_w in _geometries(rng, 8):
        arr = (rng.standard_normal((c, h, w)) * 500).astype(np.int32)
        data, max_n = nat.encode(arr, ll_h, ll_w, 10**9)
        rec = nat.decode(data, max_n, c, h, w, ll_h, ll_w)
        mask = oracle.coverage_mask(h, w, ll_h, ll_w)
        np.testing.assert_array_equal(rec[:, mask], arr[:, mask])


def test_rejects_level0_geometry():
    """ll dims spanning the whole array (level-0 'pyramid') would index the
    LL parity children out of bounds; the kernel must reject, not UB."""
    nat = runtime.load()
    arr = np.ones((1, 8, 8), dtype=np.int32)
    with pytest.raises(ValueError):
        nat.encode(arr, 8, 8, 1000)
    with pytest.raises(ValueError):
        nat.encode(arr, 5, 5, 1000)  # 2*5 > 8
    with pytest.raises(ValueError):
        nat.decode(b"\x00" * 4, 3, 1, 8, 8, 8, 8)


def test_fuzz_extreme_values():
    nat = runtime.load()
    rng = np.random.default_rng(5)
    # magnitudes near int32 extremes and near power-of-two boundaries
    vals = np.array(
        [0, 1, -1, 2, 3, -3, (1 << 30) - 1, -(1 << 30), (1 << 24) - 1,
         1 << 24, -(1 << 24) - 1], dtype=np.int32,
    )
    arr = rng.choice(vals, size=(2, 16, 16)).astype(np.int32)
    bits, max_n = oracle.encode_bits(arr, 4, 4, 10**7)
    data_n, max_n_n = nat.encode(arr, 4, 4, 10**7)
    assert max_n == max_n_n
    assert bits_to_bytes(bits) == data_n
    rec = nat.decode(data_n, max_n, 2, 16, 16, 4, 4)
    mask = oracle.coverage_mask(16, 16, 4, 4)
    np.testing.assert_array_equal(rec[:, mask], arr[:, mask])
