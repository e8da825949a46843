"""Native C++ kernel vs the pure-Python oracle: bit-exact equivalence."""

import numpy as np
import pytest

from spiht_tpu.codec import oracle
from spiht_tpu.native import runtime
from spiht_tpu.ops.bitpack import bits_to_bytes, bytes_to_bits


@pytest.fixture(scope="module")
def kernel():
    k = runtime.load()
    if k is None:
        pytest.skip("native kernel unavailable")
    return k


SHAPES = [
    (1, 8, 8, 2, 2),
    (4, 32, 32, 2, 2),
    (3, 24, 40, 3, 5),
    (1, 13, 21, 3, 5),
    (2, 33, 67, 5, 9),
]


@pytest.mark.parametrize("c,h,w,llh,llw", SHAPES)
@pytest.mark.parametrize("use_maps", [True, False])
def test_encode_bit_exact_vs_oracle(rng, kernel, c, h, w, llh, llw, use_maps):
    for _ in range(2):
        arr = rng.normal(0, 30, size=(c, h, w)).astype(np.int32)
        bits, mn0 = oracle.encode_bits(arr, llh, llw, 10_000_000)
        data, mn = kernel.encode(arr, llh, llw, 2**62, use_maps=use_maps)
        assert mn == mn0
        assert data == bits_to_bytes(bits)


@pytest.mark.parametrize("c,h,w,llh,llw", SHAPES)
def test_decode_matches_oracle(rng, kernel, c, h, w, llh, llw):
    arr = rng.normal(0, 30, size=(c, h, w)).astype(np.int32)
    data, mn = kernel.encode(arr, llh, llw, 2**62)
    rec_n = kernel.decode(data, mn, c, h, w, llh, llw)
    rec_o = oracle.decode_bits(bytes_to_bits(data), mn, c, h, w, llh, llw)
    assert np.array_equal(rec_n, rec_o)


def test_truncated_stream_bit_exact(rng, kernel):
    arr = rng.normal(0, 100, size=(1, 32, 32)).astype(np.int32)
    for max_bits in [1, 7, 137, 777, 4096]:
        bits, mn0 = oracle.encode_bits(arr, 2, 2, max_bits)
        data, mn = kernel.encode(arr, 2, 2, max_bits)
        assert data == bits_to_bytes(bits) and mn == mn0
        # decode the truncated stream on both paths
        rec_n = kernel.decode(data, mn, 1, 32, 32, 2, 2)
        rec_o = oracle.decode_bits(bytes_to_bits(data), mn, 1, 32, 32, 2, 2)
        assert np.array_equal(rec_n, rec_o)


def test_roundtrip_dyadic_exact(rng, kernel):
    arr = rng.normal(0, 16, size=(4, 32, 32)).astype(np.int32)
    data, mn = kernel.encode(arr, 2, 2, 2**62)
    rec = kernel.decode(data, mn, 4, 32, 32, 2, 2)
    assert np.array_equal(arr, rec)


def _wire_slices(level, ll):
    other = []
    hs = ll
    for _ in range(level):
        other.append(
            [
                [(hs, hs * 2), (0, hs)],
                [(0, hs), (hs, hs * 2)],
                [(hs, hs * 2), (hs, hs * 2)],
            ]
        )
        hs *= 2
    return [(0, ll), (0, ll)], other


def test_metadata_bit_exact_vs_oracle(rng, kernel):
    arr = rng.normal(0, 16, size=(2, 16, 16)).astype(np.int32)
    data, mn = kernel.encode(arr, 2, 2, 2**62)
    top, other = _wire_slices(3, 2)
    rec_n, meta_n = kernel.decode_with_metadata(data, mn, 2, 16, 16, 2, 2, top, other)
    rec_o, meta_o = oracle.decode_bits_with_metadata(
        bytes_to_bits(data), mn, 2, 16, 16, 2, 2, (top, other)
    )
    assert np.array_equal(rec_n, rec_o)
    assert np.array_equal(meta_n, meta_o)


def test_compute_maps_match_recursive_defs(rng, kernel):
    """D/G maps must agree with the oracle's recursive significance tests."""
    c, h, w, llh, llw = 1, 16, 16, 2, 2
    arr = rng.normal(0, 40, size=(c, h, w)).astype(np.int32)
    M, D, G = kernel.compute_maps(arr, llh, llw)
    for n in range(0, 8):
        for i in range(h):
            for j in range(w):
                off = oracle._offspring(i, j, h, w, llh, llw)
                desc = False
                if off:
                    desc = any(
                        oracle._set_sig(arr, 0, l, m, n, h, w, llh, llw)
                        for l, m in off
                    )
                assert (D[0, i, j] >= n) == desc, (n, i, j)
                lsig = oracle._l_sig(arr, 0, i, j, n, h, w, llh, llw)
                assert (G[0, i, j] >= n) == lsig, (n, i, j)


def test_api_dispatches_to_native(rng):
    """The public API must produce identical bytes with and without native."""
    import os

    import spiht_tpu
    from spiht_tpu.codec import api

    arr = rng.normal(0, 30, size=(2, 32, 32)).astype(np.int32)
    data_native, mn1 = api.encode(arr, 2, 2, 100000)
    bits, mn2 = oracle.encode_bits(arr, 2, 2, 100000)
    assert data_native == bits_to_bytes(bits) and mn1 == mn2
