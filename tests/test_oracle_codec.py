"""Oracle SPIHT codec tests, mirroring the reference core test strategy
(SURVEY.md §4: src/encoder_decoder.rs:845-1025)."""

import numpy as np
import pytest

from spiht_tpu.codec import oracle
from spiht_tpu.ops.bitpack import bits_to_bytes, bytes_to_bits


def test_max_n_constant():
    arr = np.full((1, 16, 16), 32, dtype=np.int32)
    bits, max_n = oracle.encode_bits(arr, 2, 2, 10000)
    assert max_n == 5


def test_max_n_f32_semantics():
    # (max as f32).log2() truncates; log2f(2**24 - 1) rounds UP to 24.0
    arr = np.zeros((1, 4, 4), np.int32)
    arr[0, 0, 0] = 2**24 - 1
    assert oracle.compute_max_n(arr) == 24
    arr[0, 0, 0] = 2**24 - 2**5
    assert oracle.compute_max_n(arr) == 23
    assert oracle.compute_max_n(np.zeros((1, 4, 4), np.int32)) == 0


def test_simple_roundtrip():
    arr = np.full((1, 16, 16), 32, dtype=np.int32)
    bits, max_n = oracle.encode_bits(arr, 2, 2, 10000)
    rec = oracle.decode_bits(bits, max_n, 1, 16, 16, 2, 2)
    assert np.array_equal(arr, rec)


def test_roundtrip_negative():
    arr = np.full((1, 16, 16), 32, dtype=np.int32)
    arr[:, 1::2, :] *= -1
    bits, max_n = oracle.encode_bits(arr, 2, 2, 10000)
    rec = oracle.decode_bits(bits, max_n, 1, 16, 16, 2, 2)
    assert np.array_equal(arr, rec)


@pytest.mark.parametrize("c,h,w,reps", [(1, 8, 8, 6), (4, 32, 32, 2), (3, 24, 40, 2)])
def test_roundtrip_random(rng, c, h, w, reps):
    for _ in range(reps):
        arr = rng.normal(0, 16, size=(c, h, w)).astype(np.int32)
        bits, max_n = oracle.encode_bits(arr, 2, 2, 10_000_000)
        rec = oracle.decode_bits(bits, max_n, c, h, w, 2, 2)
        assert np.array_equal(arr, rec)


def test_roundtrip_nonsquare_odd(rng):
    """Odd dims exercise the all-or-nothing offspring bounds rule.

    Geometry holes mean exactness holds on the coverage mask only (the
    reference shares this artifact: test_rust.py:52-55)."""
    arr = rng.normal(0, 16, size=(1, 13, 21)).astype(np.int32)
    bits, max_n = oracle.encode_bits(arr, 3, 5, 10_000_000)
    rec = oracle.decode_bits(bits, max_n, 1, 13, 21, 3, 5)
    mask = oracle.coverage_mask(13, 21, 3, 5)
    assert np.array_equal(arr[:, mask], rec[:, mask])
    assert (rec[:, ~mask] == 0).all()
    assert mask.mean() > 0.5  # most cells are covered


def test_embedded_prefix_property(rng):
    arr = rng.normal(0, 100, size=(1, 32, 32)).astype(np.int32)
    bits, max_n = oracle.encode_bits(arr, 2, 2, 10_000_000)
    prev = None
    for frac in [0.05, 0.2, 0.5, 1.0]:
        nb = int(len(bits) * frac)
        rec = oracle.decode_bits(bits[:nb], max_n, 1, 32, 32, 2, 2)
        err = float(np.abs(arr.astype(np.int64) - rec).mean())
        if prev is not None:
            assert err <= prev + 1e-9
        prev = err
    assert prev == 0.0


def test_exact_max_bits_cut(rng):
    arr = rng.normal(0, 100, size=(1, 16, 16)).astype(np.int32)
    bits, _ = oracle.encode_bits(arr, 2, 2, 137)
    assert len(bits) == 137


def test_decode_tolerates_byte_padding(rng):
    """Decoder must consume final-byte pad zeros as insignificance bits."""
    arr = rng.normal(0, 60, size=(1, 16, 16)).astype(np.int32)
    bits, max_n = oracle.encode_bits(arr, 2, 2, 10_000_000)
    data = bits_to_bytes(bits)
    bits2 = bytes_to_bits(data)  # length rounded up to a byte multiple
    assert len(bits2) >= len(bits)
    rec = oracle.decode_bits(bits2, max_n, 1, 16, 16, 2, 2)
    assert np.array_equal(arr, rec)


def _basic_slices(level, h, w, ll_h, ll_w):
    other = []
    hs, ws = ll_h, ll_w
    for _ in range(level):
        other.append(
            [
                [(hs, hs * 2), (0, ws)],      # da (bottom-left)
                [(0, hs), (ws, ws * 2)],      # ad (top-right)
                [(hs, hs * 2), (ws, ws * 2)],  # dd
            ]
        )
        hs, ws = hs * 2, ws * 2
    return ([(0, ll_h), (0, ll_w)], other)


def test_metadata_matches_plain_decode(rng):
    arr = rng.normal(0, 16, size=(2, 16, 16)).astype(np.int32)
    bits, max_n = oracle.encode_bits(arr, 2, 2, 10_000_000)
    slices = _basic_slices(3, 16, 16, 2, 2)
    rec1 = oracle.decode_bits(bits, max_n, 2, 16, 16, 2, 2)
    rec2, meta = oracle.decode_bits_with_metadata(bits, max_n, 2, 16, 16, 2, 2, slices)
    assert np.array_equal(rec1, rec2)
    assert meta.shape == (len(bits) + 1, 8)
    # action ids are 0..6
    assert set(np.unique(meta[:, 0])).issubset(set(range(7)))
    # filters are 0..3
    assert set(np.unique(meta[:, 4])).issubset({0, 1, 2, 3})
    # n column is non-increasing
    assert (np.diff(meta[1:, 6]) <= 0).all()
    # local positions within +-100000
    assert np.abs(meta[:, 1:3]).max() <= 100_000


def test_set_bit_preserves_sign(rng):
    for _ in range(200):
        x = int(rng.integers(-(2**30), 2**30))
        n = int(rng.integers(0, 16))
        bit = bool(rng.integers(0, 2))
        y = oracle._set_bit(x, n, bit)
        assert (x >= 0) == (y >= 0)
        assert oracle._is_bit_set(y, n) == bit
