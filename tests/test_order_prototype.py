"""Sort-based emission-order reconstruction vs the instrumented oracle:
the validation gate for DESIGN_DEVICE_SCHEDULER.md §2."""

import numpy as np
import pytest

from spiht_tpu.codec import oracle
from spiht_tpu.codec.order_prototype import predict_events
from spiht_tpu.native import runtime

pytestmark = pytest.mark.skipif(
    runtime.load() is None, reason="native kernel required for maps"
)


def _check(arr, ll_h, ll_w):
    got_events = []
    bits, max_n = oracle.encode_bits(
        arr, ll_h, ll_w, 10**9, events=got_events
    )
    pred = predict_events(arr, ll_h, ll_w, max_n)
    assert len(pred) == len(got_events), (len(pred), len(got_events))
    for a, b in zip(pred, got_events):
        assert tuple(int(v) for v in a) == tuple(int(v) for v in b)


@pytest.mark.parametrize(
    "shape,ll",
    [
        ((1, 16, 16), (4, 4)),
        ((2, 24, 32), (6, 8)),
        ((1, 34, 18), (4, 2)),
    ],
)
def test_order_matches_oracle(rng, shape, ll):
    arr = (rng.standard_normal(shape) * rng.choice([5, 300])).astype(np.int32)
    _check(arr, *ll)


def test_order_random_geometries():
    rng = np.random.default_rng(777)
    for _ in range(4):
        c = int(rng.integers(1, 3))
        ll_h = 2 * int(rng.integers(1, 3))
        ll_w = 2 * int(rng.integers(1, 3))
        h, w = ll_h, ll_w
        for _ in range(int(rng.integers(1, 4))):
            h = 2 * h + int(rng.integers(0, 2))
            w = 2 * w + int(rng.integers(0, 2))
        arr = (rng.standard_normal((c, h, w)) * 100).astype(np.int32)
        _check(arr, ll_h, ll_w)


def test_predicted_bitstream_is_exact(rng):
    """predict_bits == the oracle's stream, including a max_bits prefix."""
    from spiht_tpu.codec.order_prototype import predict_bits

    arr = (rng.standard_normal((2, 24, 32)) * 300).astype(np.int32)
    bits, max_n = oracle.encode_bits(arr, 6, 8, 10**9)
    pred = predict_bits(arr, 6, 8, max_n)
    assert [bool(b) for b in pred] == [bool(b) for b in bits]
    # truncated stream = prefix
    cut_bits, _ = oracle.encode_bits(arr, 6, 8, 1000)
    assert [bool(b) for b in pred[:1000]] == [bool(b) for b in cut_bits]


def test_pathkey_order_identical(rng):
    """Single-sort-per-plane path keys == per-depth BFS == oracle."""
    from spiht_tpu.codec.order_prototype import predict_events_pathkey

    for _ in range(3):
        c = int(rng.integers(1, 3))
        ll_h = 2 * int(rng.integers(1, 4))
        ll_w = 2 * int(rng.integers(1, 4))
        h, w = ll_h, ll_w
        for _ in range(int(rng.integers(1, 4))):
            h = 2 * h + int(rng.integers(0, 2))
            w = 2 * w + int(rng.integers(0, 2))
        arr = (rng.standard_normal((c, h, w)) * 200).astype(np.int32)
        ev = []
        bits, max_n = oracle.encode_bits(arr, ll_h, ll_w, 10**9, events=ev)
        pk = predict_events_pathkey(arr, ll_h, ll_w, max_n)
        assert len(pk) == len(ev)
        for a, b in zip(pk, ev):
            assert tuple(int(v) for v in a) == tuple(int(v) for v in b)


def test_order_sparse(rng):
    arr = np.zeros((1, 16, 16), dtype=np.int32)
    arr[0, 9, 3] = -777
    arr[0, 1, 1] = 12
    _check(arr, 4, 4)
