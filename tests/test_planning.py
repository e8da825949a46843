"""Device-side stream planner vs instrumented oracle: the validation gate
for DESIGN_DEVICE_SCHEDULER.md step 1 (event planes are closed-form)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spiht_tpu.codec import maps as jmaps
from spiht_tpu.codec import oracle
from spiht_tpu.codec.planning import bits_per_plane_from_maps, plan_supported


def _check(arr, ll_h, ll_w):
    from spiht_tpu.codec.planning import bits_per_plane_from_maps_np

    counts = {}
    bits, max_n = oracle.encode_bits(arr, ll_h, ll_w, 10**9, plane_counts=counts)
    m, d, g = jmaps.significance_maps(jnp.asarray(arr), ll_h, ll_w)
    planned = np.asarray(
        bits_per_plane_from_maps(m, d, g, ll_h, ll_w, max_n)
    )
    want = np.zeros_like(planned)
    for n, cnt in counts.items():
        want[n] = cnt
    np.testing.assert_array_equal(planned, want)
    assert planned.sum() == len(bits)
    # numpy twin agrees with the jnp version
    planned_np = bits_per_plane_from_maps_np(
        np.asarray(m), np.asarray(d), np.asarray(g), ll_h, ll_w, max_n
    )
    np.testing.assert_array_equal(planned_np, planned)


@pytest.mark.parametrize(
    "shape,ll",
    [
        ((1, 16, 16), (4, 4)),
        ((3, 24, 32), (6, 8)),
        ((2, 34, 18), (4, 2)),
        ((1, 37, 53), (8, 12)),
    ],
)
def test_planned_counts_match_oracle(rng, shape, ll):
    arr = (rng.standard_normal(shape) * rng.choice([5, 300, 4000])).astype(
        np.int32
    )
    _check(arr, *ll)


@pytest.mark.slow
def test_planned_counts_random_geometries():
    rng = np.random.default_rng(31337)
    for _ in range(8):
        c = int(rng.integers(1, 4))
        ll_h = 2 * int(rng.integers(1, 4))
        ll_w = 2 * int(rng.integers(1, 4))
        h, w = ll_h, ll_w
        for _ in range(int(rng.integers(1, 4))):
            h = 2 * h + int(rng.integers(0, 2))
            w = 2 * w + int(rng.integers(0, 2))
        if ll_h < 2 or ll_w < 2:
            continue
        arr = (rng.standard_normal((c, h, w)) * 200).astype(np.int32)
        _check(arr, ll_h, ll_w)


def test_planned_counts_sparse_and_zero(rng):
    arr = np.zeros((1, 16, 16), dtype=np.int32)
    _check(arr, 4, 4)
    arr[0, 3, 9] = 1000  # single significant coefficient
    _check(arr, 4, 4)


def test_cut_plane_matches_encoder(rng):
    from spiht_tpu.codec.planning import cut_plane
    from spiht_tpu.ops.bitpack import bits_to_bytes

    arr = (rng.standard_normal((2, 24, 32)) * 300).astype(np.int32)
    counts = {}
    bits, max_n = oracle.encode_bits(arr, 6, 8, 10**9, plane_counts=counts)
    m, d, g = jmaps.significance_maps(jnp.asarray(arr), 6, 8)
    planned = bits_per_plane_from_maps(m, d, g, 6, 8, max_n)
    for budget in (1, 100, len(bits) // 3, len(bits), len(bits) + 50):
        plane, before = cut_plane(planned, max_n, budget)
        plane, before = int(plane), int(before)
        if budget > len(bits):
            assert plane == -1 and before == len(bits)
            continue
        # simulate: walk planes max_n..0 accumulating oracle counts
        acc = 0
        expect_plane = None
        for n in range(max_n, -1, -1):
            nxt = acc + counts.get(n, 0)
            if acc < budget <= nxt:
                expect_plane = n
                break
            acc = nxt
        assert plane == expect_plane
        assert before == acc


def test_plan_image_end_to_end(rng, monkeypatch):
    """plan_image's total equals the real encoder's full stream length."""
    import spiht_tpu
    from spiht_tpu import SpihtSettings, transform
    from spiht_tpu.codec.planning import plan_image

    monkeypatch.setattr(transform, "_BACKEND", "native")
    s = SpihtSettings()
    im = rng.random((3, 64, 64))
    plan = plan_image(im, s, level=3, max_bits=5000)
    er = spiht_tpu.encode_image(im, s, level=3)  # full stream
    total_bits = len(er.encoded_bytes) * 8
    # full stream is byte-padded; the plan is exact in bits
    assert plan["total_bits"] <= total_bits < plan["total_bits"] + 8
    assert plan["max_n"] == er.max_n
    assert 0 <= plan["cut_plane"] <= plan["max_n"]
    assert plan["bits_before_cut"] < 5000 <= (
        plan["bits_before_cut"] + plan["bits_per_plane"][plan["cut_plane"]]
    )


def test_plan_supported():
    assert plan_supported(4, 4)
    assert not plan_supported(3, 4)


def test_planner_rejects_odd_ll(rng):
    arr = (rng.standard_normal((1, 12, 12)) * 100).astype(np.int32)
    m, d, g = jmaps.significance_maps(jnp.asarray(arr), 3, 3)
    with pytest.raises(ValueError):
        bits_per_plane_from_maps(m, d, g, 3, 3, 6)
