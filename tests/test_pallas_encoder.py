"""Pallas sequential SPIHT encoder vs the native kernel: byte-identical
streams including mid-symbol max_bits cuts, on CPU via interpret mode
(hardware validation lives in device_bench's lanes).

Reference semantics: /root/reference/src/encoder_decoder.rs:155-303.
"""

import os

import numpy as np
import pytest

from spiht_tpu.codec.pallas_encoder import pallas_encode
from spiht_tpu.native import runtime

pytestmark = pytest.mark.skipif(
    runtime.load() is None, reason="native kernel unavailable"
)


@pytest.mark.parametrize("machine",
                         ["hybrid", "seq", "compact", "compact_hbm"])
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


@pytest.mark.parametrize("machine",
                         ["hybrid", "seq", "compact", "compact_hbm"])
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


def _ilv_batch(arrs, ll, mbs, machine=None):
    """Force the interleaved route (raises if it cannot run)."""
    import os

    from spiht_tpu.codec.pallas_encoder import pallas_encode_batch

    old = os.environ.get("SPIHT_TPU_PALLAS_ENC_BATCH")
    os.environ["SPIHT_TPU_PALLAS_ENC_BATCH"] = "ilv"
    try:
        return pallas_encode_batch(arrs, *ll, mbs, interpret=True,
                                   machine=machine)
    finally:
        if old is None:
            del os.environ["SPIHT_TPU_PALLAS_ENC_BATCH"]
        else:
            os.environ["SPIHT_TPU_PALLAS_ENC_BATCH"] = old


@pytest.mark.parametrize("machine", [None, "compact"])
@pytest.mark.parametrize(
    "shape,ll,B",
    [
        ((1, 16, 16), (4, 4), 2),
        ((3, 24, 32), (6, 8), 3),
        ((1, 19, 19), (5, 5), 4),  # odd LL duplicate parents
        ((2, 21, 13), (3, 2), 2),
    ],
)
def test_interleaved_encoder_full_stream(rng, shape, ll, B, machine):
    """The B-chain interleaved machine is byte-identical per lane."""
    nat = runtime.load()
    arrs = np.stack([
        (rng.standard_normal(shape) * s).astype(np.int32)
        for s in rng.choice([7, 400, 3000], B)
    ])
    want = [nat.encode(arrs[b], *ll, 2**31 - 2) for b in range(B)]
    got = _ilv_batch(arrs, ll, 2**31 - 2, machine=machine)
    for b in range(B):
        assert got[b][1] == want[b][1], b
        assert got[b][0] == want[b][0], b


@pytest.mark.parametrize("machine", [None, "compact"])
def test_interleaved_encoder_heterogeneous_budgets_and_planes(
    rng, machine
):
    """Chains with different max_n (plane counts) and different
    max_bits cut mid-symbol independently; a zero image is legal."""
    nat = runtime.load()
    shape, ll = (3, 24, 24), (6, 6)
    scales = [1, 60, 12000, 3]
    arrs = np.stack([
        (rng.standard_normal(shape) * s).astype(np.int32)
        for s in scales
    ])
    arrs[3] = 0
    mbs = [1, 333, 2897, 500]
    want = [nat.encode(arrs[b], *ll, mbs[b]) for b in range(4)]
    got = _ilv_batch(arrs, ll, mbs, machine=machine)
    for b in range(4):
        assert got[b][1] == want[b][1], b
        assert got[b][0] == want[b][0], (b, mbs[b])


@pytest.mark.parametrize("machine", [None, "compact"])
def test_interleaved_odd_ll_budget_cuts(rng, machine):
    nat = runtime.load()
    shape, ll = (1, 19, 19), (5, 5)
    arrs = np.stack([
        (rng.standard_normal(shape) * s).astype(np.int32)
        for s in [3000, 7, 900]
    ])
    mbs = [13, 222, 2**31 - 2]
    want = [nat.encode(arrs[b], *ll, mbs[b]) for b in range(3)]
    got = _ilv_batch(arrs, ll, mbs, machine=machine)
    for b in range(3):
        assert got[b][1] == want[b][1] and got[b][0] == want[b][0], b


def test_interleaved_compact_requires_small_magnitudes(rng):
    """machine='compact' on data with max_n > 15 refuses the route
    (MachineResourceLimit) instead of emitting wrong bits."""
    from spiht_tpu.codec.pallas_encoder import MachineResourceLimit

    arrs = np.zeros((2, 1, 16, 16), np.int32)
    arrs[:, 0, 3, 5] = 2**22  # max_n = 22 > 15
    with pytest.raises(MachineResourceLimit):
        _ilv_batch(arrs, (4, 4), 2**31 - 2, machine="compact")
    # the non-interleaved (lax.map) route must refuse too, not emit
    # silently corrupt streams via the 16-bit compact layout
    os.environ["SPIHT_TPU_PALLAS_ENC_BATCH"] = "map"
    try:
        with pytest.raises(MachineResourceLimit):
            from spiht_tpu.codec.pallas_encoder import pallas_encode_batch

            pallas_encode_batch(arrs, 4, 4, 2**31 - 2, machine="compact")
    finally:
        os.environ.pop("SPIHT_TPU_PALLAS_ENC_BATCH", None)


@pytest.mark.parametrize(
    "B,shape,ll",
    [
        (3, (1, 24, 24), (6, 6)),
        (2, (3, 19, 19), (5, 5)),   # odd LL: duplicate parents
        (4, (2, 34, 18), (4, 2)),
    ],
)
def test_interleaved_t1_hbm_exact(rng, B, shape, ll):
    """The ILV machine with HBM-resident combo tables (round-5
    2048^2/4096^2-class BATCHED tier): per-fire child-row DMAs started
    for ALL chains before any fire body runs; bit-exact incl.
    heterogeneous budgets and odd-LL geometries."""
    import jax.numpy as jnp

    from spiht_tpu.codec.oracle import compute_max_n
    from spiht_tpu.codec.pallas_encoder import (
        _cap_words_for, _interleaved_fn,
    )

    nat = runtime.load()
    arrs = np.stack([
        np.clip((rng.standard_normal(shape) * s).astype(np.int64),
                -50000, 50000).astype(np.int32)
        for s in [3000, 7, 900, 222][:B]
    ])
    mns = np.array([compute_max_n(a) for a in arrs], np.int32)
    mbs = np.array([13, 2**31 - 2, 444, 999][:B], np.int32)
    cw = _cap_words_for(*shape, int(mbs.max()))
    fn = _interleaved_fn(B, *shape, *ll, cw, True, compact=True,
                         t1_hbm=True)
    wds, tot, ovf = fn(
        jnp.asarray(arrs), jnp.asarray(mns), jnp.asarray(mbs)
    )
    wds, tot = np.asarray(wds), np.asarray(tot)
    assert not np.asarray(ovf).any()
    for b in range(B):
        want, wmn = nat.encode(arrs[b], *ll, int(mbs[b]))
        got = wds[b].view(np.uint8)[: (int(tot[b]) + 7) // 8].tobytes()
        assert wmn == int(mns[b]) and got == want, b


def test_interleaved_vmem_accounting():
    """The router only picks the interleaved machine when its exact
    state formula fits the budget."""
    from spiht_tpu.codec.pallas_encoder import (
        _cap_words_for, interleaved_fits, interleaved_vmem_bytes,
    )

    cw = _cap_words_for(3, 537, 537, 262144)
    vb = interleaved_vmem_bytes(8, 3, 537, 537, 12, 12, cw)
    assert 0 < vb <= 128 << 20  # the measured-on-hardware B=8 config
    assert interleaved_fits(8, 3, 537, 537, 12, 12, cw)
    # 2048-class geometry stays out (packed-entry bound)
    assert not interleaved_fits(2, 3, 2079, 2079, 17, 17, cw)
    # compact drops one N-table per chain + the shared geo table, so
    # it is strictly smaller and admits larger B at the same geometry
    vbc = interleaved_vmem_bytes(8, 3, 537, 537, 12, 12, cw,
                                 compact=True)
    assert vbc < vb
    assert interleaved_fits(16, 3, 537, 537, 12, 12, cw, compact=True)
    assert not interleaved_fits(8, 9, 537, 537, 12, 12, cw,
                                compact=True)  # cix needs c <= 8
