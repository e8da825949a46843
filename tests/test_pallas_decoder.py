"""Pallas sequential SPIHT decoder vs the native kernel: bit-exact
reconstruction including byte-prefix truncation, on CPU via interpret
mode (hardware validation lives in device_bench's pallas lane).

Reference semantics: /root/reference/src/encoder_decoder.rs:307-454.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spiht_tpu.codec.device_decoder import _words_of
from spiht_tpu.codec.pallas_decoder import pallas_decode, pallas_decode_fn
from spiht_tpu.native import runtime

pytestmark = pytest.mark.skipif(
    runtime.load() is None, reason="native kernel unavailable"
)


def _encode(arr, ll_h, ll_w, max_bits=10**9):
    return runtime.load().encode(arr, ll_h, ll_w, max_bits)


@pytest.mark.parametrize(
    "shape,ll",
    [
        ((1, 16, 16), (4, 4)),
        ((3, 24, 32), (6, 8)),
        ((2, 34, 18), (4, 2)),
        ((1, 19, 19), (5, 5)),  # odd LL: duplicate-parent geometry
        ((2, 21, 13), (3, 2)),
    ],
)
def test_pallas_decoder_full_stream(rng, shape, ll):
    nat = runtime.load()
    arr = (rng.standard_normal(shape) * rng.choice([7, 400, 3000])).astype(
        np.int32
    )
    data, mn = _encode(arr, *ll)
    want = nat.decode(data, mn, *shape, *ll)
    got = pallas_decode(data, mn, *shape, *ll, interpret=True)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape,ll,seed", [
    ((2, 16, 16), (4, 4), 99),
    ((1, 19, 19), (5, 5), 7),
])
def test_pallas_decoder_truncation_fuzz(shape, ll, seed):
    """Sampled byte-prefixes decode identically (one compile: fixed
    cap_words, varying nbits)."""
    nat = runtime.load()
    arr = (
        np.random.default_rng(seed).standard_normal(shape) * 300
    ).astype(np.int32)
    data, mn = _encode(arr, *ll)
    cap = max((len(data) * 8 + 31) // 32, 1)
    fn = pallas_decode_fn(*shape, *ll, cap, True)
    step = max(len(data) // 40, 1)
    for nb in [0, 1, 2, 3, 5, *range(7, len(data) + 1, step), len(data)]:
        prefix = data[:nb]
        want = nat.decode(prefix, mn, *shape, *ll)
        words = jnp.asarray(_words_of(prefix, cap))
        got = np.asarray(fn(words, nb * 8, mn))
        np.testing.assert_array_equal(got, want, err_msg=f"nb={nb}")


def test_pallas_decoder_budget_cut_stream(rng):
    """Streams truncated by the ENCODER's max_bits decode identically."""
    nat = runtime.load()
    arr = (rng.standard_normal((3, 24, 24)) * 2000).astype(np.int32)
    for mb in (64, 333, 1000, 2897):
        data, mn = _encode(arr, 6, 6, mb)
        want = nat.decode(data, mn, 3, 24, 24, 6, 6)
        got = pallas_decode(data, mn, 3, 24, 24, 6, 6, interpret=True)
        np.testing.assert_array_equal(got, want, err_msg=f"mb={mb}")


def test_pallas_decoder_zero_stream():
    got = pallas_decode(b"", 5, 1, 16, 16, 4, 4, interpret=True)
    np.testing.assert_array_equal(got, np.zeros((1, 16, 16), np.int32))


def test_pallas_decoder_extreme_magnitudes(rng):
    arr = np.zeros((1, 16, 16), np.int32)
    arr[0, 3, 5] = 2**23 - 1
    arr[0, 9, 12] = -(2**23 - 1)
    arr[0, 0, 0] = 1
    data, mn = _encode(arr, 4, 4)
    nat = runtime.load()
    want = nat.decode(data, mn, 1, 16, 16, 4, 4)
    got = pallas_decode(data, mn, 1, 16, 16, 4, 4, interpret=True)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "shape,ll",
    [
        ((3, 24, 32), (6, 8)),
        ((2, 34, 18), (4, 2)),
        ((1, 40, 40), (4, 4)),
    ],
)
def test_pallas_decoder_hybrid_hbm(rng, shape, ll):
    """The HBM-geometry-table hybrid (round-5 4096^2-class decode
    admission) reconstructs bit-exactly, full stream and truncated."""
    nat = runtime.load()
    arr = (rng.standard_normal(shape) * 2000).astype(np.int32)
    data, mn = _encode(arr, *ll)
    for nb in (len(data), max(1, len(data) // 3)):
        d = data[:nb]
        want = nat.decode(d, mn, *shape, *ll)
        cap = max((nb * 8 + 31) // 32, 1)
        fn = pallas_decode_fn(*shape, *ll, cap, True,
                              machine="hybrid_hbm")
        got = np.asarray(fn(_words_of(d, cap), nb * 8, mn))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("machine", ["hybrid", "seq"])
def test_pallas_decoder_int16_shipping(rng, machine):
    """out_dtype='int16' (the narrowed d2h lane used when max_n <= 13)
    is value-identical to the int32 rec on both machines."""
    nat = runtime.load()
    arr = (rng.standard_normal((2, 24, 24)) * 900).astype(np.int32)
    data, mn = _encode(arr, 6, 6, 2000)
    assert mn <= 13
    cap = max((len(data) * 8 + 31) // 32, 1)
    want = nat.decode(data, mn, 2, 24, 24, 6, 6)
    fn = pallas_decode_fn(2, 24, 24, 6, 6, cap, True, machine,
                          out_dtype="int16")
    got = np.asarray(fn(jnp.asarray(_words_of(data, cap)), len(data) * 8,
                        mn))
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got.astype(np.int32), want)


def _ilv_decode_batch(datas, mns, shape, ll):
    """Force the interleaved route (raises if it cannot run)."""
    import os

    from spiht_tpu.codec.pallas_decoder import pallas_decode_batch

    old = os.environ.get("SPIHT_TPU_PALLAS_DEC_BATCH")
    os.environ["SPIHT_TPU_PALLAS_DEC_BATCH"] = "ilv"
    try:
        return pallas_decode_batch(datas, mns, *shape, *ll,
                                   interpret=True)
    finally:
        if old is None:
            del os.environ["SPIHT_TPU_PALLAS_DEC_BATCH"]
        else:
            os.environ["SPIHT_TPU_PALLAS_DEC_BATCH"] = old


@pytest.mark.parametrize(
    "shape,ll,B",
    [
        ((1, 16, 16), (4, 4), 2),
        ((3, 24, 32), (6, 8), 3),
        ((2, 34, 18), (4, 2), 4),
    ],
)
def test_interleaved_decoder_exact(rng, shape, ll, B):
    """The B-chain interleaved machine reconstructs every lane exactly,
    including per-lane mid-symbol budget cuts."""
    nat = runtime.load()
    scales = rng.choice([7, 400, 3000, 12000], B)
    arrs = np.stack([
        (rng.standard_normal(shape) * s).astype(np.int32)
        for s in scales
    ])
    mbs = [2**31 - 2, 777, 64, 1333][:B]
    streams = [nat.encode(arrs[b], *ll, mbs[b]) for b in range(B)]
    datas = [s[0] for s in streams]
    mns = [s[1] for s in streams]
    want = np.stack([
        nat.decode(datas[b], mns[b], *shape, *ll) for b in range(B)
    ])
    got = _ilv_decode_batch(datas, mns, shape, ll)
    np.testing.assert_array_equal(got, want)


def test_interleaved_decoder_byte_prefix_truncation(rng):
    nat = runtime.load()
    shape, ll = (3, 24, 24), (6, 6)
    arrs = np.stack([
        (rng.standard_normal(shape) * s).astype(np.int32)
        for s in [2000, 5, 60000]
    ])
    streams = [nat.encode(arrs[b], *ll, 2**31 - 2) for b in range(3)]
    datas = [streams[0][0][:7], streams[1][0][:1], streams[2][0][:100]]
    mns = [s[1] for s in streams]
    want = np.stack([
        nat.decode(datas[b], mns[b], *shape, *ll) for b in range(3)
    ])
    got = _ilv_decode_batch(datas, mns, shape, ll)
    np.testing.assert_array_equal(got, want)


def test_interleaved_decoder_odd_ll_routing(rng):
    """Duplicate-parent geometries are rejected under forced ilv and
    fall back to lax.map in auto mode (shared-rec semantics need the
    sequential machine)."""
    from spiht_tpu.codec.pallas_decoder import (
        MachineResourceLimit, interleaved_fits, pallas_decode_batch,
    )

    assert not interleaved_fits(2, 1, 19, 19, 5, 5, 64)
    with pytest.raises(MachineResourceLimit):
        _ilv_decode_batch([b"\x00"], [3], (1, 19, 19), (5, 5))
    nat = runtime.load()
    arr = (rng.standard_normal((1, 19, 19)) * 900).astype(np.int32)
    data, mn = nat.encode(arr, 5, 5, 500)
    got = pallas_decode_batch([data], [mn], 1, 19, 19, 5, 5,
                              interpret=True)
    want = nat.decode(data, mn, 1, 19, 19, 5, 5)
    np.testing.assert_array_equal(got[0], want)


def _slices_geom(hw, lvl, ch, rng, scale=500):
    from spiht_tpu.codec import api
    from spiht_tpu.settings import SpihtSettings

    slices, ph, pw = api.get_slices_and_h_w(hw, hw, SpihtSettings(), lvl)
    arr = (rng.standard_normal((ch, ph, pw)) * scale).astype(np.int32)
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    top_slice = [(0, ll_h), (0, ll_w)]
    other = []
    for sl in slices[1:]:
        fs = []
        for key in ["da", "ad", "dd"]:
            s = sl[key]
            fs.append([(s[1].start, s[1].stop), (s[2].start, s[2].stop)])
        other.append(fs)
    return arr, ll_h, ll_w, ph, pw, top_slice, other


@pytest.mark.parametrize("mb", [1, 37, 2000, 500000])
def test_pallas_metadata_trace_exact(rng, mb):
    """The fast-machine event log expands to the reference 8-column
    trace row for row (incl. truncation and the n_bits+1 layout).
    Semantics: /root/reference/src/encoder_decoder.rs:616-841."""
    from spiht_tpu.codec.meta_expand import pallas_decode_with_metadata

    nat = runtime.load()
    arr, ll_h, ll_w, ph, pw, ts, osl = _slices_geom(64, 3, 2, rng)
    data, mn = nat.encode(arr, ll_h, ll_w, mb)
    want_rec, want_meta = nat.decode_with_metadata(
        data, mn, 2, ph, pw, ll_h, ll_w, ts, osl
    )
    got_rec, got_meta = pallas_decode_with_metadata(
        data, mn, 2, ph, pw, ll_h, ll_w,
        tuple(map(tuple, ts)),
        tuple(tuple(tuple(map(tuple, f)) for f in lvl) for lvl in osl),
        interpret=True,
    )
    np.testing.assert_array_equal(got_rec, want_rec)
    np.testing.assert_array_equal(got_meta, want_meta)


def test_pallas_metadata_duplicate_parent_raises(rng):
    """Odd-LL geometries stay on the sequential machine (shared-rec +
    non-unique filter/depth derivations)."""
    from spiht_tpu.codec.meta_expand import pallas_decode_with_metadata
    from spiht_tpu.codec.pallas_decoder import MachineResourceLimit

    with pytest.raises(MachineResourceLimit):
        pallas_decode_with_metadata(
            b"\x00", 3, 1, 19, 19, 5, 5, ((0, 5), (0, 5)), (),
            interpret=True,
        )


def test_event_log_public_api(rng):
    """decode_event_log + expand_event_log: the compact on-device lane
    (one i32/bit) reconstructs the reference trace exactly, and the log
    format itself is stable: node | action<<24 | (n+1)<<27 at the bit's
    stream offset."""
    from spiht_tpu.codec.meta_expand import (
        decode_event_log, expand_event_log,
    )

    nat = runtime.load()
    arr, ll_h, ll_w, ph, pw, ts, osl = _slices_geom(64, 3, 2, rng)
    data, mn = nat.encode(arr, ll_h, ll_w, 6000)
    want_rec, want_meta = nat.decode_with_metadata(
        data, mn, 2, ph, pw, ll_h, ll_w, ts, osl
    )
    rec, log, words, nbits = decode_event_log(
        data, mn, 2, ph, pw, ll_h, ll_w, interpret=True
    )
    assert nbits == len(data) * 8
    # the compact log is 1 i32 per bit slot (vs 8 per expanded row)
    assert log.nbytes <= (nbits + 256) * 4  # 1 i32/bit + row padding
    meta = expand_event_log(
        np.asarray(log), np.asarray(words), nbits, 2, ph, pw,
        ll_h, ll_w,
        tuple(map(tuple, ts)),
        tuple(tuple(tuple(map(tuple, f)) for f in lvl) for lvl in osl),
    )
    np.testing.assert_array_equal(np.asarray(rec), want_rec)
    np.testing.assert_array_equal(np.asarray(meta), want_meta)
    # format pin: re-derive the expanded action column from the raw log
    lg = np.asarray(log)[:nbits]
    written = lg != 0
    act = (lg >> 24) & 7
    np.testing.assert_array_equal(
        act[written], np.asarray(want_meta)[:nbits][written][:, 0]
    )
