"""Fully device-side (jit) SPIHT decoder vs the native kernel/oracle:
bit-exact reconstruction including byte-prefix truncation and the
metadata trace (reference semantics: encoder_decoder.rs:307-454,631-841).
"""

import numpy as np
import pytest

from spiht_tpu.codec.device_decoder import (
    decode_device,
    decode_device_with_metadata,
)
from spiht_tpu.native import runtime

pytestmark = pytest.mark.skipif(
    runtime.load() is None, reason="native kernel unavailable"
)


def _encode(arr, ll_h, ll_w, max_bits=10**9):
    nat = runtime.load()
    return nat.encode(arr, ll_h, ll_w, max_bits)


@pytest.mark.parametrize(
    "shape,ll",
    [
        ((1, 16, 16), (4, 4)),
        ((3, 24, 32), (6, 8)),
        ((2, 34, 18), (4, 2)),
        ((1, 19, 19), (5, 5)),  # odd LL: decoder has no parity limits
        ((2, 21, 13), (3, 2)),
    ],
)
def test_device_decoder_full_stream(rng, shape, ll):
    nat = runtime.load()
    arr = (rng.standard_normal(shape) * rng.choice([7, 400, 3000])).astype(
        np.int32
    )
    data, mn = _encode(arr, *ll)
    want = nat.decode(data, mn, *shape, *ll)
    got = decode_device(data, mn, *shape, *ll)
    np.testing.assert_array_equal(got, want)


def test_device_decoder_truncation_fuzz():
    """Every byte-prefix decodes identically to the native decoder."""
    rng = np.random.default_rng(99)
    nat = runtime.load()
    arr = (rng.standard_normal((2, 16, 16)) * 300).astype(np.int32)
    data, mn = _encode(arr, 4, 4)
    for nb in [0, 1, 2, 3, 5, 9, 17, 40, len(data) // 2, len(data) - 1]:
        prefix = data[:nb]
        want = nat.decode(prefix, mn, 2, 16, 16, 4, 4)
        got = decode_device(prefix, mn, 2, 16, 16, 4, 4)
        np.testing.assert_array_equal(got, want, err_msg=f"nb={nb}")


def test_device_decoder_budget_cut_stream(rng):
    """Streams truncated by the ENCODER's max_bits decode identically."""
    nat = runtime.load()
    arr = (rng.standard_normal((1, 32, 32)) * 900).astype(np.int32)
    for mb in (64, 333, 1000):
        data, mn = _encode(arr, 4, 4, mb)
        want = nat.decode(data, mn, 1, 32, 32, 4, 4)
        got = decode_device(data, mn, 1, 32, 32, 4, 4)
        np.testing.assert_array_equal(got, want)


def test_device_decoder_metadata_trace(rng):
    """The 8-column per-bit trace matches the native kernel row for row
    (incl. f32 local positions and the n_bits+1 layout)."""
    from spiht_tpu.codec import api
    from spiht_tpu.settings import SpihtSettings

    nat = runtime.load()
    # geometry from the real slices machinery (level 2 over 24x24 packs
    # to 32x32 under bior2.2's boundary growth)
    slices, ph, pw = api.get_slices_and_h_w(24, 24, SpihtSettings(), 2)
    arr = (rng.standard_normal((2, ph, pw)) * 500).astype(np.int32)
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    top_slice = [(0, ll_h), (0, ll_w)]
    other_slices = []
    for sl in slices[1:]:
        fs = []
        for key in ["da", "ad", "dd"]:
            s = sl[key]
            fs.append([(s[1].start, s[1].stop), (s[2].start, s[2].stop)])
        other_slices.append(fs)

    data, mn = _encode(arr, ll_h, ll_w, 2000)
    want_rec, want_meta = nat.decode_with_metadata(
        data, mn, 2, ph, pw, ll_h, ll_w, top_slice, other_slices
    )
    got_rec, got_meta = decode_device_with_metadata(
        data, mn, 2, ph, pw, ll_h, ll_w,
        tuple(map(tuple, top_slice)),
        tuple(
            tuple(tuple(map(tuple, f)) for f in lvl)
            for lvl in other_slices
        ),
    )
    np.testing.assert_array_equal(got_rec, want_rec)
    assert got_meta.shape == want_meta.shape
    np.testing.assert_array_equal(got_meta, want_meta)


def test_device_decoder_roundtrip_device_encoder(rng):
    """encode on device, decode on device: exact on the coverage mask."""
    from spiht_tpu.codec import oracle
    from spiht_tpu.codec.device_encoder import encode_device

    arr = (rng.standard_normal((1, 16, 16)) * 800).astype(np.int32)
    data, mn = encode_device(arr, 4, 4, 10**9)
    rec = decode_device(data, mn, 1, 16, 16, 4, 4)
    mask = oracle.coverage_mask(16, 16, 4, 4)
    np.testing.assert_array_equal(rec[:, mask], arr[:, mask])


def test_device_decoder_zero_stream():
    rec = decode_device(b"", 5, 1, 8, 8, 2, 2)
    np.testing.assert_array_equal(rec, np.zeros((1, 8, 8), np.int32))


def test_api_level_device_decoder_flag(rng, monkeypatch):
    """SPIHT_TPU_DEVICE_DECODER=1 routes decode_image (incl. metadata)
    through the device decoder with identical output."""
    import spiht_tpu
    from spiht_tpu import SpihtSettings, transform

    monkeypatch.setattr(transform, "_BACKEND", "numpy")
    im = rng.random((1, 48, 48))
    er = spiht_tpu.encode_image(im, SpihtSettings(), level=2, max_bits=3000)
    a, am = spiht_tpu.decode_image(er, SpihtSettings(), return_metadata=True)
    monkeypatch.setenv("SPIHT_TPU_DEVICE_DECODER", "1")
    b, bm = spiht_tpu.decode_image(er, SpihtSettings(), return_metadata=True)
    np.testing.assert_allclose(a, b)
    np.testing.assert_array_equal(am, bm)


def test_device_decoder_batch(rng):
    """vmapped batch decode: per-stream results identical to the native
    decoder (mixed budgets -> different stream lengths)."""
    from spiht_tpu.codec.device_decoder import decode_device_batch

    nat = runtime.load()
    arrs = (rng.standard_normal((4, 1, 16, 16)) * 400).astype(np.int32)
    datas, ns = [], []
    for b, mb in enumerate([150, 10**6, 64, 500]):
        d, mn = nat.encode(arrs[b], 4, 4, mb)
        datas.append(d)
        ns.append(mn)
    recs = decode_device_batch(datas, ns, 1, 16, 16, 4, 4)
    for b in range(4):
        want = nat.decode(datas[b], ns[b], 1, 16, 16, 4, 4)
        np.testing.assert_array_equal(recs[b], want, err_msg=str(b))


@pytest.mark.slow
def test_device_decoder_bit_granular_truncation_fuzz(rng):
    """Byte prefixes chosen to land inside every plane phase (LIP test,
    LIP sign, LIS cascade, refinement) — the hybrid decoder's parallel
    LIP/refinement sections must reproduce the sequential machine's
    mid-entry death semantics exactly."""
    nat = runtime.load()
    arr = (rng.standard_normal((1, 24, 24)) * 2000).astype(np.int32)
    data, mn = _encode(arr, 6, 6)
    for nb in range(0, min(len(data), 160), 3):
        prefix = data[:nb]
        want = nat.decode(prefix, mn, 1, 24, 24, 6, 6)
        got = decode_device(prefix, mn, 1, 24, 24, 6, 6)
        np.testing.assert_array_equal(got, want, err_msg=f"nb={nb}")


@pytest.mark.slow
def test_device_decoder_odd_ll_duplicate_parents_truncation(rng):
    """Odd LL dims overlap the parity offspring map: a cell can have up
    to 4 parents and enter LSP more than once. Decode must keep shared
    per-cell state (in-place refinement + re-significance overwrite,
    oracle semantics) — per-entry running values diverge under
    mid-refinement truncation. Dense magnitudes force duplicate LSP
    events past the naive N bound, exercising the multiplicity-exact
    queue capacities."""
    nat = runtime.load()
    arr = (rng.standard_normal((1, 12, 12)) * 60000 + 4096).astype(
        np.int32
    )
    data, mn = _encode(arr, 3, 3)
    for nb in range(0, len(data) + 1, 2):
        prefix = data[:nb]
        want = nat.decode(prefix, mn, 1, 12, 12, 3, 3)
        got = decode_device(prefix, mn, 1, 12, 12, 3, 3)
        np.testing.assert_array_equal(got, want, err_msg=f"nb={nb}")


def test_device_decoder_odd_ll_metadata_depth_clamp(rng):
    """Overlap chains can be longer than the nominal level; child depth
    clamps at 0 (defined semantics — the reference would panic indexing
    slices[level-1-depth]). Native and device must agree on the trace."""
    nat = runtime.load()
    c, h, w, llh, llw = 1, 12, 12, 3, 3
    arr = (rng.standard_normal((c, h, w)) * 5000).astype(np.int32)
    data, mn = _encode(arr, llh, llw)
    top = ((0, llh), (0, llw))
    other = (
        (((3, 6), (0, 3)), ((0, 3), (3, 6)), ((3, 6), (3, 6))),
        (((6, 12), (0, 6)), ((0, 6), (6, 12)), ((6, 12), (6, 12))),
    )
    for nb in [3, 17, 60, len(data)]:
        prefix = data[:nb]
        wr, wm = nat.decode_with_metadata(
            prefix, mn, c, h, w, llh, llw, top, other
        )
        gr, gm = decode_device_with_metadata(
            prefix, mn, c, h, w, llh, llw, top, other
        )
        np.testing.assert_array_equal(gr, wr, err_msg=f"nb={nb}")
        np.testing.assert_array_equal(gm, wm, err_msg=f"nb={nb}")


def test_decode_image_device_pipeline(rng):
    """The fused one-program decode (bit-parse -> dequantize -> inverse
    DWT -> inverse color) equals the host decode_image path: identical
    bit-parse (int32 rec) and f64-exact inverse transform."""
    from spiht_tpu import (
        SpihtSettings,
        decode_image,
        decode_image_device,
        encode_image,
    )

    im = rng.random((3, 40, 56))
    for settings in (
        SpihtSettings(),
        SpihtSettings(
            color_model="ipt",
            per_channel_quant_scales=[100.0, 20.0, 20.0],
            quantization_scale=1.0,
        ),
    ):
        er = encode_image(im, settings, level=3, max_bits=6000)
        want = decode_image(er, settings)
        got = decode_image_device(er, settings)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_device_pipelines_nondefault_wavelet(rng):
    """Fused encode/decode pipelines under a non-default combo
    (sym4, periodization): streams byte-identical to the host path and
    decode f64-exact — wavelet/mode parity holds through the fused
    programs, not just the host transform."""
    from spiht_tpu import (
        SpihtSettings,
        decode_image,
        decode_image_device,
        encode_image,
        encode_image_device,
    )

    im = rng.random((3, 32, 32))
    settings = SpihtSettings(wavelet="sym4", mode="periodization")
    er = encode_image(im, settings, level=2, max_bits=5000)
    er_d = encode_image_device(im, settings, level=2, max_bits=5000)
    assert er_d.encoded_bytes == er.encoded_bytes
    assert er_d.max_n == er.max_n
    want = decode_image(er, settings)
    got = decode_image_device(er, settings)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_decode_images_device_batch(rng):
    """Batched fused decode equals per-image host decode over
    same-geometry streams of different lengths (per-stream truncation
    budgets and max_n ride the vmap)."""
    from spiht_tpu import (
        SpihtSettings,
        decode_image,
        decode_images_device,
        encode_image,
    )

    settings = SpihtSettings()
    ims = [rng.random((3, 32, 40)) for _ in range(3)]
    mbs = [2000, 6000, 9000]
    ers = [
        encode_image(im, settings, level=2, max_bits=mb)
        for im, mb in zip(ims, mbs)
    ]
    got = decode_images_device(ers, settings)
    for b, er in enumerate(ers):
        want = decode_image(er, settings)
        np.testing.assert_allclose(
            got[b], want, rtol=0, atol=1e-9, err_msg=str(b)
        )
