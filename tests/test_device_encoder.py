"""Fully device-side (jit) SPIHT encoder vs the native kernel: the whole
bitstream — order and values — as one XLA program."""

import numpy as np
import pytest

from spiht_tpu.codec.device_encoder import encode_device
from spiht_tpu.native import runtime

pytestmark = pytest.mark.skipif(
    runtime.load() is None, reason="native kernel unavailable"
)


def _check(arr, ll_h, ll_w, max_bits):
    nat = runtime.load()
    want, wmn = nat.encode(arr, ll_h, ll_w, max_bits)
    got, gmn = encode_device(arr, ll_h, ll_w, max_bits)
    assert gmn == wmn
    assert got == want


@pytest.mark.parametrize(
    "shape,ll,mb",
    [
        ((1, 16, 16), (4, 4), 10**9),
        ((3, 24, 32), (6, 8), 3000),
        ((2, 34, 18), (4, 2), 555),
        ((1, 64, 64), (8, 8), 8192),
    ],
)
def test_device_encoder_bit_exact(rng, shape, ll, mb):
    arr = (rng.standard_normal(shape) * rng.choice([5, 300, 4000])).astype(
        np.int32
    )
    _check(arr, ll[0], ll[1], mb)


def test_device_encoder_random_geometries():
    rng = np.random.default_rng(2024)
    for _ in range(5):
        c = int(rng.integers(1, 3))
        ll_h = 2 * int(rng.integers(1, 4))
        ll_w = 2 * int(rng.integers(1, 4))
        h, w = ll_h, ll_w
        for _ in range(int(rng.integers(1, 4))):
            h = 2 * h + int(rng.integers(0, 2))
            w = 2 * w + int(rng.integers(0, 2))
        arr = (rng.standard_normal((c, h, w)) * 200).astype(np.int32)
        mb = int(rng.integers(50, 4 * c * h * w))
        _check(arr, ll_h, ll_w, mb)


def test_device_encoder_zero_and_sparse(rng):
    arr = np.zeros((1, 16, 16), dtype=np.int32)
    _check(arr, 4, 4, 10**9)
    arr[0, 9, 3] = -777
    arr[0, 0, 1] = 12
    _check(arr, 4, 4, 10**9)


def test_device_encoder_full_pipeline_roundtrip(rng):
    """Device-encoded stream decodes exactly (coverage mask) by the
    native decoder."""
    from spiht_tpu.codec import oracle

    nat = runtime.load()
    arr = (rng.standard_normal((2, 24, 24)) * 500).astype(np.int32)
    data, max_n = encode_device(arr, 6, 6, 10**9)
    rec = nat.decode(data, max_n, 2, 24, 24, 6, 6)
    mask = oracle.coverage_mask(24, 24, 6, 6)
    np.testing.assert_array_equal(rec[:, mask], arr[:, mask])


def test_device_encoder_batch(rng):
    """vmapped batch encoder: per-image streams identical to the kernel."""
    from spiht_tpu.codec.device_encoder import encode_device_batch

    nat = runtime.load()
    arrs = (rng.standard_normal((4, 2, 16, 16)) * 300).astype(np.int32)
    mbs = [200, 10**6, 64, 999]
    out = encode_device_batch(arrs, 4, 4, mbs)
    for b in range(4):
        want, wmn = nat.encode(arrs[b], 4, 4, mbs[b])
        assert out[b] == (want, wmn)


def test_api_level_device_encoder_flag(rng, monkeypatch):
    """SPIHT_TPU_DEVICE_ENCODER=1 routes encode_image through the device
    encoder with identical output."""
    import spiht_tpu
    from spiht_tpu import SpihtSettings, transform

    monkeypatch.setattr(transform, "_BACKEND", "numpy")
    im = rng.random((1, 64, 64))
    # level 3 gives an even LL (12x12); odd-LL geometries fall back to
    # the native path transparently
    a = spiht_tpu.encode_image(im, SpihtSettings(), level=3, max_bits=2000)
    monkeypatch.setenv("SPIHT_TPU_DEVICE_ENCODER", "1")
    b = spiht_tpu.encode_image(im, SpihtSettings(), level=3, max_bits=2000)
    assert a.encoded_bytes == b.encoded_bytes
    assert a.max_n == b.max_n
    # odd-LL (level 2 -> 19x19) must still work via fallback
    c1 = spiht_tpu.encode_image(im, SpihtSettings(), level=2, max_bits=2000)
    monkeypatch.delenv("SPIHT_TPU_DEVICE_ENCODER")
    c2 = spiht_tpu.encode_image(im, SpihtSettings(), level=2, max_bits=2000)
    assert c1.encoded_bytes == c2.encoded_bytes


def test_device_encoder_rejects_odd_ll(rng):
    from spiht_tpu.codec.device_encoder import encode_device

    arr = (rng.standard_normal((1, 12, 12)) * 100).astype(np.int32)
    with pytest.raises(ValueError):
        encode_device(arr, 3, 3, 1000)


def test_device_encoder_adversarial_capacity(rng):
    """Worst-case-ish stream (round-1 advisor / verdict item 3): one huge
    magnitude per 2x2 sibling group keeps everything in the lists for all
    32 planes. Must be bit-exact at full stream — never silently truncated."""
    arr = rng.choice([-1, 1], size=(1, 32, 32)).astype(np.int32)
    arr[0, ::2, ::2] = 2**31 - 1  # max_n = 30 via the f32-truncated rule
    _check(arr, 4, 4, 10**9)


def test_device_encoder_overflow_detected():
    """With a deliberately tiny capacity the encoder must FLAG overflow
    (previously: out-of-range scatters dropped silently -> corrupt
    stream with no error)."""
    import jax.numpy as jnp

    from spiht_tpu.codec import device_encoder as de

    rng = np.random.default_rng(7)
    arr = (rng.standard_normal((1, 16, 16)) * 1000).astype(np.int32)
    fn = de.encode_device_fn(1, 16, 16, 4, 4, bits_per_cell=1)
    from spiht_tpu.codec.oracle import compute_max_n

    words, total, overflow = fn(jnp.asarray(arr), compute_max_n(arr), 10**9)
    assert bool(overflow)
    # the true required length is still reported (saturation kicks in far
    # past the capacity); the native stream's byte count is its ceiling
    nat = runtime.load()
    want, _ = nat.encode(arr, 4, 4, 10**9)
    assert (len(want) - 1) * 8 < int(total) <= len(want) * 8


def test_api_falls_back_on_capacity_overflow(rng, monkeypatch):
    """api.encode must transparently fall back to the host scheduler when
    the device buffer would overflow."""
    from spiht_tpu.codec import api, device_encoder

    def tiny_encode_device(arr, ll_h, ll_w, max_bits):
        raise device_encoder.CapacityOverflow(999999, 1024)

    monkeypatch.setenv("SPIHT_TPU_DEVICE_ENCODER", "1")
    monkeypatch.setattr(device_encoder, "encode_device", tiny_encode_device)
    arr = (rng.standard_normal((1, 16, 16)) * 300).astype(np.int32)
    nat = runtime.load()
    want = nat.encode(arr, 4, 4, 5000)
    got = api.encode(arr, 4, 4, 5000)
    assert got == want


def test_pack_lanes_sort_payload_roundtrip(rng):
    """The packed-lane sort must (a) order present entities exactly like a
    plain lexsort of the key tuple and (b) return payload fields intact in
    that order, even when fields split across 31-bit lane boundaries."""
    import jax.numpy as jnp

    from spiht_tpu.codec.device_encoder import _sort_payload

    n = 257
    # three keys whose total width (7 + 19 + 11 = 37 bits) forces a split
    k0 = rng.integers(0, 1 << 7, n).astype(np.int32)
    k1 = rng.integers(0, 1 << 19, n).astype(np.int32)
    # last key made DISTINCT so the key tuple totally orders entities
    # (the _sort_payload contract)
    k2 = rng.permutation(n).astype(np.int32)
    p0 = rng.integers(0, 1 << 9, n).astype(np.int32)
    p1 = rng.integers(0, 1 << 4, n).astype(np.int32)
    present = rng.random(n) < 0.7

    (s0, s1), cnt = _sort_payload(
        [(jnp.asarray(k0), 7), (jnp.asarray(k1), 19), (jnp.asarray(k2), 11)],
        [(jnp.asarray(p0), 9), (jnp.asarray(p1), 4)],
        jnp.asarray(present),
    )
    assert int(cnt) == int(present.sum())
    order = np.lexsort((k2[present], k1[present], k0[present]))
    np.testing.assert_array_equal(
        np.asarray(s0)[: int(cnt)], p0[present][order]
    )
    np.testing.assert_array_equal(
        np.asarray(s1)[: int(cnt)], p1[present][order]
    )


def test_encode_image_device_pipeline(rng):
    """The fused one-program encode (color -> DWT -> quantize ->
    device max_n -> bit emission) produces byte-identical streams and
    max_n vs the host encode_image path (both f64 under x64), across
    default and IPT settings."""
    from spiht_tpu import SpihtSettings, encode_image, encode_image_device

    im = rng.random((3, 44, 60))  # packs to 52x68, ll 14x18 (even)
    for settings in (
        SpihtSettings(),
        SpihtSettings(
            color_model="ipt",
            per_channel_quant_scales=[100.0, 20.0, 20.0],
            quantization_scale=1.0,
        ),
    ):
        for mb in (6000, None):
            want = encode_image(im, settings, level=2, max_bits=mb)
            got = encode_image_device(im, settings, level=2, max_bits=mb)
            assert got.max_n == want.max_n
            assert got.encoded_bytes == want.encoded_bytes
            assert (got.h, got.w, got.c, got.level) == (
                want.h, want.w, want.c, want.level,
            )


def test_device_max_n_exact_vs_oracle(rng):
    """device_max_n reproduces the reference's f32-truncated log2
    (oracle.compute_max_n) bit-for-bit, including the top-of-binade
    round-up (e.g. the largest f32 below 8 has f32 log2 == 3.0)."""
    from spiht_tpu.codec.device_encoder import device_max_n
    from spiht_tpu.codec.oracle import compute_max_n

    vals = [0, 1, 2, 3]
    for k in range(1, 31):
        vals += [2**k - 1, 2**k, 2**k + 1]
    for k in range(24, 31):
        vals += [2**k + d for d in range(-40, 41, 7)]
    vals += list(rng.integers(1, 2**31 - 100, 500))
    for v in vals:
        arr = np.array([[[-int(v)]]], np.int32)
        assert int(device_max_n(arr)) == compute_max_n(arr), v


def test_encode_image_device_odd_ll_falls_back(rng):
    """Odd-LL geometries transparently take the host encoder."""
    from spiht_tpu import SpihtSettings, encode_image, encode_image_device

    im = rng.random((3, 40, 56))  # packs to ll 13x17 (odd)
    want = encode_image(im, SpihtSettings(), level=2, max_bits=4000)
    got = encode_image_device(im, SpihtSettings(), level=2, max_bits=4000)
    assert got.encoded_bytes == want.encoded_bytes
    assert got.max_n == want.max_n


def test_encode_images_device_batch(rng):
    """Batched fused pipeline: per-image streams byte-identical to the
    single-image host path, including per-image budgets and max_n."""
    from spiht_tpu import SpihtSettings, encode_image, encode_images_device

    ims = [rng.random((3, 44, 60)) for _ in range(3)]
    mbs = [3000, 5000, 10**7]
    settings = SpihtSettings()
    got = encode_images_device(ims, settings, level=2, max_bits=mbs)
    for b, (im, mb) in enumerate(zip(ims, mbs)):
        want = encode_image(im, settings, level=2, max_bits=mb)
        assert got[b].encoded_bytes == want.encoded_bytes, b
        assert got[b].max_n == want.max_n, b
