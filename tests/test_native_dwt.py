"""Native C++ DWT forward/inverse vs the trusted numpy reference."""

import numpy as np
import pytest

import spiht_tpu
from spiht_tpu import SpihtSettings, transform
from spiht_tpu.native import runtime


pytestmark = pytest.mark.skipif(
    runtime.load() is None, reason="native kernel unavailable"
)

CASES = [
    ((3, 64, 64), 3, SpihtSettings()),
    ((1, 37, 53), 2, SpihtSettings(wavelet="bior4.4", mode="symmetric")),
    (
        (3, 50, 70),
        None,
        SpihtSettings(
            color_model="ipt",
            per_channel_quant_scales=[100, 20, 20],
            quantization_scale=1.0,
        ),
    ),
    ((2, 48, 48), 4, SpihtSettings(wavelet="bior6.8", mode="reflect")),
    ((1, 33, 65), 2, SpihtSettings(mode="periodic")),
    ((1, 40, 40), 2, SpihtSettings(mode="smooth")),
]


@pytest.mark.parametrize("shape,level,settings", CASES)
def test_forward_native_matches_numpy(rng, shape, level, settings):
    im = rng.random(shape)
    a_np, lh, lw = transform.forward_numpy(im, settings, level)
    a_nat, lh2, lw2 = transform.forward_native(im, settings, level)
    assert (lh, lw) == (lh2, lw2)
    # identical f64 math modulo summation order; truncation flips are
    # possible only within float ulps of an integer
    diff = a_np != a_nat
    assert diff.mean() < 1e-4, f"{diff.sum()} coeffs differ"


@pytest.mark.parametrize("shape,level,settings", CASES)
def test_inverse_native_matches_numpy(rng, shape, level, settings):
    im = rng.random(shape)
    arr, _, _ = transform.forward_numpy(im, settings, level)
    r_np = transform.inverse_numpy(arr, shape[1], shape[2], level, settings)
    r_nat = transform.inverse_native(arr, shape[1], shape[2], level, settings)
    assert r_np.shape == r_nat.shape
    np.testing.assert_allclose(r_nat, r_np, atol=1e-12)


def test_native_backend_roundtrip(rng, monkeypatch):
    monkeypatch.setattr(transform, "_BACKEND", "native")
    settings = SpihtSettings(quantization_scale=100.0)
    images = [rng.random((3, 48, 48)) for _ in range(4)]
    ers = spiht_tpu.encode_images(images, settings, level=2)
    recs = spiht_tpu.decode_images(ers, settings)
    for im, rec in zip(images, recs):
        err = np.abs(rec[..., :48, :48] - im)
        assert np.quantile(err, 0.99) < 0.05


def test_native_backend_bitstreams_match_numpy_backend(rng, monkeypatch):
    """Same settings must give identical bytes across host backends."""
    settings = SpihtSettings()
    im = rng.random((3, 40, 40))
    monkeypatch.setattr(transform, "_BACKEND", "numpy")
    er_np = spiht_tpu.encode_image(im, settings, level=2, max_bits=4000)
    monkeypatch.setattr(transform, "_BACKEND", "native")
    er_nat = spiht_tpu.encode_image(im, settings, level=2, max_bits=4000)
    assert er_np.encoded_bytes == er_nat.encoded_bytes
    assert er_np.max_n == er_nat.max_n


@pytest.mark.parametrize("shape", [(1, 64, 3), (1, 3, 64), (2, 64, 4)])
def test_skinny_dims_no_heap_overflow(rng, shape):
    """Regression (round-1 advisor): with a spatial dim < filter_len-1 the
    level output GROWS (coeff_len(n,F)=(n+F-1)/2 > n), so h*w-sized scratch
    overflowed the heap. forward/inverse must match numpy, not crash."""
    im = rng.random(shape)
    s = SpihtSettings()  # bior2.2, F=6 > 3+1
    a_np, lh, lw = transform.forward_numpy(im, s, 1)
    a_nat, lh2, lw2 = transform.forward_native(im, s, 1)
    assert (lh, lw) == (lh2, lw2)
    assert (a_np != a_nat).mean() < 1e-4
    r_np = transform.inverse_numpy(a_np, shape[1], shape[2], 1, s)
    r_nat = transform.inverse_native(a_np, shape[1], shape[2], 1, s)
    np.testing.assert_allclose(r_nat, r_np, atol=1e-12)
