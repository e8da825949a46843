"""Jitted JAX transform pipeline vs the numpy reference pipeline, and the
batched encode/decode API."""

import numpy as np
import pytest

import spiht_tpu
from spiht_tpu import SpihtSettings, transform
from spiht_tpu import jax_transform


SETTINGS = [
    SpihtSettings(),
    SpihtSettings(wavelet="bior4.4", mode="symmetric", quantization_scale=30.0),
    SpihtSettings(
        color_model="ipt",
        per_channel_quant_scales=[100, 20, 20],
        quantization_scale=1.0,
    ),
]


@pytest.mark.parametrize("settings", SETTINGS)
@pytest.mark.parametrize("shape,level", [((3, 64, 64), 3), ((3, 37, 53), 2)])
def test_forward_matches_numpy(rng, settings, shape, level):
    image = rng.random(shape)
    arr_np, llh_np, llw_np = transform.forward_numpy(image, settings, level)
    arr_j, llh_j, llw_j = jax_transform.forward(image, settings, level)
    assert (llh_np, llw_np) == (llh_j, llw_j)
    assert arr_np.shape == arr_j.shape
    # identical f64 math modulo op-ordering; quantization truncation can
    # only differ where the product is within float noise of an integer
    diff = arr_np != arr_j
    assert diff.mean() < 1e-3, f"{diff.sum()} coeffs differ"


@pytest.mark.parametrize("settings", SETTINGS)
def test_inverse_matches_numpy(rng, settings):
    image = rng.random((3, 64, 64))
    arr, llh, llw = transform.forward_numpy(image, settings, 3)
    rec_np = transform.inverse_numpy(arr, 64, 64, 3, settings)
    rec_j = jax_transform.inverse(arr, 64, 64, 3, settings)
    np.testing.assert_allclose(rec_j, rec_np, atol=1e-8)


def test_forward_with_maps(rng):
    from spiht_tpu.native import runtime

    settings = SpihtSettings()
    image = rng.random((3, 64, 64))
    arr, (m, d, g), llh, llw = jax_transform.forward_with_maps(
        image, settings, 3
    )
    nat = runtime.load()
    if nat is None:
        pytest.skip("native kernel unavailable")
    Mn, Dn, Gn = nat.compute_maps(arr, llh, llw)
    np.testing.assert_array_equal(m, Mn)
    np.testing.assert_array_equal(d, Dn)
    np.testing.assert_array_equal(g, Gn)


def test_roundtrip_through_jax_pipeline():
    """encode_image/decode_image with the jax backend: full-stream decode
    reproduces the image within quantization error."""
    settings = SpihtSettings(quantization_scale=100.0)
    # own deterministic rng: border-cell error quantiles are image-dependent
    image = np.random.default_rng(7).random((3, 64, 64))
    er = spiht_tpu.encode_image(image, settings, level=3)
    rec = spiht_tpu.decode_image(er, settings)
    err = np.abs(rec[..., :64, :64] - image)
    # border cells unreachable by the SPIHT tree (reference-parity artifact
    # for boundary-padded DWT geometries) can carry larger errors; the bulk
    # must be within quantization error.
    assert np.quantile(err, 0.99) < 0.05
    assert err.mean() < 0.01


def test_encode_images_matches_single(rng):
    """Batched API must produce byte-identical streams vs encode_image."""
    settings = SpihtSettings(
        color_model="ipt", per_channel_quant_scales=[50, 15, 15],
        quantization_scale=1.0,
    )
    images = [rng.random((3, 48, 48)) for _ in range(5)]
    batched = spiht_tpu.encode_images(images, settings, level=2, max_bits=4000)
    for im, er in zip(images, batched):
        single = spiht_tpu.encode_image(im, settings, level=2, max_bits=4000)
        assert er.encoded_bytes == single.encoded_bytes
        assert er.max_n == single.max_n


def test_encode_images_mixed_shapes(rng):
    settings = SpihtSettings()
    images = [
        rng.random((3, 48, 48)),
        rng.random((3, 64, 32)),
        rng.random((1, 40, 56)),
        rng.random((3, 48, 48)),
    ]
    batched = spiht_tpu.encode_images(images, settings, level=2)
    decoded = spiht_tpu.decode_images(batched, settings)
    for im, rec in zip(images, decoded):
        h, w = im.shape[-2:]
        err = np.abs(rec[..., :h, :w] - im)
        assert np.quantile(err, 0.99) < 0.06
        assert err.mean() < 0.02


def test_decode_images_matches_single(rng):
    settings = SpihtSettings()
    images = [rng.random((2, 40, 40)) for _ in range(3)]
    ers = spiht_tpu.encode_images(images, settings, level=2, max_bits=3000)
    batch_dec = spiht_tpu.decode_images(ers, settings)
    for er, bd in zip(ers, batch_dec):
        sd = spiht_tpu.decode_image(er, settings)
        np.testing.assert_allclose(bd, sd, atol=1e-12)
