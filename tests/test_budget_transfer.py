"""Budget-narrowed transfer path: streams must be bit-identical to the
standard jax path for any budget."""

import numpy as np
import pytest

import spiht_tpu
from spiht_tpu import SpihtSettings, transform


@pytest.fixture(autouse=True)
def jax_backend(monkeypatch):
    monkeypatch.setattr(transform, "_BACKEND", "jax")


def _streams(images, settings, level, mb, monkeypatch):
    monkeypatch.setenv("SPIHT_TPU_BUDGET_TRANSFER", "0")
    normal = spiht_tpu.encode_images(images, settings, level, max_bits=mb)
    monkeypatch.setenv("SPIHT_TPU_BUDGET_TRANSFER", "1")
    budget = spiht_tpu.encode_images(images, settings, level, max_bits=mb)
    return normal, budget


@pytest.mark.parametrize("bpp", [0.05, 0.25, 1.0, 4.0])
def test_budget_streams_identical(rng, monkeypatch, bpp):
    settings = SpihtSettings()
    images = [rng.random((3, 64, 64)) for _ in range(4)]
    mb = [round(bpp * 64 * 64)] * 4
    normal, budget = _streams(images, settings, 3, mb, monkeypatch)
    for a, b in zip(normal, budget):
        assert a.encoded_bytes == b.encoded_bytes
        assert a.max_n == b.max_n


def test_budget_streams_identical_ipt(rng, monkeypatch):
    settings = SpihtSettings(
        color_model="ipt", per_channel_quant_scales=[100, 20, 20],
        quantization_scale=1.0,
    )
    images = [rng.random((3, 48, 80)) for _ in range(3)]
    mb = [600, 2000, 12000]
    normal, budget = _streams(images, settings, 2, mb, monkeypatch)
    for a, b in zip(normal, budget):
        assert a.encoded_bytes == b.encoded_bytes


def test_budget_path_decodes(rng, monkeypatch):
    monkeypatch.setenv("SPIHT_TPU_BUDGET_TRANSFER", "1")
    settings = SpihtSettings(quantization_scale=100.0)
    images = [rng.random((1, 32, 32)) for _ in range(2)]
    ers = spiht_tpu.encode_images(images, settings, 2, max_bits=512)
    recs = spiht_tpu.decode_images(ers, settings)
    for r in recs:
        assert np.isfinite(r).all()


def test_budget_zero_image(monkeypatch):
    monkeypatch.setenv("SPIHT_TPU_BUDGET_TRANSFER", "1")
    settings = SpihtSettings()
    ers = spiht_tpu.encode_images(
        [np.zeros((1, 32, 32))], settings, 2, max_bits=400
    )
    rec = spiht_tpu.decode_images(ers, settings)[0]
    assert np.abs(rec).max() < 1e-9
