"""Edge-case image geometries through the full pipeline on every backend."""

import numpy as np
import pytest

import spiht_tpu
from spiht_tpu import SpihtSettings, transform
from spiht_tpu.codec import oracle


CASES = [
    ((1, 8, 8), 1),        # smallest sensible pyramid
    ((3, 16, 256), 2),     # extreme aspect ratio (wide)
    ((3, 256, 16), 2),     # extreme aspect ratio (tall)
    ((4, 33, 47), 2),      # 4 channels, odd dims
    ((1, 9, 9), 1),        # tiny odd
    ((2, 64, 64), None),   # auto level (max for the size)
]


@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
@pytest.mark.parametrize("shape,level", CASES)
def test_roundtrip_edge_geometries(rng, monkeypatch, backend, shape, level):
    monkeypatch.setattr(transform, "_BACKEND", backend)
    im = rng.random(shape)
    er = spiht_tpu.encode_image(im, SpihtSettings(), level=level)
    rec = spiht_tpu.decode_image(er, SpihtSettings())
    h, w = shape[-2:]
    err = np.abs(rec[..., :h, :w] - im)
    assert np.isfinite(rec).all()
    assert np.quantile(err, 0.95) < 0.06


def test_streams_identical_across_backends_edge(rng, monkeypatch):
    im = rng.random((1, 9, 9))
    outs = {}
    for backend in ["numpy", "native"]:
        monkeypatch.setattr(transform, "_BACKEND", backend)
        outs[backend] = spiht_tpu.encode_image(
            im, SpihtSettings(), level=1
        ).encoded_bytes
    assert outs["numpy"] == outs["native"]


def test_constant_and_zero_images(monkeypatch):
    monkeypatch.setattr(transform, "_BACKEND", "native")
    s = SpihtSettings()
    zero = np.zeros((1, 32, 32))
    er = spiht_tpu.encode_image(zero, s, level=2)
    rec = spiht_tpu.decode_image(er, s)
    assert np.abs(rec).max() < 1e-9
    const = np.full((3, 32, 32), 0.5)
    er = spiht_tpu.encode_image(const, s, level=2)
    rec = spiht_tpu.decode_image(er, s)
    assert np.abs(rec[..., :32, :32] - 0.5).max() < 0.02


def test_tiny_max_bits(rng, monkeypatch):
    monkeypatch.setattr(transform, "_BACKEND", "native")
    im = rng.random((3, 32, 32))
    for mb in (1, 7, 8, 9, 64):
        er = spiht_tpu.encode_image(im, SpihtSettings(), level=2, max_bits=mb)
        assert len(er.encoded_bytes) == (mb + 7) // 8
        rec = spiht_tpu.decode_image(er, SpihtSettings())
        assert np.isfinite(rec).all()
