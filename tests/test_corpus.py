"""Integration over the real reference image corpus.

Mirrors /root/reference/spiht/tests/test_spiht.py:10-28 (full
encode->decode over every JPEG in images/, plus the metadata-path
equivalence check) and goes further: PSNR floors, a locked real-image
golden digest, and the README-recommended IPT quality settings.

Real JPEGs exercise coefficient statistics (large magnitudes, IPT channel
ranges) that the synthetic fields used elsewhere in the suite do not.
"""

import hashlib
import math

import numpy as np
import pytest

import spiht_tpu
from spiht_tpu import SpihtSettings, transform
from spiht_tpu.utils import imload


def _auto_level(h: int, w: int) -> int:
    # reference auto-level: /root/reference/encode_decode.py:33-38
    return int(math.floor(min(math.log2(h / 8), math.log2(w / 8))))


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * math.log10(1.0 / mse) if mse > 0 else float("inf")


@pytest.fixture(scope="module", autouse=True)
def _native_backend():
    # the f64 native path is bit-compatible with the numpy reference path
    # and ~10x faster; corpus runs 8 full-size JPEGs
    old = transform._BACKEND
    transform._BACKEND = "native"
    yield
    transform._BACKEND = old


IPT_SETTINGS = SpihtSettings(
    color_model="ipt",
    per_channel_quant_scales=[100, 20, 20],
    quantization_scale=1.0,
)


def test_roundtrip_corpus_default(ref_image_paths):
    """Every corpus image round-trips at 0.5 bpp with sane fidelity
    (reference: test_spiht.py:10-17, which only asserts no-crash)."""
    assert len(ref_image_paths) == 8
    settings = SpihtSettings()
    for path in ref_image_paths:
        im = imload(path)
        c, h, w = im.shape
        level = _auto_level(h, w)
        max_bits = round(0.5 * h * w)
        er = spiht_tpu.encode_image(im, settings, level, max_bits)
        rec = spiht_tpu.decode_image(er, settings)
        # reference decode returns the raw waverec2 output, which can
        # exceed an odd input dim by 1 (no crop: spiht_wrapper.py:259-281)
        assert all(
            r in (s, s + 1) for r, s in zip(rec.shape, im.shape)
        ), (rec.shape, im.shape)
        rec = rec[:, : im.shape[1], : im.shape[2]]
        # floors catch gross corruption without being brittle;
        # pattern.jpg is a high-frequency test card (PSNR ~10 at 0.5 bpp
        # is genuine, not a bug)
        floor = 9.0 if path.endswith("pattern.jpg") else 14.0
        assert _psnr(im, np.clip(rec, 0, 1)) > floor, path


def test_roundtrip_corpus_ipt(ref_image_paths):
    """README-recommended quality settings over the corpus
    (/root/reference/README.md:25-26, demonstrate.py:17-22)."""
    for path in ref_image_paths:
        im = imload(path)
        c, h, w = im.shape
        er = spiht_tpu.encode_image(
            im, IPT_SETTINGS, _auto_level(h, w), round(0.5 * h * w)
        )
        rec = spiht_tpu.decode_image(er, IPT_SETTINGS)
        rec = rec[:, : im.shape[1], : im.shape[2]]
        assert rec.shape == im.shape
        floor = 9.0 if path.endswith("pattern.jpg") else 14.0
        assert _psnr(im, np.clip(rec, 0, 1)) > floor, path


def test_metadata_decode_equivalence_real_image(ref_image_paths):
    """decode with and without metadata must agree on a real image
    (reference: test_spiht.py:19-28)."""
    im = imload(ref_image_paths[0])
    c, h, w = im.shape
    settings = SpihtSettings()
    er = spiht_tpu.encode_image(im, settings, 4, round(0.4 * h * w))
    rec_plain = spiht_tpu.decode_image(er, settings)
    rec_meta, metadata = spiht_tpu.decode_image(
        er, settings, return_metadata=True
    )
    np.testing.assert_allclose(rec_plain, rec_meta)
    assert metadata.shape[1] == 8
    # n_bits+1 rows, where the decoder consumes the byte-padded stream
    assert metadata.shape[0] == len(er.encoded_bytes) * 8 + 1


def test_real_image_golden_digest(ref_image_paths):
    """Locked stream digest for one real image: any change to the DWT
    f64 semantics, quantization, or scheduler order flips this."""
    path = [p for p in ref_image_paths if p.endswith("fractal.jpg")][0]
    im = imload(path)
    er = spiht_tpu.encode_image(im, SpihtSettings(), level=5, max_bits=65536)
    digest = hashlib.sha256(er.encoded_bytes).hexdigest()
    assert er.max_n == 10
    assert (
        digest
        == "7ba4ca81b53252b22ada26e24b7ef2e2cc2a2aac3c3644193ae1eaf75cad7dbf"
    ), digest
