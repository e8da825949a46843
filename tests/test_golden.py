"""Golden bitstream regression tests.

Deterministic inputs -> fixed stream digests, locked the first time the
full pipeline (f64 DWT + quantize + SPIHT scheduling) was verified
bit-exact against the independent oracle. Any change to these hashes
means the wire format moved — that is a breaking change, not a refactor.

The oracle itself is no longer the sole provenance anchor: as of round
5 its scheduling is byte-checked against the reference's own runnable
python codec on shared coefficient arrays
(tests/test_reference_crosscheck.py; BASELINE.md round-5 section), so
these digests chain to reference-derived bytes, not only to the
SURVEY.md transcription.

(Golden data is generated, not vendored: the input images are synthetic
and seeded, so the fixtures are the digests themselves.)
"""

import hashlib

import numpy as np
import pytest

import spiht_tpu
from spiht_tpu import SpihtSettings, transform


def _image(seed, shape=(3, 64, 64)):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0 : shape[1], 0 : shape[2]].astype(np.float64)
    base = 0.5 + 0.3 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    im = np.stack([base * (0.5 + 0.5 * c / shape[0]) for c in range(shape[0])])
    im += 0.1 * rng.standard_normal(shape)
    return np.clip(im, 0.0, 1.0)


GOLDEN = [
    # (seed, settings, level, max_bits, sha256 of stream || max_n)
    (1, SpihtSettings(), 3, 5000,
     "a61cbfa506245869d3392bac4b79fe39f61b12ff9f2a4d6bcc1b2b501cce0d0f"),
    (2, SpihtSettings(wavelet="bior4.4", mode="symmetric"), 2, 4000,
     "bdc2607aa590c1732f65dce9c5ba02782a52e0030f790d26b2dd8d71e7bc7bfb"),
    (3, SpihtSettings(color_model="ipt",
                      per_channel_quant_scales=[100, 20, 20],
                      quantization_scale=1.0), 3, 6000,
     "b55146498451f72ee80b7977e3181f18fc9fb7131c699613bcd2ca80f924664c"),
]


def _digest(er):
    h = hashlib.sha256()
    h.update(er.encoded_bytes)
    h.update(bytes([er.max_n]))
    return h.hexdigest()


@pytest.mark.parametrize("case", range(len(GOLDEN)))
def test_golden_streams(case, monkeypatch):
    seed, settings, level, max_bits, expect = GOLDEN[case]
    monkeypatch.setattr(transform, "_BACKEND", "numpy")
    er = spiht_tpu.encode_image(_image(seed), settings, level, max_bits)
    got = _digest(er)
    assert got == expect, f"golden stream changed: case {case}: {got}"


def test_backends_agree_on_golden_inputs(monkeypatch):
    """native backend produces the same streams as the numpy reference on
    the golden inputs (f64 bit-compat)."""
    seed, settings, level, max_bits, _ = GOLDEN[0]
    im = _image(seed)
    monkeypatch.setattr(transform, "_BACKEND", "numpy")
    a = spiht_tpu.encode_image(im, settings, level, max_bits)
    monkeypatch.setattr(transform, "_BACKEND", "native")
    b = spiht_tpu.encode_image(im, settings, level, max_bits)
    assert a.encoded_bytes == b.encoded_bytes
