"""Color model conversion tests."""

import numpy as np
import pytest

from spiht_tpu.color import models as cm


@pytest.mark.parametrize("model", ["ipt", "xyz", "lab", "ycbcr"])
def test_roundtrip(rng, model):
    im = rng.uniform(0.01, 1.0, size=(3, 16, 24))
    out = cm.convert(im, "RGB", model)
    back = cm.convert(out, model, "RGB")
    assert np.allclose(back, im, atol=1e-8)


def test_ipt_known_white():
    # D65 white (RGB=1) must map to I~1, P~0, T~0
    white = np.ones((3, 1, 1))
    ipt = cm.convert(white, "RGB", "ipt")
    assert abs(ipt[0, 0, 0] - 1.0) < 0.02
    assert abs(ipt[1, 0, 0]) < 0.02
    assert abs(ipt[2, 0, 0]) < 0.02


def test_ipt_channel_energy(rng):
    """I carries the luminance: gray ramps live in channel 0."""
    ramp = np.linspace(0, 1, 32).reshape(1, 1, 32) * np.ones((3, 4, 32))
    ipt = cm.convert(ramp, "RGB", "ipt")
    assert np.abs(ipt[0]).mean() > 10 * np.abs(ipt[1]).mean()
    assert np.abs(ipt[0]).mean() > 10 * np.abs(ipt[2]).mean()


def test_unsupported_raises():
    with pytest.raises(ValueError):
        cm.convert(np.ones((3, 2, 2)), "RGB", "hsv-nope")
