"""Filter-bank construction tests.

Anchored against independently known PyWavelets filter values and the
mathematical properties (lowpass normalization, PR/biorthogonality).
"""

import math

import numpy as np
import pytest

from spiht_tpu.wavelets.filters import (
    build_wavelet,
    dwt_coeff_len,
    dwt_max_level,
    wavelist,
)

SQRT2 = math.sqrt(2.0)


def test_haar():
    w = build_wavelet("haar")
    h = 1 / SQRT2
    assert np.allclose(w.dec_lo, [h, h])
    assert np.allclose(w.dec_hi, [-h, h])
    assert np.allclose(w.rec_lo, [h, h])
    assert np.allclose(w.rec_hi, [h, -h])


def test_db2_known_values():
    w = build_wavelet("db2")
    expected_dec_lo = [
        0.48296291314469025,
        0.836516303737469,
        0.22414386804185735,
        -0.12940952255092145,
    ]
    assert np.allclose(w.dec_lo, expected_dec_lo, atol=1e-12)
    assert np.allclose(w.rec_lo, expected_dec_lo[::-1], atol=1e-12)


def test_bior22_known_values():
    w = build_wavelet("bior2.2")
    a, b, c = 0.1767766952966369, 0.3535533905932738, 1.0606601717798214
    assert np.allclose(w.dec_lo, [0, -a, b, c, b, -a], atol=1e-12)
    assert np.allclose(w.rec_lo, [0, b, 2 * b, b, 0, 0], atol=1e-12)
    assert np.allclose(w.dec_hi, [0, b, -2 * b, b, 0, 0], atol=1e-12)


def test_bior44_is_cdf97():
    """bior4.4 must be the published CDF 9/7 pair (JPEG2000 irrational)."""
    w = build_wavelet("bior4.4")
    assert abs(w.dec_lo[5] - 0.8526986790088938) < 1e-12
    assert abs(w.dec_lo[1] - 0.03782845550726404) < 1e-12
    assert abs(w.rec_lo[4] - 0.7884856164055829) < 1e-10
    assert abs(w.rec_lo[1] + 0.06453888262869706) < 1e-10


def test_bior68_known_values():
    w = build_wavelet("bior6.8")
    assert w.dec_len == 18
    assert abs(w.dec_lo[1] - 0.0019088317364812906) < 1e-12
    assert abs(w.dec_lo[9] - 0.8259229974584023) < 1e-12
    assert abs(w.rec_lo[3] - 0.014426282505624435) < 1e-12


@pytest.mark.parametrize("name", wavelist())
def test_lowpass_normalization(name):
    w = build_wavelet(name)
    assert abs(sum(w.dec_lo) - SQRT2) < 1e-8
    assert abs(sum(w.rec_lo) - SQRT2) < 1e-8
    # highpass has zero DC
    assert abs(sum(w.dec_hi)) < 1e-8
    assert abs(sum(w.rec_hi)) < 1e-8


@pytest.mark.parametrize("name", ["haar", "db2", "db4", "bior2.2", "bior4.4", "bior6.8"])
def test_biorthogonality(name):
    """sum_k dec_lo[k] rec_lo[k + 2m] = delta_{m0}-style PR conditions."""
    w = build_wavelet(name)
    dl = np.asarray(w.dec_lo)
    rl = np.asarray(w.rec_lo)
    # product filter P(z) = H(z) G(z) must be halfband: its taps at the
    # center-lag parity are a single 1 (PR condition)
    p = np.convolve(dl, rl)
    center = np.argmax(np.abs(p))
    sub = p[center % 2 :: 2]
    expect = np.zeros_like(sub)
    expect[center // 2] = 1.0
    assert np.allclose(sub, expect, atol=1e-8)


def test_dwt_max_level():
    assert dwt_max_level(512, 6) == 6
    assert dwt_max_level(16, 2) == 4
    assert dwt_max_level(4, 6) == 0


def test_dwt_coeff_len():
    assert dwt_coeff_len(100, 6, "reflect") == 52
    assert dwt_coeff_len(7, 2, "zero") == 4


def test_unsupported_raises():
    with pytest.raises(ValueError):
        build_wavelet("bior5.5")
    with pytest.raises(ValueError):
        build_wavelet("nope")
