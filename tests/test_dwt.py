"""Reference (numpy) DWT tests: perfect reconstruction, shapes, layout."""

import numpy as np
import pytest

from spiht_tpu.wavelets import ref_dwt as R
from spiht_tpu.wavelets.filters import build_wavelet, dwt_coeff_len
from spiht_tpu.wavelets.geometry import get_slices_and_h_w
from spiht_tpu.settings import SpihtSettings

WAVELETS = ["haar", "db2", "db4", "bior2.2", "bior4.4", "bior6.8", "bior1.3", "rbio2.2"]
MODES = [
    "zero",
    "constant",
    "symmetric",
    "reflect",
    "periodic",
    "smooth",
    "antisymmetric",
    "antireflect",
]


@pytest.mark.parametrize("wname", WAVELETS)
@pytest.mark.parametrize("mode", ["reflect", "symmetric", "zero", "periodic"])
@pytest.mark.parametrize("n", [8, 9, 17, 64])
def test_dwt1d_perfect_reconstruction(rng, wname, mode, n):
    x = rng.normal(size=(3, n))
    cA, cD = R.dwt1d(x, wname, mode)
    w = build_wavelet(wname)
    assert cA.shape[-1] == dwt_coeff_len(n, w.dec_len, mode)
    y = R.idwt1d(cA, cD, wname, mode)
    assert np.allclose(y[..., :n], x, atol=1e-8)


@pytest.mark.parametrize("mode", MODES)
def test_all_modes_pr(rng, mode):
    x = rng.normal(size=(2, 23))
    cA, cD = R.dwt1d(x, "bior2.2", mode)
    y = R.idwt1d(cA, cD, "bior2.2", mode)
    assert np.allclose(y[..., :23], x, atol=1e-8)


@pytest.mark.parametrize("wname", ["bior2.2", "bior4.4", "bior6.8", "db2"])
@pytest.mark.parametrize("shape", [(1, 64, 64), (3, 37, 53), (2, 100, 31)])
def test_wavedec2_roundtrip(rng, wname, shape):
    x = rng.normal(size=shape)
    coeffs = R.wavedec2(x, wname, mode="reflect")
    y = R.waverec2(coeffs, wname, mode="reflect")
    assert np.allclose(y[..., : shape[-2], : shape[-1]], x, atol=1e-8)


def test_coeffs_to_array_layout(rng):
    x = rng.normal(size=(2, 64, 48))
    coeffs = R.wavedec2(x, "bior2.2", mode="reflect", level=3)
    arr, slices = R.coeffs_to_array(coeffs)
    # LL block round-trips
    assert np.allclose(arr[slices[0]], coeffs[0])
    for d, sl in zip(coeffs[1:], slices[1:]):
        for k in ("ad", "da", "dd"):
            assert np.allclose(arr[sl[k]], d[k])
    back = R.array_to_coeffs(arr, slices)
    y = R.waverec2(back, "bior2.2", mode="reflect")
    assert np.allclose(y[..., :64, :48], x, atol=1e-8)


def test_geometry_matches_coeffs_to_array(rng):
    """get_slices_and_h_w must agree with the actual packed layout."""
    for (h, w) in [(64, 64), (37, 53), (101, 67)]:
        x = rng.normal(size=(1, h, w))
        s = SpihtSettings(wavelet="bior2.2", mode="reflect")
        coeffs = R.wavedec2(x, s.wavelet, mode=s.mode)
        arr, slices = R.coeffs_to_array(coeffs)
        gslices, enc_h, enc_w = get_slices_and_h_w(h, w, s, None)
        assert arr.shape[-2:] == (enc_h, enc_w)
        assert len(gslices) == len(slices)
        for a, b in zip(gslices[1:], slices[1:]):
            for k in ("ad", "da", "dd"):
                assert a[k][1] == b[k][1] and a[k][2] == b[k][2]


def test_wavedecn_shapes_structure():
    shapes = R.wavedecn_shapes((1, 64, 64), "bior2.2", "reflect", level=3)
    assert len(shapes) == 4
    assert shapes[0][0] == 1
    # each level halves-ish with boundary growth
    h = 64
    for lvl in shapes[1:][::-1]:
        h = (h + 6 - 1) // 2
    assert shapes[0][1] == h


def test_auto_level_matches_formula():
    # pywt default level: min over axes of floor(log2(n / (declen - 1)))
    shapes = R.wavedecn_shapes((1, 512, 512), "bior2.2", "reflect", level=None)
    assert len(shapes) - 1 == 6


def test_periodization_unsupported(rng):
    x = rng.normal(size=(1, 16))
    with pytest.raises(NotImplementedError):
        R.dwt1d(x, "bior2.2", "periodization")
