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


# ---------------------------------------------------------------------------
# round 2: extended model coverage (reference accepts any
# colour.COLOURSPACE_MODELS entry, color_models.py:4-13)
# ---------------------------------------------------------------------------

NEW_MODELS = ["jzazbz", "ictcp", "cie xyy", "cie luv", "din99",
              "hunter lab", "cam16ucs", "cam16lcd", "cam16scd",
              "cie ucs", "cie uvw"]


@pytest.mark.parametrize("model", NEW_MODELS + ["oklab"])
def test_roundtrip_new_models(rng, model):
    im = rng.uniform(0.01, 1.0, size=(3, 16, 24))
    out = cm.convert(im, "RGB", model)
    back = cm.convert(out, model, "RGB")
    assert np.allclose(back, im, atol=1e-6), model


@pytest.mark.parametrize("model", NEW_MODELS)
def test_jax_matches_numpy_new_models(rng, model):
    from spiht_tpu.color import jax_models as jm
    import jax.numpy as jnp

    im = rng.uniform(0.01, 1.0, size=(3, 12, 20))
    want = cm.convert(im, "RGB", model)
    got = np.asarray(jm.convert(jnp.asarray(im), "RGB", model))
    np.testing.assert_allclose(got, want, atol=1e-10, err_msg=model)
    back = np.asarray(jm.convert(jnp.asarray(want), model, "RGB"))
    np.testing.assert_allclose(back, im, atol=1e-6, err_msg=model)


def test_jzazbz_achromatic_axis():
    """Neutral grays map to az=bz=0 and monotonically increasing Jz."""
    grays = np.linspace(0.05, 1.0, 8)
    im = np.ones((3, 1, 8)) * grays[None, None, :]
    out = cm.convert(im, "RGB", "jzazbz")
    # the published Jzazbz matrices are only approximately white-balanced
    # (D65 gray leaves ~2e-4 residual chroma; colour-science agrees)
    assert np.all(np.abs(out[1]) < 5e-4)
    assert np.all(np.abs(out[2]) < 5e-4)
    assert np.all(np.diff(out[0, 0]) > 0)


def test_luv_known_white():
    white = np.ones((3, 1, 1))
    luv = cm.convert(white, "RGB", "cie luv")
    assert abs(luv[0, 0, 0] - 100.0) < 1e-6
    assert abs(luv[1, 0, 0]) < 1e-6
    assert abs(luv[2, 0, 0]) < 1e-6


def test_codec_roundtrip_new_color_model(rng):
    """Full encode/decode through a round-2 color model."""
    import spiht_tpu
    from spiht_tpu import SpihtSettings

    settings = SpihtSettings(
        color_model="JzAzBz",
        quantization_scale=1.0,
        per_channel_quant_scales=[10000.0, 20000.0, 20000.0],
    )
    im = rng.random((3, 48, 48))
    er = spiht_tpu.encode_image(im, settings, level=2)
    rec = np.asarray(spiht_tpu.decode_image(er, settings))[:, :48, :48]
    assert np.quantile(np.abs(rec - im), 0.99) < 0.1


# ---------------------------------------------------------------------------
# round 3: full colour.COLOURSPACE_MODELS coverage (verdict item 6)
# ---------------------------------------------------------------------------

R3_MODELS = ["hunter rdab", "prolab", "yrg", "igpgtg", "icacb",
             "ipt ragoo", "ycocg", "cam02ucs", "cam02lcd", "cam02scd",
             "hdr-cielab", "hdr-ipt", "osa ucs"]


@pytest.mark.parametrize("model", R3_MODELS)
def test_roundtrip_r3_models(rng, model):
    im = rng.uniform(0.01, 1.0, size=(3, 16, 24))
    out = cm.convert(im, "RGB", model)
    back = cm.convert(out, model, "RGB")
    assert np.allclose(back, im, atol=1e-6), model


@pytest.mark.parametrize("model", R3_MODELS)
def test_jax_matches_numpy_r3_models(rng, model):
    from spiht_tpu.color import jax_models as jm
    import jax.numpy as jnp

    im = rng.uniform(0.01, 1.0, size=(3, 12, 20))
    want = cm.convert(im, "RGB", model)
    got = np.asarray(jm.convert(jnp.asarray(im), "RGB", model))
    np.testing.assert_allclose(got, want, atol=1e-9, err_msg=model)
    back = np.asarray(jm.convert(jnp.asarray(want), model, "RGB"))
    np.testing.assert_allclose(back, im, atol=1e-6, err_msg=model)


def test_reference_model_names_accepted():
    """The exact colour.COLOURSPACE_MODELS names (colour-science 0.4.4,
    the pinned reference dep) all convert: capability parity for a user
    migrating with any reference-accepted color_model string."""
    colourspace_models = [
        "CAM02LCD", "CAM02SCD", "CAM02UCS", "CAM16LCD", "CAM16SCD",
        "CAM16UCS", "CIE Lab", "CIE Luv", "CIE UCS", "CIE UVW",
        "CIE XYZ", "CIE xyY", "DIN99", "Hunter Lab", "Hunter Rdab",
        "ICaCb", "ICtCp", "IPT", "IPT Ragoo", "IgPgTg", "Jzazbz",
        "OSA UCS", "Oklab", "ProLab", "Yrg", "hdr-CIELAB", "hdr-IPT",
    ]
    im = np.full((3, 2, 2), 0.5)
    for name in colourspace_models:
        out = cm.convert(im, "RGB", name)
        back = cm.convert(out, name, "RGB")
        assert np.allclose(back, im, atol=1e-6), name


def test_prolab_white_point():
    """ProLab's projective matrix maps the white point to exactly
    (100, 0, 0) — a built-in consistency check on the published
    coefficients (Konovalenko et al. 2021)."""
    white = np.ones((3, 1, 1))
    pl = cm.convert(white, "RGB", "prolab")
    np.testing.assert_allclose(pl[:, 0, 0], [100.0, 0.0, 0.0], atol=1e-10)


def test_hunter_rdab_relates_to_hunter_lab():
    """Rd = (L_hunter/100)^2 * 100 and the chroma terms differ by the
    extra sqrt(Y/Yn) normalization."""
    rng = np.random.default_rng(5)
    im = rng.uniform(0.05, 1.0, size=(3, 4, 6))
    lab = cm.convert(im, "RGB", "hunter lab")
    rdab = cm.convert(im, "RGB", "hunter rdab")
    np.testing.assert_allclose(rdab[0], lab[0] ** 2 / 100.0, atol=1e-9)
    sq = lab[0] / 100.0
    np.testing.assert_allclose(rdab[1], lab[1] / sq, atol=1e-9)
    np.testing.assert_allclose(rdab[2], lab[2] / sq, atol=1e-9)


def test_hdr_models_achromatic_and_monotone():
    grays = np.linspace(0.05, 1.0, 8)
    im = np.ones((3, 1, 8)) * grays[None, None, :]
    for model in ("hdr-cielab", "hdr-ipt"):
        out = cm.convert(im, "RGB", model)
        # hdr-IPT leaves ~8e-3 residual chroma on the D65 gray axis (the
        # IPT LMS of D65 white is not exactly (1,1,1)); the lightness
        # scale is ~0-250 so this is <1e-4 relative
        assert np.all(np.abs(out[1]) < 2e-2), model
        assert np.all(np.abs(out[2]) < 2e-2), model
        assert np.all(np.diff(out[0, 0]) > 0), model


def test_osa_ucs_neutral_and_lightness_sign():
    """OSA UCS: mid gray sits near j=g=0; L increases with luminance
    and is negative for dark grays (the scale is centered near Y0=30)."""
    g = np.ones((3, 1, 1)) * 0.3
    out = cm.convert(g, "RGB", "osa ucs")
    assert abs(out[1, 0, 0]) < 0.5 and abs(out[2, 0, 0]) < 0.5
    grays = np.linspace(0.05, 1.0, 8)
    im = np.ones((3, 1, 8)) * grays[None, None, :]
    L = cm.convert(im, "RGB", "osa ucs")[0, 0]
    assert np.all(np.diff(L) > 0)
    assert L[0] < 0


def test_osa_ucs_inverse_near_y0_kink():
    """The 0.042*cbrt(Y0-30) term of the OSA lightness has infinite
    slope at Y0=30; a Newton solve for Y0 stalls there (measured 9e-3
    round-trip error before the bisection fix). Pin pixels whose Y0
    lands on/near the kink plus a dense random sweep."""
    # this exact pixel hit Y0=30.004 and failed at HEAD~ (err 9.1e-3)
    kink_px = np.array([0.0282725, 0.2303600, 0.9209923])
    rng = np.random.default_rng(1234)
    im = rng.uniform(0.0, 1.0, size=(3, 16, 16))
    im[:, 0, 0] = kink_px
    # spread a gray ramp through the Y0~30 band (Y ~ 0.25-0.35)
    im[:, 1, :] = np.linspace(0.22, 0.38, 16)[None, :]
    back = cm.convert(cm.convert(im, "RGB", "osa ucs"), "osa ucs", "RGB")
    assert np.abs(back - im).max() < 1e-9


def test_cam16_variants_differ_only_in_luo_coefficients(rng):
    """LCD/SCD share CAM16 appearance correlates with UCS; the a'b'
    plane rescales by the c2 compression and J' by 1/KL."""
    im = rng.uniform(0.05, 1.0, size=(3, 6, 10))
    ucs = cm.convert(im, "RGB", "cam16ucs")
    lcd = cm.convert(im, "RGB", "cam16lcd")
    scd = cm.convert(im, "RGB", "cam16scd")
    # hue angles agree across variants (M' scaling is radial)
    for v in (lcd, scd):
        np.testing.assert_allclose(
            np.arctan2(v[2], v[1]), np.arctan2(ucs[2], ucs[1]), atol=1e-8
        )
    # J' ratio is exactly 1/KL
    np.testing.assert_allclose(lcd[0], ucs[0] / 0.77, atol=1e-8)
    np.testing.assert_allclose(scd[0], ucs[0] / 1.24, atol=1e-8)


def test_cie_ucs_uvw_known_values():
    """White: UCS of D65 white equals (2X/3, Y, (-X+3Y+Z)/2); UVW of
    the white point is (0, 0, 8) since Y=100 gives W*=25*100^(1/3)-17
    and the chromaticity difference vanishes."""
    white = np.ones((3, 1, 1))
    xyz = cm.convert(white, "RGB", "cie xyz")
    ucs = cm.convert(white, "RGB", "cie ucs")
    X, Y, Z = xyz[0, 0, 0], xyz[1, 0, 0], xyz[2, 0, 0]
    np.testing.assert_allclose(ucs[0, 0, 0], 2 * X / 3, atol=1e-12)
    np.testing.assert_allclose(ucs[1, 0, 0], Y, atol=1e-12)
    np.testing.assert_allclose(
        ucs[2, 0, 0], 0.5 * (-X + 3 * Y + Z), atol=1e-12
    )
    uvw = cm.convert(white, "RGB", "cie uvw")
    assert abs(uvw[0, 0, 0]) < 1e-9 and abs(uvw[1, 0, 0]) < 1e-9
    np.testing.assert_allclose(
        uvw[2, 0, 0], 25.0 * 100.0 ** (1 / 3) - 17.0, atol=1e-9
    )
