"""JAX color model conversions (device-resident, jittable).

Mirrors ``spiht_tpu.color.models`` (the trusted numpy host implementations,
themselves covering the reference's colour-science usage at
spiht/color_models.py:6-13). Operates channels-FIRST over (..., C, H, W)
so batches ride along; the 3x3 matrix products contract over the channel
axis via einsum (MXU-friendly for large spatial extents).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import models as _nm

__all__ = ["convert", "SUPPORTED_MODELS"]

SUPPORTED_MODELS = _nm.SUPPORTED_MODELS


def _apply_mat(im, M):
    # im: (..., C, H, W); M: (3, 3) numpy constant. Precision HIGHEST: TPU
    # einsum otherwise drops to bf16 passes, perturbing quantization.
    return jnp.einsum(
        "oc,...chw->...ohw",
        jnp.asarray(M, dtype=im.dtype),
        im,
        precision=jax.lax.Precision.HIGHEST,
    )


def _signed_pow(x, p):
    return jnp.sign(x) * jnp.abs(x) ** p


def _ipt_from_rgb(im):
    xyz = _apply_mat(im, _nm.RGB_TO_XYZ)
    lms = _apply_mat(xyz, _nm.XYZ_TO_LMS_IPT)
    return _apply_mat(_signed_pow(lms, _nm.IPT_EXP), _nm.LMS_TO_IPT)


def _rgb_from_ipt(im):
    lms_p = _apply_mat(im, _nm.LMS_FROM_IPT)
    lms = _signed_pow(lms_p, 1.0 / _nm.IPT_EXP)
    return _apply_mat(_apply_mat(lms, _nm.XYZ_FROM_LMS_IPT), _nm.XYZ_TO_RGB)


def _lab_f(t, dtype):
    d = 6.0 / 29.0
    return jnp.where(t > d**3, jnp.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def _lab_finv(t):
    d = 6.0 / 29.0
    return jnp.where(t > d, t**3, 3 * d * d * (t - 4.0 / 29.0))


def _lab_from_rgb(im):
    xyz = _apply_mat(im, _nm.RGB_TO_XYZ)
    white = jnp.asarray(_nm.D65_WHITE, dtype=im.dtype)
    xr = xyz / white[..., :, None, None]
    f = _lab_f(xr, im.dtype)
    fx, fy, fz = f[..., 0, :, :], f[..., 1, :, :], f[..., 2, :, :]
    return jnp.stack(
        [116 * fy - 16, 500 * (fx - fy), 200 * (fy - fz)], axis=-3
    )


def _rgb_from_lab(im):
    L, a, b = im[..., 0, :, :], im[..., 1, :, :], im[..., 2, :, :]
    fy = (L + 16) / 116
    fx = fy + a / 500
    fz = fy - b / 200
    xyz = jnp.stack([_lab_finv(fx), _lab_finv(fy), _lab_finv(fz)], axis=-3)
    white = jnp.asarray(_nm.D65_WHITE, dtype=im.dtype)
    return _apply_mat(xyz * white[..., :, None, None], _nm.XYZ_TO_RGB)


# round-2 models share the array-module-generic channels-last core in
# models.py (xp=jnp); only the axis shuffle differs from the host path
def _via_cl(fn_chain):
    def run(im):
        x = jnp.moveaxis(im, -3, -1)
        for fn in fn_chain:
            x = fn(x, xp=jnp)
        return jnp.moveaxis(x, -1, -3)

    return run


def _xyz_fwd(x, xp=jnp):
    return x @ xp.asarray(_nm.RGB_TO_XYZ.T, dtype=x.dtype)


def _xyz_inv(x, xp=jnp):
    return x @ xp.asarray(_nm.XYZ_TO_RGB.T, dtype=x.dtype)


def _lab_fwd_cl(x, xp=jnp):
    white = xp.asarray(_nm.D65_WHITE, dtype=x.dtype)
    xr = x / white
    d = 6.0 / 29.0
    f = xp.where(xr > d**3, xp.cbrt(xr), xr / (3 * d * d) + 4.0 / 29.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    return xp.stack(
        [116 * fy - 16, 500 * (fx - fy), 200 * (fy - fz)], axis=-1
    )


def _lab_inv_cl(x, xp=jnp):
    L, a, b = x[..., 0], x[..., 1], x[..., 2]
    fy = (L + 16) / 116
    fx = fy + a / 500
    fz = fy - b / 200
    d = 6.0 / 29.0
    inv = lambda t: xp.where(t > d, t**3, 3 * d * d * (t - 4.0 / 29.0))
    white = xp.asarray(_nm.D65_WHITE, dtype=x.dtype)
    return xp.stack([inv(fx), inv(fy), inv(fz)], axis=-1) * white


_FORWARD = {
    "ipt": _ipt_from_rgb,
    "cie xyz": lambda x: _apply_mat(x, _nm.RGB_TO_XYZ),
    "xyz": lambda x: _apply_mat(x, _nm.RGB_TO_XYZ),
    "cie lab": _lab_from_rgb,
    "lab": _lab_from_rgb,
    "ycbcr": lambda x: _apply_mat(x, _nm.RGB_TO_YCBCR),
    "oklab": lambda x: _apply_mat(
        _signed_pow(_apply_mat(x, _nm.RGB_TO_LMS_OKLAB), 1.0 / 3.0),
        _nm.LMS_TO_OKLAB,
    ),
    "rgb": lambda x: x,
    "jzazbz": _via_cl([_xyz_fwd, _nm.jzazbz_from_xyz]),
    "ictcp": _via_cl([_xyz_fwd, _nm.ictcp_from_xyz]),
    "cie xyy": _via_cl([_xyz_fwd, _nm.xyy_from_xyz]),
    "cie luv": _via_cl([_xyz_fwd, _nm.luv_from_xyz]),
    "din99": _via_cl([_xyz_fwd, _lab_fwd_cl, _nm.din99_from_lab]),
    "hunter lab": _via_cl([_xyz_fwd, _nm.hunter_lab_from_xyz]),
    "cam16ucs": _via_cl([_xyz_fwd, _nm.cam16ucs_from_xyz]),
    "cam16lcd": _via_cl(
        [_xyz_fwd,
         lambda x, xp: _nm.cam16ucs_from_xyz(x, xp=xp, variant="lcd")]
    ),
    "cam16scd": _via_cl(
        [_xyz_fwd,
         lambda x, xp: _nm.cam16ucs_from_xyz(x, xp=xp, variant="scd")]
    ),
    "cie ucs": _via_cl([_xyz_fwd, _nm.ucs_from_xyz]),
    "cie uvw": _via_cl([_xyz_fwd, _nm.uvw_from_xyz]),
    "hunter rdab": _via_cl([_xyz_fwd, _nm.hunter_rdab_from_xyz]),
    "prolab": _via_cl([_xyz_fwd, _nm.prolab_from_xyz]),
    "yrg": _via_cl([_xyz_fwd, _nm.yrg_from_xyz]),
    "igpgtg": _via_cl([_xyz_fwd, _nm.igpgtg_from_xyz]),
    "icacb": _via_cl([_xyz_fwd, _nm.icacb_from_xyz]),
    "ipt ragoo": _via_cl([_xyz_fwd, _nm.ipt_ragoo_from_xyz]),
    "ycocg": lambda x: _apply_mat(x, _nm.RGB_TO_YCOCG),
    "cam02ucs": _via_cl([_xyz_fwd, _nm.cam02ucs_from_xyz]),
    "cam02lcd": _via_cl(
        [_xyz_fwd,
         lambda x, xp: _nm.cam02ucs_from_xyz(x, xp=xp, variant="lcd")]
    ),
    "cam02scd": _via_cl(
        [_xyz_fwd,
         lambda x, xp: _nm.cam02ucs_from_xyz(x, xp=xp, variant="scd")]
    ),
    "hdr-cielab": _via_cl([_xyz_fwd, _nm.hdr_cielab_from_xyz]),
    "hdr-ipt": _via_cl([_xyz_fwd, _nm.hdr_ipt_from_xyz]),
    "osa ucs": _via_cl([_xyz_fwd, _nm.osa_ucs_from_xyz]),
}
_INVERSE = {
    "ipt": _rgb_from_ipt,
    "cie xyz": lambda x: _apply_mat(x, _nm.XYZ_TO_RGB),
    "xyz": lambda x: _apply_mat(x, _nm.XYZ_TO_RGB),
    "cie lab": _rgb_from_lab,
    "lab": _rgb_from_lab,
    "ycbcr": lambda x: _apply_mat(x, _nm.YCBCR_TO_RGB),
    "oklab": lambda x: _apply_mat(
        _apply_mat(x, _nm.LMS_FROM_OKLAB) ** 3, _nm.RGB_FROM_LMS_OKLAB
    ),
    "rgb": lambda x: x,
    "jzazbz": _via_cl([_nm.xyz_from_jzazbz, _xyz_inv]),
    "ictcp": _via_cl([_nm.xyz_from_ictcp, _xyz_inv]),
    "cie xyy": _via_cl([_nm.xyz_from_xyy, _xyz_inv]),
    "cie luv": _via_cl([_nm.xyz_from_luv, _xyz_inv]),
    "din99": _via_cl([_nm.lab_from_din99, _lab_inv_cl, _xyz_inv]),
    "hunter lab": _via_cl([_nm.xyz_from_hunter_lab, _xyz_inv]),
    "cam16ucs": _via_cl([_nm.xyz_from_cam16ucs, _xyz_inv]),
    "cam16lcd": _via_cl(
        [lambda x, xp: _nm.xyz_from_cam16ucs(x, xp=xp, variant="lcd"),
         _xyz_inv]
    ),
    "cam16scd": _via_cl(
        [lambda x, xp: _nm.xyz_from_cam16ucs(x, xp=xp, variant="scd"),
         _xyz_inv]
    ),
    "cie ucs": _via_cl([_nm.xyz_from_ucs, _xyz_inv]),
    "cie uvw": _via_cl([_nm.xyz_from_uvw, _xyz_inv]),
    "hunter rdab": _via_cl([_nm.xyz_from_hunter_rdab, _xyz_inv]),
    "prolab": _via_cl([_nm.xyz_from_prolab, _xyz_inv]),
    "yrg": _via_cl([_nm.xyz_from_yrg, _xyz_inv]),
    "igpgtg": _via_cl([_nm.xyz_from_igpgtg, _xyz_inv]),
    "icacb": _via_cl([_nm.xyz_from_icacb, _xyz_inv]),
    "ipt ragoo": _via_cl([_nm.xyz_from_ipt_ragoo, _xyz_inv]),
    "ycocg": lambda x: _apply_mat(x, _nm.YCOCG_TO_RGB),
    "cam02ucs": _via_cl([_nm.xyz_from_cam02ucs, _xyz_inv]),
    "cam02lcd": _via_cl(
        [lambda x, xp: _nm.xyz_from_cam02ucs(x, xp=xp, variant="lcd"),
         _xyz_inv]
    ),
    "cam02scd": _via_cl(
        [lambda x, xp: _nm.xyz_from_cam02ucs(x, xp=xp, variant="scd"),
         _xyz_inv]
    ),
    "hdr-cielab": _via_cl([_nm.xyz_from_hdr_cielab, _xyz_inv]),
    "hdr-ipt": _via_cl([_nm.xyz_from_hdr_ipt, _xyz_inv]),
    "osa ucs": _via_cl([_nm.xyz_from_osa_ucs, _xyz_inv]),
}


def convert(im: jnp.ndarray, src: str, dest: str) -> jnp.ndarray:
    """Convert a (..., C, H, W) image between color models (jittable)."""
    src_l, dest_l = src.lower(), dest.lower()
    for m in (src_l, dest_l):
        if m not in SUPPORTED_MODELS:
            raise ValueError(
                f"{m!r} is not a supported color model. "
                f"Supported models are {sorted(SUPPORTED_MODELS)}"
            )
    if src_l == "rgb":
        return _FORWARD[dest_l](im)
    if dest_l == "rgb":
        return _INVERSE[src_l](im)
    return _FORWARD[dest_l](_INVERSE[src_l](im))
