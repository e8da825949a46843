"""Color model conversions (numpy host implementations).

The reference delegates to colour-science's conversion graph
(spiht/color_models.py:6-13) over channels-last data; the recommended model
for natural images is IPT (reference README.md:25-26). This module
implements the models natively. Channels-FIRST (C, H, W) in and out, like
the reference's wrapper.

Note on 'RGB': following the reference's usage, pixel values loaded from
image files are fed to the conversion as-is (no CCTF/gamma decode step),
i.e. 'RGB' denotes the working RGB space with sRGB/D65 primaries.

JAX mirrors of the forward/inverse transforms live in
``spiht_tpu.color.jax_models``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["convert", "SUPPORTED_MODELS", "ipt_from_rgb", "rgb_from_ipt"]

# sRGB (D65) primaries -> XYZ, full-precision derivation
RGB_TO_XYZ = np.array(
    [
        [0.4123907992659595, 0.35758433938387796, 0.18048078840183429],
        [0.21263900587151036, 0.7151686787677559, 0.07219231536073371],
        [0.01933081871559185, 0.11919477979462599, 0.9505321522496607],
    ]
)
XYZ_TO_RGB = np.linalg.inv(RGB_TO_XYZ)

# IPT (Ebner & Fairchild 1998): XYZ(D65) -> LMS -> LMS' (power 0.43) -> IPT
XYZ_TO_LMS_IPT = np.array(
    [
        [0.4002, 0.7075, -0.0807],
        [-0.2280, 1.1500, 0.0612],
        [0.0000, 0.0000, 0.9184],
    ]
)
LMS_TO_IPT = np.array(
    [
        [0.4000, 0.4000, 0.2000],
        [4.4550, -4.8510, 0.3960],
        [0.8056, 0.3572, -1.1628],
    ]
)
LMS_FROM_IPT = np.linalg.inv(LMS_TO_IPT)
XYZ_FROM_LMS_IPT = np.linalg.inv(XYZ_TO_LMS_IPT)
IPT_EXP = 0.43

# CIE Lab constants (D65 white)
D65_WHITE = RGB_TO_XYZ @ np.ones(3)

# Oklab (Björn Ottosson, 2020, public domain): RGB -> LMS -> cbrt -> Lab.
# Applied to the working RGB values as-is (no CCTF step), consistent with
# this module's 'RGB' convention.
RGB_TO_LMS_OKLAB = np.array(
    [
        [0.4122214708, 0.5363325363, 0.0514459929],
        [0.2119034982, 0.6806995451, 0.1073969566],
        [0.0883024619, 0.2817188376, 0.6299787005],
    ]
)
LMS_TO_OKLAB = np.array(
    [
        [0.2104542553, 0.7936177850, -0.0040720468],
        [1.9779984951, -2.4285922050, 0.4505937099],
        [0.0259040371, 0.7827717662, -0.8086757660],
    ]
)
LMS_FROM_OKLAB = np.linalg.inv(LMS_TO_OKLAB)
RGB_FROM_LMS_OKLAB = np.linalg.inv(RGB_TO_LMS_OKLAB)

# ITU-R BT.601 YCbCr (full range)
RGB_TO_YCBCR = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168735891647856, -0.331264108352144, 0.5],
        [0.5, -0.418687589158345, -0.081312410841655],
    ]
)
YCBCR_TO_RGB = np.linalg.inv(RGB_TO_YCBCR)


def _apply_mat(im_cl, M):
    return im_cl @ M.T


def _signed_pow(x, p):
    return np.sign(x) * np.abs(x) ** p


def xyz_from_rgb(im_cl):
    return _apply_mat(im_cl, RGB_TO_XYZ)


def rgb_from_xyz(im_cl):
    return _apply_mat(im_cl, XYZ_TO_RGB)


def ipt_from_xyz(im_cl):
    lms = _apply_mat(im_cl, XYZ_TO_LMS_IPT)
    return _apply_mat(_signed_pow(lms, IPT_EXP), LMS_TO_IPT)


def xyz_from_ipt(im_cl):
    lms_p = _apply_mat(im_cl, LMS_FROM_IPT)
    return _apply_mat(_signed_pow(lms_p, 1.0 / IPT_EXP), XYZ_FROM_LMS_IPT)


def ipt_from_rgb(im_cl):
    return ipt_from_xyz(xyz_from_rgb(im_cl))


def rgb_from_ipt(im_cl):
    return rgb_from_xyz(xyz_from_ipt(im_cl))


def _signed_cbrt(x):
    return np.sign(x) * np.abs(x) ** (1.0 / 3.0)


def oklab_from_rgb(im_cl):
    lms = _apply_mat(im_cl, RGB_TO_LMS_OKLAB)
    return _apply_mat(_signed_cbrt(lms), LMS_TO_OKLAB)


def rgb_from_oklab(im_cl):
    lms_p = _apply_mat(im_cl, LMS_FROM_OKLAB)
    return _apply_mat(lms_p**3, RGB_FROM_LMS_OKLAB)


def _lab_f(t):
    d = 6.0 / 29.0
    return np.where(t > d**3, np.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def _lab_finv(t):
    d = 6.0 / 29.0
    return np.where(t > d, t**3, 3 * d * d * (t - 4.0 / 29.0))


def lab_from_xyz(im_cl):
    xr = im_cl / D65_WHITE
    fx, fy, fz = _lab_f(xr[..., 0]), _lab_f(xr[..., 1]), _lab_f(xr[..., 2])
    return np.stack([116 * fy - 16, 500 * (fx - fy), 200 * (fy - fz)], axis=-1)


def xyz_from_lab(im_cl):
    L, a, b = im_cl[..., 0], im_cl[..., 1], im_cl[..., 2]
    fy = (L + 16) / 116
    fx = fy + a / 500
    fz = fy - b / 200
    return np.stack(
        [_lab_finv(fx), _lab_finv(fy), _lab_finv(fz)], axis=-1
    ) * D65_WHITE


_FORWARD = {
    "ipt": ipt_from_rgb,
    "cie xyz": xyz_from_rgb,
    "xyz": xyz_from_rgb,
    "cie lab": lambda x: lab_from_xyz(xyz_from_rgb(x)),
    "lab": lambda x: lab_from_xyz(xyz_from_rgb(x)),
    "ycbcr": lambda x: _apply_mat(x, RGB_TO_YCBCR),
    "oklab": oklab_from_rgb,
    "rgb": lambda x: x,
}
_INVERSE = {
    "ipt": rgb_from_ipt,
    "cie xyz": rgb_from_xyz,
    "xyz": rgb_from_xyz,
    "cie lab": lambda x: rgb_from_xyz(xyz_from_lab(x)),
    "lab": lambda x: rgb_from_xyz(xyz_from_lab(x)),
    "ycbcr": lambda x: _apply_mat(x, YCBCR_TO_RGB),
    "oklab": rgb_from_oklab,
    "rgb": lambda x: x,
}

SUPPORTED_MODELS = set(_FORWARD)


def convert(im: np.ndarray, src: str, dest: str) -> np.ndarray:
    """Convert a (C, H, W) image between color models.

    Channels-first in/out (the reference's shim: spiht/color_models.py:11-13).
    One of src/dest must be 'RGB'.
    """
    src_l, dest_l = src.lower(), dest.lower()
    for name, m in (("src", src_l), ("dest", dest_l)):
        if m not in SUPPORTED_MODELS:
            raise ValueError(
                f"{m!r} is not a supported color model. "
                f"Supported models are {sorted(SUPPORTED_MODELS)}"
            )
    im_cl = np.moveaxis(np.asarray(im, dtype=np.float64), 0, -1)
    if src_l == "rgb":
        out = _FORWARD[dest_l](im_cl)
    elif dest_l == "rgb":
        out = _INVERSE[src_l](im_cl)
    else:
        out = _FORWARD[dest_l](_INVERSE[src_l](im_cl))
    return np.moveaxis(out, -1, 0)
