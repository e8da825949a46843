"""Demo: IPT color space + per-channel quantization, bpp sweep.

The reference's demonstrate.py flow (IPT, [100,20,20] channel scales,
q=1, bpp in {0.1, 0.5, 1.0}) on this framework. Writes reconstructions
side by side and prints rate-distortion stats.

    python examples/demonstrate.py IMAGE [OUTDIR]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spiht_tpu import SpihtSettings, encode_image, decode_image
from spiht_tpu.metrics import encode_stats
from spiht_tpu.utils import imload, imsave


def main(path: str, outdir: str = "/tmp/spiht_demo") -> None:
    os.makedirs(outdir, exist_ok=True)
    image = imload(path)
    c, h, w = image.shape
    # even dims, like the reference demo ("pywt only supports even
    # resolutions" for this flow — demonstrate.py:41-46)
    image = image[:, : h - h % 2, : w - w % 2]
    c, h, w = image.shape

    settings = SpihtSettings(
        color_model="ipt",
        per_channel_quant_scales=[100, 20, 20],
        quantization_scale=1.0,
    )
    import time

    for bpp in (0.1, 0.5, 1.0):
        t0 = time.perf_counter()
        er = encode_image(image, settings, max_bits=round(bpp * h * w))
        t_enc = time.perf_counter() - t0
        rec = decode_image(er, settings)[..., :h, :w]
        st = encode_stats(image, er, t_enc, reconstruction=rec)
        print(st.to_json())
        out = os.path.join(outdir, f"rec_{bpp}.png")
        imsave(out, np.clip(rec, 0, 1))
        print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
