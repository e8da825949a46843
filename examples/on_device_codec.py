"""End-to-end ON-DEVICE codec demo: image -> stream -> image, two XLA
programs, nothing but the 32 KB stream and the final preview crossing
the host boundary.

This is the serving shape the fused pipelines exist for
(`jax_transform.encode_pipeline_fn` / `decode_pipeline_fn`): a model
producing images on-chip hands them to the encoder without a host
round-trip, and a consumer model reads decoded images straight from
HBM. Reference flow being mirrored: CS1+CS2
(/root/reference/spiht/spiht_wrapper.py:142-281), re-architected as
device-resident programs.

Run: python examples/on_device_codec.py [image] [bpp]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spiht_tpu import SpihtSettings, jax_transform
from spiht_tpu.codec.api import get_slices_and_h_w
from spiht_tpu.utils import imload


def main() -> None:
    import jax
    import jax.numpy as jnp

    path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/images/hound.jpg"
    )
    bpp = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0

    image = imload(path)
    c, h, w = image.shape
    level = 6
    settings = SpihtSettings()
    max_bits = round(bpp * h * w)

    # ---- encode: image in HBM -> stream words in HBM ----
    efn = jax_transform.encode_pipeline_fn(
        settings, h, w, level, c, dtype="float32"
    )
    jim = jax.device_put(jnp.asarray(image, jnp.float32))
    t0 = time.perf_counter()
    words, total, overflow, max_n = efn(jim, max_bits)
    jax.block_until_ready(words)
    t_enc = time.perf_counter() - t0
    assert not bool(overflow)
    total = int(total)
    print(f"encoded {c}x{h}x{w} -> {total} bits "
          f"({total/(h*w):.3f} bpp) in {t_enc*1e3:.0f} ms "
          f"[backend={jax.default_backend()}; first call includes the "
          f"jit compile — see BASELINE.md for steady-state numbers]")

    # ---- decode: stream words in HBM -> image in HBM ----
    slices, enc_h, enc_w = get_slices_and_h_w(h, w, settings, level)
    ll_h, ll_w = slices[0][1].stop, slices[0][2].stop
    cap_words = int(words.shape[0])
    dfn = jax_transform.decode_pipeline_fn(
        settings, h, w, level, c, enc_h, enc_w, ll_h, ll_w, cap_words,
        dtype="float32", as_uint8=True,
    )
    t0 = time.perf_counter()
    rec = dfn(words, total, max_n)   # words never left the device
    jax.block_until_ready(rec)
    t_dec = time.perf_counter() - t0
    print(f"decoded on device in {t_dec*1e3:.0f} ms; "
          f"uint8 image shape {rec.shape} stays in HBM")

    # only now pull the preview to host
    rec_h = np.asarray(rec)[..., :h, :w].astype(np.float64) / 255.0
    mse = float(np.mean((rec_h - image) ** 2))
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    print(f"PSNR vs source: {psnr:.2f} dB at {bpp} bpp")


if __name__ == "__main__":
    main()
