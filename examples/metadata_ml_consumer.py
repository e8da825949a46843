"""On-device consumption of the SPIHT metadata event log.

The reference's `decode_with_metadata` exists so ML models can consume
SPIHT streams as supervised token sequences
(/root/reference/src/encoder_decoder.rs:616-630).  On this framework the
fast lane keeps the whole flow on the TPU:

    stream bytes --h2d (tiny)--> Pallas decode + COMPACT event log
        --> on-device featurization / expansion --> model

The compact log is one i32 per stream bit (32x smaller than the
expanded 8-column trace), and `expand_event_log` reconstructs the full
reference trace on device when a consumer wants the reference layout —
nothing large ever crosses the host link.

Run (CPU works too): JAX_PLATFORMS=cpu python examples/metadata_ml_consumer.py
"""

import os

import numpy as np


def main() -> None:
    import jax

    # the preloaded TPU plugin ignores the JAX_PLATFORMS env var; honor
    # it here so `JAX_PLATFORMS=cpu python examples/...` works as shown
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    import spiht_tpu
    from spiht_tpu.codec import api
    from spiht_tpu.codec.meta_expand import (
        decode_event_log, expand_event_log,
    )
    from spiht_tpu.wavelets.geometry import (
        get_slices_and_h_w, slices_to_wire,
    )

    # --- encode one image (host path; any backend) -------------------
    rng = np.random.default_rng(3)
    h_in = w_in = 128
    yy, xx = np.mgrid[0:h_in, 0:w_in] / 32.0
    im = np.stack(
        [0.5 + 0.3 * np.sin(xx + k) * np.cos(yy) for k in range(3)]
    )
    im = np.clip(im + 0.05 * rng.standard_normal(im.shape), 0, 1)
    settings = spiht_tpu.SpihtSettings()
    level = 4
    er = spiht_tpu.encode_image(
        im, settings, level=level, max_bits=h_in * w_in
    )
    slices, eh, ew = get_slices_and_h_w(er.h, er.w, settings, level)
    ll_h = slices[0][1].stop
    ll_w = slices[0][2].stop

    # --- decode + compact event log, all on device --------------------
    interpret = jax.default_backend() == "cpu"  # Mosaic needs a TPU
    rec, log, words, nbits = decode_event_log(
        er.encoded_bytes, er.max_n, er.c, eh, ew, ll_h, ll_w,
        interpret=interpret,
    )
    print(f"stream bits={nbits}  compact log={log.nbytes / 1e3:.0f} KB "
          f"(expanded trace would be {(nbits + 1) * 8 * 4 / 1e3:.0f} KB)")

    # --- an ML consumer: featurize the token sequence ON DEVICE -------
    @jax.jit
    def featurize(log, words, nbits):
        t = jnp.arange(log.shape[0], dtype=jnp.int32)
        written = (log != 0) & (t < nbits)
        action = (jax.lax.shift_right_logical(log, 24) & 7)
        plane = (jax.lax.shift_right_logical(log, 27) & 31) - 1
        bit = (
            jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(words, jnp.int32)[t >> 5],
                t & 31,
            ) & 1
        )
        # per-action token counts and mean significance plane — the
        # kind of summary a conditioning model ingests
        counts = jnp.zeros(7, jnp.int32).at[
            jnp.where(written, action, 0)
        ].add(written.astype(jnp.int32))
        ones = jnp.where(written & (bit == 1), 1, 0).sum()
        mean_plane = jnp.where(written, plane, 0).sum() / jnp.maximum(
            written.sum(), 1
        )
        return counts, ones, mean_plane

    counts, ones, mean_plane = featurize(log, words, nbits)
    names = ["lip_sig", "lip_sign", "lisA_desc", "lisA_child_sig",
             "lisA_child_sign", "lisB_lsig", "refine"]
    print("on-device token counts:",
          {n: int(v) for n, v in zip(names, np.asarray(counts))})
    print(f"one-bits={int(ones)}  mean plane={float(mean_plane):.2f}")

    # --- reference 8-column trace, expanded on device -----------------
    top_slice, other_slices = slices_to_wire(slices)
    meta = expand_event_log(
        log, words, nbits, er.c, eh, ew, ll_h, ll_w,
        top_slice, other_slices,
    )
    print(f"expanded trace shape={meta.shape} (still a device array: "
          f"{type(meta).__name__})")
    # equality with the host reference path
    rec2, meta_host = api.decode_with_metadata(
        er.encoded_bytes, er.max_n, er.c, eh, ew, ll_h, ll_w,
        top_slice, other_slices,
    )
    same = np.array_equal(np.asarray(meta), np.asarray(meta_host))
    rec_same = np.array_equal(np.asarray(rec), np.asarray(rec2))
    print(f"row-exact vs host metadata decoder: {same}; rec exact: "
          f"{rec_same}")
    if not (same and rec_same):
        raise SystemExit("MISMATCH")


if __name__ == "__main__":
    main()
