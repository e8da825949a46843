"""Hardware bench: FUSED batched pipelines through the interleaved
B-chain machines (jax_transform.encode/decode_pipeline_batch_fn with
machine='pallas' — one XLA program per direction: B images -> B streams
/ B streams -> B images, analysis/synthesis fused with the compact ILV
bit machines).

Bit-exactness asserted (hard assert) for the first 4 lanes against the
single-image fused pipeline (itself validated bit-exact vs the host
path in tests/test_pallas_pipelines.py); timing materializes outputs
(np.asarray).

Run: python tools/bench_batch_pipeline.py [B] [HxW] [level] [bpp]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_spiht")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from spiht_tpu import SpihtSettings, jax_transform, transform
from spiht_tpu.native import runtime
from spiht_tpu.wavelets.geometry import get_slices_and_h_w


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    hw = sys.argv[2] if len(sys.argv) > 2 else "512x512"
    h_in, w_in = (int(v) for v in hw.split("x"))
    level = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    bpp = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0

    os.environ["SPIHT_TPU_PALLAS_ENCODER"] = "1"
    os.environ["SPIHT_TPU_PALLAS_DECODER"] = "1"

    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:h_in, 0:w_in].astype(np.float64)
    base = 0.5 + 0.25 * np.sin(xx / 37.0) * np.cos(yy / 53.0)
    ims = np.stack([
        np.clip(
            np.stack([base * (0.6 + 0.4 * np.sin(0.7 * c + b))
                      for c in range(3)])
            + 0.05 * rng.standard_normal((3, h_in, w_in)),
            0, 1,
        )
        for b in range(B)
    ])
    settings = SpihtSettings()
    mb = round(bpp * h_in * w_in)
    mbs = np.full(B, mb, np.int32)
    dt = "float32"
    slices, enc_h, enc_w = get_slices_and_h_w(h_in, w_in, settings, level)
    llh, llw = slices[0][1].stop, slices[0][2].stop
    print(f"backend={jax.default_backend()} B={B} geom=3x{enc_h}x{enc_w} "
          f"ll=({llh},{llw}) mb={mb}", flush=True)

    nat = runtime.load()
    transform._BACKEND = "jax"
    os.environ["SPIHT_TPU_PRECISION"] = "f32"

    eb = jax_transform.encode_pipeline_batch_fn(
        settings, h_in, w_in, level, 3, dtype=dt, max_bits=mb
    )
    ji = jax.device_put(jnp.asarray(ims.astype(np.float32)))
    jm = jax.device_put(jnp.asarray(mbs))
    t0 = time.perf_counter()
    wds, tot, ovf, mns = eb(ji, jm)
    wds_h = np.asarray(wds)
    print(f"encode pipeline first(+compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    ts = []
    for _ in range(5):
        t1 = time.perf_counter()
        wds, tot, ovf, mns = eb(ji, jm)
        wds_h = np.asarray(wds)
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[2]
    tot_h = np.asarray(tot)
    mns_h = np.asarray(mns)
    assert not np.asarray(ovf).any()
    # bit-exact vs the single-image fused pipeline (itself validated
    # bit-exact vs the host path, tests/test_pallas_pipelines.py)
    es = jax_transform.encode_pipeline_fn(
        settings, h_in, w_in, level, 3, dtype=dt, max_bits=mb
    )
    exact = True
    for b in range(min(B, 4)):
        ws, t1s, _, ns = es(ji[b], mb)
        t = int(tot_h[b])
        exact = exact and t == int(np.asarray(t1s)) and int(
            mns_h[b]
        ) == int(np.asarray(ns))
        got = wds_h[b].view(np.uint8)[: (t + 7) // 8].tobytes()
        want = np.asarray(ws).view(np.uint8)[: (t + 7) // 8].tobytes()
        exact = exact and got == want
    mpps = B * 3 * enc_h * enc_w / 1e6 / med
    print(f"encode pipeline B={B} @{bpp}bpp: median {med*1e3:.0f} ms = "
          f"{mpps:.2f} MP/s aggregate (images->streams materialized), "
          f"exact={exact}; times {[round(t*1e3) for t in ts]}", flush=True)
    assert exact, "encode pipeline lanes diverged from the single-image path"

    # ---- decode direction ----
    cap = int(wds_h.shape[1])
    db = jax_transform.decode_pipeline_batch_fn(
        settings, h_in, w_in, level, 3, enc_h, enc_w, llh, llw, cap,
        dtype=dt, as_uint8=True,
    )
    jw = jax.device_put(jnp.asarray(wds_h))
    jt = jax.device_put(jnp.asarray(tot_h))
    jn = jax.device_put(jnp.asarray(mns_h))
    t0 = time.perf_counter()
    out = np.asarray(db(jw, jt, jn))
    print(f"decode pipeline first(+compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    ts = []
    for _ in range(5):
        t1 = time.perf_counter()
        out = np.asarray(db(jw, jt, jn))
        ts.append(time.perf_counter() - t1)
    medd = sorted(ts)[2]
    # exactness: single-image fused pipeline must match per lane
    ds = jax_transform.decode_pipeline_fn(
        settings, h_in, w_in, level, 3, enc_h, enc_w, llh, llw, cap,
        dtype=dt, as_uint8=True,
    )
    dexact = all(
        np.array_equal(
            out[b], np.asarray(ds(jw[b], int(tot_h[b]), int(mns_h[b])))
        )
        for b in range(min(B, 4))
    )
    mppsd = B * 3 * enc_h * enc_w / 1e6 / medd
    print(f"decode pipeline B={B} @{bpp}bpp: median {medd*1e3:.0f} ms = "
          f"{mppsd:.2f} MP/s aggregate (streams->images materialized, "
          f"uint8), exact={dexact}; times {[round(t*1e3) for t in ts]}",
          flush=True)
    assert dexact, "decode pipeline lanes diverged from the single-image path"


if __name__ == "__main__":
    main()
