"""Hardware bench: B-chain interleaved Pallas decoder vs lax.map.

Bit-exactness asserted against the native kernel per lane; timing
materializes the rec arrays (np.asarray).

Run: python tools/bench_ilv_decoder.py B [HxW] [level] [bpp] [map]
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

import numpy as np

from spiht_tpu import SpihtSettings, transform
from spiht_tpu.codec.oracle import compute_max_n
from spiht_tpu.native import runtime


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hw = sys.argv[2] if len(sys.argv) > 2 else "512x512"
    h_in, w_in = (int(v) for v in hw.split("x"))
    level = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    bpp = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    use_map = len(sys.argv) > 5 and sys.argv[5] == "map"

    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:h_in, 0:w_in].astype(np.float64)
    im = np.stack(
        [
            0.5
            + 0.25 * np.sin(xx / 37.0 + c) * np.cos(yy / 53.0)
            + 0.15 * (xx / w_in > 0.4)
            for c in range(3)
        ]
    )
    im = np.clip(im + 0.05 * rng.standard_normal(im.shape), 0, 1)
    settings = SpihtSettings()
    mb = int(round(bpp * h_in * w_in))

    datas, mns, wants = [], [], []
    nat = runtime.load()
    for b in range(B):
        im_b = np.clip(
            im + 0.03 * np.random.default_rng(b).standard_normal(im.shape),
            0, 1,
        )
        arr_b, llh, llw = transform.forward_numpy(im_b, settings, level)
        arr_b = arr_b.astype(np.int32)
        c, h, w = arr_b.shape
        data, mn = nat.encode(arr_b, llh, llw, mb)
        datas.append(data)
        mns.append(mn)
        wants.append(nat.decode(data, mn, c, h, w, llh, llw))
    print(f"backend={jax.default_backend()} geom={c}x{h}x{w} "
          f"ll=({llh},{llw}) B={B} mb={mb} max_n={mns[0]}", flush=True)

    from spiht_tpu.codec import pallas_decoder as pd

    if use_map:
        os.environ["SPIHT_TPU_PALLAS_DEC_BATCH"] = "map"
        tag = "lax.map"
    else:
        os.environ["SPIHT_TPU_PALLAS_DEC_BATCH"] = "ilv"
        os.environ["SPIHT_TPU_PALLAS_ILV_B"] = str(B)
        cap_words = max(max((len(d) * 8 + 31) // 32 for d in datas), 1)
        vb = pd.interleaved_vmem_bytes(B, c, h, w, llh, llw, cap_words)
        print(f"interleaved state: {vb / 2**20:.1f} MB", flush=True)
        tag = "interleaved"

    t0 = time.perf_counter()
    rec = pd.pallas_decode_batch(datas, mns, c, h, w, llh, llw)
    print(f"{tag} B={B}: first(+compile) {time.perf_counter()-t0:.1f}s",
          flush=True)

    # kernel-only lane: device-side checksum so nothing ships
    if not use_map:
        import jax.numpy as jnp

        from spiht_tpu.codec.device_decoder import _words_of

        cap_words = max(max((len(d) * 8 + 31) // 32 for d in datas), 1)
        ifn = pd._interleaved_fn(B, c, h, w, llh, llw, cap_words,
                                 False, "int16")

        @jax.jit
        def ksum(words, nbits, mx):
            return jnp.sum(
                ifn.__wrapped__(words, nbits, mx).astype(jnp.int32)
            )

        jw = jax.device_put(jnp.asarray(
            np.stack([_words_of(d, cap_words) for d in datas])
        ))
        jn = jax.device_put(jnp.asarray(
            np.array([len(d) * 8 for d in datas], np.int32)
        ))
        jm = jax.device_put(jnp.asarray(np.array(mns, np.int32)))
        sv = np.asarray(ksum(jw, jn, jm))
        kts = []
        for _ in range(5):
            t1 = time.perf_counter()
            sv = np.asarray(ksum(jw, jn, jm))
            kts.append(time.perf_counter() - t1)
        kmed = sorted(kts)[len(kts) // 2]
        print(f"{tag} B={B} kernel-only (checksummed): "
              f"median {kmed*1e3:.0f} ms = {kmed*1e3/B:.1f} ms/stream "
              f"= {B * c * h * w / 1e6 / kmed:.2f} MP/s; "
              f"times {[round(t*1e3) for t in kts]}", flush=True)
    ts = []
    for _ in range(5):
        t1 = time.perf_counter()
        rec = pd.pallas_decode_batch(datas, mns, c, h, w, llh, llw)
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[len(ts) // 2]
    exact = all(
        np.array_equal(rec[b], wants[b]) for b in range(B)
    )
    mpps = B * c * h * w / 1e6 / med
    print(f"{tag} B={B} @{bpp}bpp: median {med*1e3:.0f} ms = "
          f"{med*1e3/B:.1f} ms/stream = {mpps:.2f} MP/s aggregate "
          f"(coeff-counted, materialized), exact={exact}", flush=True)
    print(f"times: {[round(t*1e3) for t in ts]}")


if __name__ == "__main__":
    main()
