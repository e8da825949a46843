"""Hardware bench: B-chain interleaved Pallas encoder vs lax.map.

Measures the interleaved machine (pallas_encoder._interleaved_fn) at
the headline geometry with bit-exactness asserted against the native
kernel per lane, materialized timing (np.asarray — on the tunnel
block_until_ready can return early).

Run (one B per process; the tunneled chip can wedge after many large
kernels in one process):
    python tools/bench_ilv_encoder.py B [HxW] [level] [bpp] [map|compact]
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
    compact = len(sys.argv) > 5 and sys.argv[5] == "compact"

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

    arrs, wants, mns = [], [], []
    nat = runtime.load()
    for b in range(B):
        im_b = np.clip(
            im + 0.03 * np.random.default_rng(b).standard_normal(im.shape),
            0, 1,
        )
        arr_b, llh, llw = transform.forward_numpy(im_b, settings, level)
        arr_b = arr_b.astype(np.int32)
        arrs.append(arr_b)
        wants.append(nat.encode(arr_b, llh, llw, mb))
        mns.append(compute_max_n(arr_b))
    c, h, w = arrs[0].shape
    print(f"backend={jax.default_backend()} geom={c}x{h}x{w} "
          f"ll=({llh},{llw}) B={B} mb={mb}", flush=True)

    from spiht_tpu.codec.pallas_encoder import (
        _cap_words_for, _interleaved_fn, interleaved_vmem_bytes,
        pallas_encode_batch_fn,
    )

    cap_words = _cap_words_for(c, h, w, mb)
    if use_map:
        fn = pallas_encode_batch_fn(c, h, w, llh, llw, cap_words)
        tag = "lax.map"
    else:
        vb = interleaved_vmem_bytes(B, c, h, w, llh, llw, cap_words,
                                    compact=compact)
        print(f"interleaved state: {vb / 2**20:.1f} MB "
              f"(compact={compact})", flush=True)
        fn = _interleaved_fn(B, c, h, w, llh, llw, cap_words,
                             compact=compact)
        tag = "ilv-compact" if compact else "interleaved"

    ja = jax.device_put(jnp.asarray(np.stack(arrs)))
    jmn = jax.device_put(jnp.asarray(np.array(mns, np.int32)))
    jmb = jax.device_put(jnp.full(B, mb, jnp.int32))
    t0 = time.perf_counter()
    words, totals, ovf = fn(ja, jmn, jmb)
    words_h = np.asarray(words)
    print(f"{tag} B={B}: first(+compile) {time.perf_counter()-t0:.1f}s",
          flush=True)
    ts = []
    for _ in range(5):
        t1 = time.perf_counter()
        words, totals, ovf = fn(ja, jmn, jmb)
        words_h = np.asarray(words)
        totals_h = np.asarray(totals)
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[len(ts) // 2]
    exact = not bool(np.asarray(ovf).any())
    for b, (want, wmn) in enumerate(wants):
        t = int(totals_h[b])
        got = words_h[b].view(np.uint8)[: (t + 7) // 8].tobytes()
        exact = exact and wmn == mns[b] and got == want
    mpps = B * c * h * w / 1e6 / med
    print(f"{tag} B={B} @{bpp}bpp: median {med*1e3:.0f} ms = "
          f"{med*1e3/B:.1f} ms/stream = {mpps:.2f} MP/s aggregate "
          f"(coeff-counted), exact={exact}", flush=True)
    print(f"times: {[round(t*1e3) for t in ts]}")


if __name__ == "__main__":
    main()
