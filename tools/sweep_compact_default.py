"""Hardware sweep: compact vs standard (hybrid) single-image Pallas
encode machine over geometry x budget — the data for the round-4
verdict's default-flip question (VERDICT.md item 3).

Per cell: median-of-3 materialized kernel time for each machine on the
same coefficient array, bit-exactness asserted vs the native kernel.
Prints one row per (geometry, budget) and a JSON summary line.

Run: python tools/sweep_compact_default.py [quick]
"""

from __future__ import annotations

import json
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
from spiht_tpu.codec import pallas_encoder as pe
from spiht_tpu.native import runtime


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_image(h, w, seed=1234):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    im = np.stack([
        0.5 + 0.25 * np.sin(xx / 37.0 + c) * np.cos(yy / 53.0)
        + 0.15 * (xx / w > 0.4)
        for c in range(3)
    ])
    return np.clip(im + 0.05 * rng.standard_normal(im.shape), 0, 1)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    settings = SpihtSettings()
    nat = runtime.load()
    assert nat is not None
    geoms = [
        # (h_in, w_in, level) input geometries; coeff geometry printed
        (256, 256, 5),
        (512, 512, 6),
        (1024, 1024, 6),
    ]
    if quick:
        geoms = geoms[1:2]
    budgets = ["0.25bpp", "1.0bpp", "full"]
    rows = []
    for h_in, w_in, level in geoms:
        im = make_image(h_in, w_in)
        arr, llh, llw = transform.forward_numpy(im, settings, level)
        c, h, w = arr.shape
        mn = compute_max_n(arr)
        ja = jax.device_put(jnp.asarray(arr))
        for btag in budgets:
            mb = (2**31 - 2 if btag == "full"
                  else int(round(float(btag[:-3]) * h_in * w_in)))
            cap_words = pe._cap_words_for(c, h, w, mb)
            cell = {"geom": f"3x{h}x{w}", "ll": f"{llh}x{llw}",
                    "max_n": int(mn), "budget": btag}
            want, wmn = nat.encode(arr, llh, llw, min(mb, 2**31 - 2))
            for machine in ("hybrid", "compact"):
                fits = pe.machine_fits(c, h, w, llh, llw, cap_words,
                                       compact=(machine == "compact"))
                if machine == "compact" and mn > 15:
                    fits = False
                if not fits:
                    cell[machine] = None
                    log(f"{cell['geom']} {btag} {machine}: does not fit")
                    continue
                fn = pe.pallas_encode_fn(c, h, w, llh, llw, cap_words,
                                         machine=machine)
                t0 = time.perf_counter()
                words, total, ovf = fn(ja, mn, mb)
                wh = np.asarray(words)
                first = time.perf_counter() - t0
                ts = []
                for _ in range(3):
                    t1 = time.perf_counter()
                    words, total, ovf = fn(ja, mn, mb)
                    wh = np.asarray(words)
                    ts.append(time.perf_counter() - t1)
                med = sorted(ts)[1]
                t = int(total)
                got = wh.view(np.uint8)[: (t + 7) // 8].tobytes()
                exact = (int(wmn) == int(mn)) and got == want
                assert exact, f"{cell['geom']} {btag} {machine} NOT exact"
                cell[machine] = round(med * 1e3, 1)
                log(f"{cell['geom']} {btag} {machine}: first {first:.1f}s, "
                    f"median {med*1e3:.1f} ms, exact={exact}")
            if cell.get("hybrid") and cell.get("compact"):
                cell["compact_speedup"] = round(
                    cell["hybrid"] / cell["compact"], 3
                )
            rows.append(cell)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
