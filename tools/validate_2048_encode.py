"""Hardware validation of the COMPACT encode machine's 2048^2 admission.

Round-4: the compact hybrid machine folds the encoder's three N-sized
tables into ONE combo word per cell (mag|sgn|d|g|hc|hg|cix, valid for
max_n <= 15) and carries first-child indices in the LIS entries
(closed-form for non-LL nodes), so `machine_fits(..., compact=True)`
admits 3x2048x2048-class geometries at bounded bit budgets.  Per the
round-3 verdict discipline, that admission must be validated on
hardware BEFORE the router trusts it: one warm encode at the admitted
geometry, bit-exact vs the native kernel, recorded in BASELINE.md.

Usage: python tools/validate_2048_encode.py [HxW] [level] [bpp]
(defaults 2048x2048 7 1.0 — run on the TPU backend).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_spiht")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from spiht_tpu import SpihtSettings, transform
    from spiht_tpu.codec import pallas_encoder
    from spiht_tpu.native import runtime

    hw = sys.argv[1] if len(sys.argv) > 1 else "2048x2048"
    h_in, w_in = (int(v) for v in hw.split("x"))
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    bpp = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0

    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:h_in, 0:w_in].astype(np.float64)
    im = np.stack(
        [0.5 + 0.25 * np.sin(xx / 37.0 + c) * np.cos(yy / 53.0)
         + 0.15 * (xx / w_in > 0.4) for c in range(3)]
    )
    im = np.clip(im + 0.05 * rng.standard_normal(im.shape), 0, 1)

    settings = SpihtSettings()
    arr, llh, llw = transform.forward_numpy(im, settings, level)
    c, h, w = arr.shape
    nat = runtime.load()
    mb = int(round(bpp * h_in * w_in))
    cap_words = pallas_encoder._cap_words_for(c, h, w, mb)
    fits_std = pallas_encoder.machine_fits(c, h, w, llh, llw, cap_words)
    fits_cmp = pallas_encoder.machine_fits(
        c, h, w, llh, llw, cap_words, compact=True
    )
    vmem = pallas_encoder.machine_vmem_bytes(
        c, h, w, llh, llw, cap_words, compact=True
    )
    t0 = time.perf_counter()
    want, wmn = nat.encode(arr, llh, llw, mb)
    t_nat = time.perf_counter() - t0
    print(
        f"backend={jax.default_backend()} geom={c}x{h}x{w} ll=({llh},{llw})"
        f" max_n={wmn} max_bits={mb} cap_words={cap_words}"
        f" fits(std)={fits_std} fits(compact)={fits_cmp}"
        f" compact state={vmem / 2**20:.1f} MB"
        f" (native encode {t_nat:.2f}s)",
        flush=True,
    )

    # production router path (pallas_encode auto-routes to compact when
    # the standard 3-table machine exceeds the budget)
    t0 = time.perf_counter()
    data, mn = pallas_encoder.pallas_encode(arr, llh, llw, mb)
    first = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        data, mn = pallas_encoder.pallas_encode(arr, llh, llw, mb)
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[1]
    exact = (mn == wmn) and (data == want)
    print(
        f"pallas_encode (materialized): first {first:.1f}s, warm median "
        f"{med * 1e3:.0f} ms = {c * h * w / 1e6 / med:.2f} MP/s, "
        f"exact={exact}",
        flush=True,
    )

    # kernel-only rate (device checksum; excludes host maps build + the
    # words d2h, which the materialized number includes)
    fn = pallas_encoder.pallas_encode_fn(
        c, h, w, llh, llw, cap_words,
        machine="compact" if not fits_std else None,
    )
    raw = getattr(fn, "__wrapped__", fn)

    @jax.jit
    def ksum(a, nv, mv):
        words, total, _ = raw(a, nv, mv)
        return jnp.sum(words.astype(jnp.int32)) + total

    ja = jax.device_put(jnp.asarray(arr, jnp.int32))
    np.asarray(ksum(ja, int(mn), mb))
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        np.asarray(ksum(ja, int(mn), mb))
        ts.append(time.perf_counter() - t1)
    kmed = sorted(ts)[1]
    print(
        f"encode kernel+maps: median {kmed * 1e3:.0f} ms = "
        f"{c * h * w / 1e6 / kmed:.2f} MP/s "
        f"({kmed * 1e9 / (len(want) * 8):.0f} ns/bit)",
        flush=True,
    )
    if not exact:
        raise SystemExit("NOT BIT-EXACT")


if __name__ == "__main__":
    main()
