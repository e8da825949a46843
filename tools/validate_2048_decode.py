"""Hardware validation of the decoder's 2048^2-class admission.

Round-3 narrowed the decode machine's queue capacities by bit budget,
which makes `machine_fits` admit 3x2048x2048-class geometries at
bounded budgets (the decoder has no N-sized value tables; rec
materializes outside the kernel).  The round-3 verdict required that
admission be validated on hardware BEFORE the router trusts it:
one warm decode at the admitted geometry, bit-exact vs the native
kernel, recorded in BASELINE.md.

Usage: python tools/validate_2048_decode.py [HxW] [level] [bpp]
(defaults 2048x2048 7 1.0 — run on the TPU backend).
"""

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_spiht")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from spiht_tpu import SpihtSettings, transform
    from spiht_tpu.codec import device_decoder, pallas_decoder
    from spiht_tpu.codec.device_decoder import _words_of
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
    t0 = time.perf_counter()
    data, mn = nat.encode(arr, llh, llw, mb)
    t_enc = time.perf_counter() - t0
    nbits = len(data) * 8
    cap_words = max((nbits + 31) // 32, 1)
    fits = pallas_decoder.machine_fits(c, h, w, llh, llw, cap_words)
    vmem = pallas_decoder.machine_vmem_bytes(c, h, w, llh, llw, cap_words)
    print(
        f"backend={jax.default_backend()} geom={c}x{h}x{w} ll=({llh},{llw})"
        f" max_n={mn} bits={nbits} cap_words={cap_words}"
        f" machine_fits={fits} state={vmem / 2**20:.1f} MB"
        f" (native encode {t_enc:.2f}s)",
        flush=True,
    )
    want = nat.decode(data, mn, c, h, w, llh, llw)

    # production router path (routes to the Pallas hybrid machine when
    # machine_fits; ships int16 when max_n <= 13)
    t0 = time.perf_counter()
    rec = device_decoder.decode_device(data, mn, c, h, w, llh, llw)
    first = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        rec = device_decoder.decode_device(data, mn, c, h, w, llh, llw)
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[1]
    exact = bool(np.array_equal(rec, want))
    print(
        f"decode_device (materialized): first {first:.1f}s, warm median "
        f"{med * 1e3:.0f} ms = {c * h * w / 1e6 / med:.2f} MP/s, "
        f"exact={exact}",
        flush=True,
    )

    # kernel-only rate (device checksum — materialized time is d2h-bound
    # on the ~20 MB/s tunnel)
    od = "int16" if int(mn) <= 13 else "int32"
    dfn = pallas_decoder.pallas_decode_fn(
        c, h, w, llh, llw, cap_words, out_dtype=od
    )
    raw = getattr(dfn, "__wrapped__", dfn)

    @jax.jit
    def ksum(wv, nv, mv):
        return jnp.sum(raw(wv, nv, mv).astype(jnp.int32))

    jw = jax.device_put(jnp.asarray(_words_of(data, cap_words)))
    np.asarray(ksum(jw, nbits, int(mn)))
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        np.asarray(ksum(jw, nbits, int(mn)))
        ts.append(time.perf_counter() - t1)
    kmed = sorted(ts)[1]
    print(
        f"decode kernel-only: median {kmed * 1e3:.0f} ms = "
        f"{c * h * w / 1e6 / kmed:.2f} MP/s",
        flush=True,
    )
    if not exact:
        raise SystemExit("NOT BIT-EXACT")


if __name__ == "__main__":
    main()
