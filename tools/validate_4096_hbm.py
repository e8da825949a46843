"""Hardware validation: 4096^2-class codec on the HBM-resident-table
machines (round 5) — encode compact_hbm + decode geo_hbm at the REAL
4096^2/L6 RGB coefficient geometry (3x4121x4121, ll 68x68), bit/
element-exact vs the native kernel, with kernel-side decode rate.

Numbers recorded in BASELINE.md round-5 "compact_hbm" section:
encode 1028 ms = 49.6 MP/s coeff-side @0.25 bpp; decode kernel 809 ms
= 63.0 MP/s (materialized over the dev tunnel is d2h-bound).

Run: python tools/validate_4096_hbm.py [input_hw] [level] [bpp]
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

from spiht_tpu.codec import pallas_decoder as pd
from spiht_tpu.codec import pallas_encoder as pe
from spiht_tpu.codec.device_decoder import _words_of
from spiht_tpu.codec.oracle import compute_max_n
from spiht_tpu.native import runtime
from spiht_tpu.settings import SpihtSettings
from spiht_tpu.wavelets.geometry import get_slices_and_h_w


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    hin = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    bpp = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25

    nat = runtime.load()
    assert nat is not None
    s = SpihtSettings()
    slices, h, w = get_slices_and_h_w(hin, hin, s, level)
    llh, llw = slices[0][1].stop, slices[0][2].stop
    c = 3
    rng = np.random.default_rng(9)
    arr = (rng.standard_normal((c, h, w)) * 2500).astype(np.int64)
    arr[np.abs(arr) < 625] = 0
    arr = np.clip(arr, -59999, 59999).astype(np.int32)
    mn = compute_max_n(arr)
    mb = int(bpp * hin * hin)
    cw = pe._cap_words_for(c, h, w, mb)
    log(f"geom {c}x{h}x{w} ll=({llh},{llw}) N={c*h*w} max_n={mn} "
        f"mb={mb} enc_route={pe.preferred_machine(c,h,w,llh,llw,cw,mn)}")

    # ---- encode: compact_hbm ----
    efn = pe.pallas_encode_fn(c, h, w, llh, llw, cw,
                              machine="compact_hbm")
    ja = jax.device_put(jnp.asarray(arr))
    t0 = time.perf_counter()
    words, total, ovf = efn(ja, mn, mb)
    wh = np.asarray(words)
    log(f"encode first(+compile) {time.perf_counter()-t0:.1f}s "
        f"bits={int(total)} ovf={bool(ovf)}")
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        words, total, ovf = efn(ja, mn, mb)
        wh = np.asarray(words)
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[1]
    want, wmn = nat.encode(arr, llh, llw, mb)
    got = wh.view(np.uint8)[: (int(total) + 7) // 8].tobytes()
    exact = wmn == mn and got == want
    log(f"encode median {med*1e3:.0f} ms = {c*h*w/1e6/med:.2f} MP/s "
        f"coeff-side, bit-exact={exact}")
    assert exact

    # ---- decode: geo_hbm ----
    data, dmn = want, wmn
    nbits = len(data) * 8
    dcw = max((nbits + 31) // 32, 1)
    od = "int16" if dmn <= 13 else "int32"
    dfn = pd.pallas_decode_fn(c, h, w, llh, llw, dcw,
                              machine="hybrid_hbm", out_dtype=od)
    jw = jax.device_put(jnp.asarray(_words_of(data, dcw)))
    t0 = time.perf_counter()
    rec = np.asarray(dfn(jw, nbits, dmn))
    log(f"decode first(+compile) {time.perf_counter()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        rec = np.asarray(dfn(jw, nbits, dmn))
        ts.append(time.perf_counter() - t1)
    dmed = sorted(ts)[1]

    @jax.jit
    def ksum(wv, nv, mv):
        return jnp.sum(dfn.__wrapped__(wv, nv, mv).astype(jnp.int32))

    np.asarray(ksum(jw, nbits, dmn))
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        np.asarray(ksum(jw, nbits, dmn))
        ts.append(time.perf_counter() - t1)
    kmed = sorted(ts)[1]
    want_rec = nat.decode(data, dmn, c, h, w, llh, llw)
    dexact = np.array_equal(rec.astype(np.int32), want_rec)
    log(f"decode materialized {dmed*1e3:.0f} ms = "
        f"{c*h*w/1e6/dmed:.2f} MP/s (tunnel d2h-bound); kernel "
        f"{kmed*1e3:.0f} ms = {c*h*w/1e6/kmed:.2f} MP/s, "
        f"element-exact={dexact}")
    assert dexact
    print(f'{{"geom": "{c}x{h}x{w}", "bpp": {bpp}, '
          f'"mpps_enc_hbm": {c*h*w/1e6/med:.2f}, '
          f'"mpps_dec_hbm_kernel": {c*h*w/1e6/kmed:.2f}, '
          f'"exact": true}}')


if __name__ == "__main__":
    main()
