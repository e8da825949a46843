"""Hardware primitive costs for the bucket/radix order-precomputation
design (round-4 item: can segmented counting-rank passes beat the
per-plane ``lax.sort``s of the sorted-space device encoder?).

The sorted-space encoder (codec/device_encoder.py) pays per plane:
  * 2-lane sort over N   (LIP order)
  * 3-lane sort over 2N  (LIS worklist order)
  * 2-lane sort over N   (refinement order)
  * 1 rank-inversion scatter over 2N
  * sorted scatter-adds into the words buffer
with N = c*h*w (865k at the 3x537x537 headline). A radix/bucket
replacement computes RANKS (or directly bit OFFSETS) via per-digit
one-hot cumsums instead of sorting, at the cost of one permutation
scatter per radix pass (for multi-digit keys) or zero permutes (if
offsets are accumulated hierarchically in entity space). This spike
measures every primitive either design is built from, so the
build-vs-negative decision is data, not vibes.

MEASUREMENT NOTE: one dispatch over the axon tunnel costs ~25 ms
regardless of payload, so each primitive runs K times inside ONE jit
under a lax.fori_loop whose carry perturbs the next iteration's input
(defeats CSE/DCE and serializes the chain); reported cost =
(T_total - T_empty) / K.

Run: python tools/spike_radix.py [n] [K] (default 1730560 ~ 2N, K=16)
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
from jax import lax


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1730560
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(7)
    perm = rng.permutation(n).astype(np.int32)
    vals = rng.integers(0, 2**30, n).astype(np.int32)
    lens = rng.integers(0, 10, n).astype(np.int32)
    sidx = np.sort(rng.integers(0, n, n).astype(np.int32))

    jperm = jax.device_put(jnp.asarray(perm))
    jvals = jax.device_put(jnp.asarray(vals))
    jlens = jax.device_put(jnp.asarray(lens))
    jsidx = jax.device_put(jnp.asarray(sidx))
    print(f"backend={jax.default_backend()} n={n} K={K}", flush=True)

    def loopify(op):
        """Run op K times inside one jit; op(x: i32[n]) -> i32[n]-ish
        reduced to a scalar that perturbs the next input."""

        @jax.jit
        def run(x):
            def body(_, carry):
                acc, xx = carry
                y = op(xx)
                s = jnp.sum(y.astype(jnp.int32), dtype=jnp.int32)
                return acc + s, x ^ (s & 1)

            acc, _ = lax.fori_loop(
                0, K, body, (jnp.zeros((), jnp.int32), x)
            )
            return acc

        return run

    overhead = [None]

    def bench(name, op, x, reps=5):
        run = loopify(op)
        np.asarray(run(x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(x))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        per = (med - (overhead[0] or 0.0)) / K
        print(f"{name:>22}: {per * 1e3:8.2f} ms/op "
              f"(total {med * 1e3:.1f})", flush=True)
        return per

    # dispatch floor: the empty chain
    overhead[0] = 0.0
    t_empty = bench("empty chain", lambda x: x, jvals)
    overhead[0] = t_empty * K

    t_sort2 = bench(
        "sort2 (i32,i32)",
        lambda x: lax.sort((x, jperm), num_keys=2)[0], jvals,
    )
    t_sort3 = bench(
        "sort3 (3x i32)",
        lambda x: lax.sort((x, jperm, jvals), num_keys=3)[0], jvals,
    )
    bench("gather random", lambda x: x[jperm], jvals)
    bench("gather sorted", lambda x: x[jsidx], jvals)
    t_scat = bench(
        "scatter perm set",
        lambda x: jnp.zeros(n, jnp.int32).at[jperm].set(x), jvals,
    )
    bench(
        "scatter sorted add",
        lambda x: jnp.zeros(n, jnp.int32).at[jsidx].add(
            x, indices_are_sorted=True, mode="drop"
        ),
        jvals,
    )
    t_cum = bench("cumsum", lambda x: jnp.cumsum(x, dtype=jnp.int32),
                  jvals)

    def rank16(k):
        k = k & 15
        oh = (k[:, None] == jnp.arange(16, dtype=jnp.int32)[None]).astype(
            jnp.int32
        )
        cum = jnp.cumsum(oh, axis=0, dtype=jnp.int32) - oh  # exclusive
        tot = oh.sum(axis=0, dtype=jnp.int32)
        base = jnp.cumsum(tot, dtype=jnp.int32) - tot
        return (oh * (cum + base[None, :])).sum(axis=1)

    t_r16 = bench("rank16 (4-bit)", rank16, jvals)

    def rank16_perm(k):
        r1 = rank16(k)
        return jnp.zeros(n, jnp.int32).at[r1].set(k)

    t_rp = bench("rank16+perm (1 pass)", rank16_perm, jvals)

    def offsets16(k):
        kk = k & 15
        oh = (kk[:, None] == jnp.arange(16, dtype=jnp.int32)[None]).astype(
            jnp.int32
        )
        woh = oh * jlens[:, None]
        cum = jnp.cumsum(woh, axis=0, dtype=jnp.int32) - woh
        tot = woh.sum(axis=0, dtype=jnp.int32)
        base = jnp.cumsum(tot, dtype=jnp.int32) - tot
        return (oh * (cum + base[None, :])).sum(axis=1)

    t_off = bench("offsets16 weighted", offsets16, jvals)

    # decision arithmetic for the headline geometry (~12 planes live)
    plane_sorts = 2 * t_sort2 + t_sort3
    print(f"\nper-plane sort bill today : {plane_sorts * 1e3:.1f} ms")
    print(f"12-plane sort bill        : {12 * plane_sorts * 1e3:.0f} ms")
    print(f"radix pass (rank16+perm)  : {t_rp * 1e3:.1f} ms "
          f"(x passes-per-key to replace ONE sort)")
    print(f"no-permute offsets16 pass : {t_off * 1e3:.1f} ms; "
          f"cumsum {t_cum * 1e3:.2f} ms; scatter {t_scat * 1e3:.1f} ms")
    print(f"dispatch floor            : {t_empty * K * 1e3:.1f} ms/call")


if __name__ == "__main__":
    main()
