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
build-vs-negative decision is data, not vibes:

  sort2/sort3        lax.sort, 2/3 i32 lanes, num_keys=all
  gather_rand        x[idx] with a random permutation idx
  gather_sorted      x[idx] with a nondecreasing idx
  scatter_perm       zeros.at[perm].set(vals)  (random permutation)
  scatter_sorted_add words.at[sorted_idx].add(v, indices_are_sorted)
  cumsum             jnp.cumsum over (n,) i32
  rank16             stable counting-rank, 4-bit digit: one-hot (n,16)
                     f32 matmul-free cumsum + per-row pick
  rank16x2           two chained 4-bit passes incl. the inter-pass
                     permutation scatter (one LSD radix step)
  offsets16          weighted variant: exclusive prefix of per-entity
                     LENGTHS in key order, computed in entity space
                     (the no-permute emission-offset primitive)

Run: python tools/spike_radix.py [n] (default 1730560 ~ 2N headline)
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


def bench(name, fn, *args, reps=7):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # materialize (tunnel!)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:>22}: {med * 1e3:8.2f} ms", flush=True)
    return med


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1730560
    rng = np.random.default_rng(7)
    perm = rng.permutation(n).astype(np.int32)
    vals = rng.integers(0, 2**30, n).astype(np.int32)
    keys16 = (vals & 15).astype(np.int32)
    lens = rng.integers(0, 10, n).astype(np.int32)
    sidx = np.sort(rng.integers(0, n, n).astype(np.int32))

    jperm = jax.device_put(jnp.asarray(perm))
    jvals = jax.device_put(jnp.asarray(vals))
    jk16 = jax.device_put(jnp.asarray(keys16))
    jlens = jax.device_put(jnp.asarray(lens))
    jsidx = jax.device_put(jnp.asarray(sidx))
    print(f"backend={jax.default_backend()} n={n}", flush=True)

    @jax.jit
    def sort2(a, b):
        return lax.sort((a, b), num_keys=2)

    @jax.jit
    def sort3(a, b, c):
        return lax.sort((a, b, c), num_keys=3)

    @jax.jit
    def gather_rand(x, idx):
        return x[idx]

    @jax.jit
    def gather_sorted(x, idx):
        return x[idx]

    @jax.jit
    def scatter_perm(idx, v):
        return jnp.zeros(n, jnp.int32).at[idx].set(v)

    @jax.jit
    def scatter_sorted_add(idx, v):
        return jnp.zeros(n, jnp.int32).at[idx].add(
            v, indices_are_sorted=True, mode="drop"
        )

    @jax.jit
    def cumsum(v):
        return jnp.cumsum(v, dtype=jnp.int32)

    @jax.jit
    def rank16(k):
        oh = (k[:, None] == jnp.arange(16, dtype=jnp.int32)[None]).astype(
            jnp.int32
        )
        cum = jnp.cumsum(oh, axis=0, dtype=jnp.int32) - oh  # exclusive
        tot = oh.sum(axis=0, dtype=jnp.int32)
        base = jnp.cumsum(tot, dtype=jnp.int32) - tot
        return (oh * (cum + base[None, :])).sum(axis=1)

    @jax.jit
    def rank16x2(k, v):
        # LSD radix: pass 1 on low digit incl. the permutation that a
        # chained pass requires, then pass 2 on the high digit
        r1 = rank16(k & 15)
        k2 = jnp.zeros(n, jnp.int32).at[r1].set(k)
        v2 = jnp.zeros(n, jnp.int32).at[r1].set(v)
        r2 = rank16(k2 >> 4)
        return jnp.zeros(n, jnp.int32).at[r2].set(v2)

    @jax.jit
    def offsets16(k, ln):
        # emission offsets in ENTITY space: off(e) = sum of lens of all
        # e' with (key(e') < key(e)) or (== and earlier). No permute.
        oh = (k[:, None] == jnp.arange(16, dtype=jnp.int32)[None]).astype(
            jnp.int32
        )
        woh = oh * ln[:, None]
        cum = jnp.cumsum(woh, axis=0, dtype=jnp.int32) - woh
        tot = woh.sum(axis=0, dtype=jnp.int32)
        base = jnp.cumsum(tot, dtype=jnp.int32) - tot
        return (oh * (cum + base[None, :])).sum(axis=1)

    t_sort2 = bench("sort2 (i32,i32)", sort2, jvals, jperm)
    t_sort3 = bench("sort3 (3x i32)", sort3, jvals, jperm, jvals)
    bench("gather random", gather_rand, jvals, jperm)
    bench("gather sorted", gather_sorted, jvals, jsidx)
    t_scat = bench("scatter perm set", scatter_perm, jperm, jvals)
    bench("scatter sorted add", scatter_sorted_add, jsidx, jvals)
    t_cum = bench("cumsum", cumsum, jvals)
    t_r16 = bench("rank16 (4-bit)", rank16, jk16)
    bench("rank16x2 (8-bit+perm)", rank16x2, jvals, jvals)
    t_off = bench("offsets16 weighted", offsets16, jk16, jlens)

    # decision arithmetic for the headline geometry (16 planes)
    print("\nper-plane sort bill today : "
          f"{(2 * t_sort2 + t_sort3) * 1e3:.1f} ms "
          f"(2xsort2@N is ~sort2@2N/2)", flush=True)
    print(f"16-plane sort bill        : {16 * (2 * t_sort2 + t_sort3) * 1e3:.0f} ms")
    print(f"radix pass (rank16+perm)  : {(t_r16 + t_scat) * 1e3:.1f} ms")
    print(f"no-permute offsets16 pass : {t_off * 1e3:.1f} ms; cumsum {t_cum * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
