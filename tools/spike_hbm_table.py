"""Primitive spike: dependent-chain random table access, VMEM-resident
vs HBM-resident (per-access DMA) — the measurement behind the
4096^2-class closed boundary (VERDICT r4 item 4).

The Pallas bit machines are dependent chains of random-access table
reads (queue rows, combo tables): iteration t+1's address comes from
iteration t's value. They are admitted only while their state fits
VMEM (~128 MB guard). The proposed escape for 4096^2-class geometries
(compact state ~424 MB) was HBM-resident tables with per-access DMA.
This spike measures exactly that access pattern in isolation:

    x <- T[x]   (T a random permutation; K sequential steps)

with the row fetch either a VMEM dynamic-slice load or an HBM->VMEM
async copy (pltpu.make_async_copy) per access; identical one-hot lane
extraction in both kernels. Reported: ns per dependent access.

Run: python tools/spike_hbm_table.py
"""

from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _extract(rowvec, lane):
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        == lane
    )
    return jnp.sum(jnp.where(onehot, rowvec, 0))


def _vmem_kernel(K, x0_ref, table_ref, out_ref):
    def body(t, x):
        row = x // LANES
        rowvec = table_ref[pl.ds(row, 1), :]
        return _extract(rowvec, x % LANES)

    x = jax.lax.fori_loop(0, K, body, x0_ref[0])
    out_ref[0, :] = jnp.full((LANES,), x, jnp.int32)


def _hbm_kernel(K, x0_ref, table_ref, out_ref):
    def scoped(scratch, sem):
        def body(t, x):
            row = x // LANES
            dma = pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1), :], scratch, sem
            )
            dma.start()
            dma.wait()
            return _extract(scratch[:], x % LANES)

        x = jax.lax.fori_loop(0, K, body, x0_ref[0])
        out_ref[0, :] = jnp.full((LANES,), x, jnp.int32)

    pl.run_scoped(
        scoped,
        scratch=pltpu.VMEM((1, LANES), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _hbm_ilv_kernel(K, B, x0_ref, table_ref, out_ref):
    """B independent chains, B DMAs in flight per iteration — models an
    HBM-table interleaved machine (latency hiding across chains)."""

    def scoped(scratch, sems):
        def body(t, xs):
            # xs: (1, LANES) int32, first B lanes are the chain heads
            lanes_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, LANES), 1
            )
            for b in range(B):
                xb = jnp.sum(jnp.where(lanes_iota == b, xs, 0))
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(xb // LANES, 1), :],
                    scratch.at[pl.ds(b, 1), :],
                    sems.at[b],
                ).start()
            new = jnp.zeros((1, LANES), jnp.int32)
            for b in range(B):
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(0, 1), :],
                    scratch.at[pl.ds(b, 1), :],
                    sems.at[b],
                ).wait()
                xb = jnp.sum(jnp.where(lanes_iota == b, xs, 0))
                got = _extract(scratch[pl.ds(b, 1), :], xb % LANES)
                new = jnp.where(lanes_iota == b, got, new)
            return new

        xs0 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) < B,
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1),
            0,
        )
        xs = jax.lax.fori_loop(0, K, body, xs0)
        out_ref[0, :] = xs[0, :]

    pl.run_scoped(
        scoped,
        scratch=pltpu.VMEM((B, LANES), jnp.int32),
        sems=pltpu.SemaphoreType.DMA((B,)),
    )


def _hbm_fire_kernel(K, B, W_OFF, x0_ref, table_ref, out_ref):
    """The ILV-hbm FIRE-BODY model (round-5 roadmap data): per chain
    per iteration, FOUR single-row DMAs — the rows of children
    {x, x+1, x+W, x+W+1}, the shipped compact_hbm fetch shape — all
    4*B copies in flight before any wait. The chain advances through
    T[x] (dependent); the other three reads fold into a checksum so
    they cannot be dead-code-eliminated."""

    def scoped(scratch, sems):
        def body(t, carry):
            xs, acc = carry
            lanes_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, LANES), 1
            )
            offs = (0, 1, W_OFF, W_OFF + 1)
            cps = []
            for b in range(B):
                xb = jnp.sum(jnp.where(lanes_iota == b, xs, 0))
                for k in range(4):
                    idx = jnp.clip(
                        xb + offs[k], 0,
                        table_ref.shape[0] * LANES - 1,
                    )
                    cp = pltpu.make_async_copy(
                        table_ref.at[pl.ds(idx // LANES, 1), :],
                        scratch.at[pl.ds(4 * b + k, 1), :],
                        sems.at[4 * b + k],
                    )
                    cp.start()
                    cps.append(cp)
            for cp in cps:
                cp.wait()
            new = jnp.zeros((1, LANES), jnp.int32)
            for b in range(B):
                xb = jnp.sum(jnp.where(lanes_iota == b, xs, 0))
                got = _extract(
                    scratch[pl.ds(4 * b, 1), :], xb % LANES
                )
                for k in range(1, 4):
                    idx = jnp.clip(
                        xb + offs[k], 0,
                        table_ref.shape[0] * LANES - 1,
                    )
                    acc = acc + _extract(
                        scratch[pl.ds(4 * b + k, 1), :], idx % LANES
                    )
                new = jnp.where(lanes_iota == b, got, new)
            return (new, acc)

        xs0 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) < B,
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1),
            0,
        )
        xs, acc = jax.lax.fori_loop(
            0, K, body, (xs0, jnp.zeros((), jnp.int32))
        )
        out_ref[0, :] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) < B,
            xs, acc,
        )[0, :]

    pl.run_scoped(
        scoped,
        scratch=pltpu.VMEM((4 * B, LANES), jnp.int32),
        sems=pltpu.SemaphoreType.DMA((4 * B,)),
    )


def build(kind, rows, K, B=8):
    if kind == "vmem":
        kern = functools.partial(_vmem_kernel, K)
    elif kind == "hbm":
        kern = functools.partial(_hbm_kernel, K)
    elif kind == "hbm_fire":
        kern = functools.partial(_hbm_fire_kernel, K, B, 4243)
    else:  # hbm_ilv
        kern = functools.partial(_hbm_ilv_kernel, K, B)
    table_space = (
        pltpu.MemorySpace.VMEM if kind == "vmem"
        else pltpu.MemorySpace.HBM
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=table_space),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=192 * 1024 * 1024,
        ),
    )


def measure(kind, n_log2, K=50_000, reps=5, B=8):
    n = 1 << n_log2
    rows = n // LANES
    rng = np.random.default_rng(7)
    perm = rng.permutation(n).astype(np.int32).reshape(rows, LANES)
    fn = jax.jit(build(kind, rows, K, B))
    x0 = jnp.zeros((1,), jnp.int32)
    jt = jax.device_put(jnp.asarray(perm))
    t0 = time.perf_counter()
    out = np.asarray(fn(x0, jt))
    first = time.perf_counter() - t0
    # correctness: K steps of each chain on the host
    flat = perm.reshape(-1)
    n_chains = B if kind in ("hbm_ilv", "hbm_fire") else 1
    for b in range(n_chains):
        x = b
        for _ in range(K):
            x = int(flat[x])
        assert int(out[0, b]) == x, (kind, n_log2, b, int(out[0, b]), x)
    ts = []
    for _ in range(reps):
        t1 = time.perf_counter()
        np.asarray(fn(x0, jt))
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[reps // 2]
    per_step = 4 if kind == "hbm_fire" else 1
    accesses = K * n_chains * per_step
    ns = med / accesses * 1e9
    label = f"{kind}" + (
        f"xB{B}" if kind in ("hbm_ilv", "hbm_fire") else ""
    )
    print(
        f"{label:10s} N=2^{n_log2} ({n*4/2**20:7.1f} MB): first "
        f"{first:5.1f}s, median {med*1e3:7.2f} ms for {accesses} "
        f"accesses = {ns:8.1f} ns/access",
        file=sys.stderr, flush=True,
    )
    return {"kind": kind, "n_log2": n_log2, "mb": round(n * 4 / 2**20, 1),
            "chains": n_chains, "ns_per_access": round(ns, 1)}


def main():
    res = []
    # same-size head-to-head (both fit VMEM) isolates the DMA latency
    for kind in ("vmem", "hbm"):
        res.append(measure(kind, 17))
    # the 4096^2-class scale: HBM-only (state would be ~424 MB; the
    # table here is the dominant per-access structure)
    for n_log2 in (22, 25, 26):
        res.append(measure("hbm", n_log2))
    # VMEM at its own ceiling for reference
    res.append(measure("vmem", 22))
    # the decisive variant: B chains, B DMAs in flight per iteration —
    # the access pattern an HBM-table INTERLEAVED machine would have.
    # If latency hides across chains, aggregate ns/access drops well
    # below the single-chain DMA latency.
    for B in (8, 16):
        res.append(measure("hbm_ilv", 25, B=B))
    res.append(measure("hbm_ilv", 26, B=16))
    # the ILV-hbm FIRE-BODY model: 4 reads per chain per step (the
    # shipped compact_hbm fetch shape), 4*B DMAs in flight — the
    # roadmap datum for a B-chain interleaved HBM machine
    for B in (4, 8, 16):
        res.append(measure("hbm_fire", 25, K=20_000, B=B))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
