"""Spike: per-iteration latency of a dependent scalar chain, Pallas vs XLA.

The device decoder's sequential LIS machine (codec/device_decoder.py) is
latency-bound: each fire does a dependent chain of (dynamic word read ->
scalar ALU -> dynamic write), measured at ~10 us/iteration as an XLA
while_loop on the v5e (BASELINE.md). This spike measures the SAME access
pattern as a single Pallas kernel holding state in VMEM, to decide
whether a Pallas port of the bit machine is worth building.

Hardware findings (v5e, recorded in BASELINE.md):
  * scalar dynamic indexing of VMEM refs (`ref[i, j]` with traced i,j)
    does not lower (Mosaic INTERNAL error); scalar stores to VMEM are
    rejected outright. Every VMEM access must be a (1, LANES) row
    slice; lane extraction = one-hot reduction, lane write = masked
    row read-modify-write.
  * XLA while_loop timing is K-scaled to separate fixed dispatch
    overhead from true per-iteration latency.

Run: python tools/spike_pallas_seq.py [K] [--interpret] [--big]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


ROWS, LANES = 1024, 128  # 512 KB of "stream" state (--big: 16 MB, HBM-ish)


def _chain_step(pos, acc, word, size):
    """One dependent step mimicking a decoder fire: use the fetched word
    to advance the cursor a data-dependent distance and fold into acc."""
    step = (word >> (pos & 7)) & 7
    acc = acc ^ (word + pos)
    pos = (pos + 1 + step) & (size - 1)
    return pos, acc


def make_xla_loop(rows):
    size = rows * LANES

    def xla_loop(words, niter):
        def body(_, carry):
            pos, acc = carry
            word = words[pos // LANES, pos % LANES]
            return _chain_step(pos, acc, word, size)

        pos, acc = jax.lax.fori_loop(
            0, niter, body, (jnp.int32(0), jnp.int32(0))
        )
        return jnp.stack([pos, acc])

    return xla_loop


def make_onehot_kernel(rows, with_write):
    import jax.experimental.pallas as pl

    size = rows * LANES

    def kernel(words_ref, niter_ref, out_ref, *scratch):
        n = niter_ref[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body(_, carry):
            pos, acc = carry
            row = words_ref[pl.ds(pos // LANES, 1), :]
            word = jnp.sum(
                jnp.where(lanes == pos % LANES, row, 0), dtype=jnp.int32
            )
            pos2, acc2 = _chain_step(pos, acc, word, size)
            if with_write:
                st = scratch[0]
                wrow = (acc2 % size) // LANES
                wlane = acc2 % LANES
                old = st[pl.ds(wrow, 1), :]
                st[pl.ds(wrow, 1), :] = jnp.where(
                    lanes == wlane, pos2, old
                )
            return pos2, acc2

        pos, acc = jax.lax.fori_loop(
            0, n, body, (jnp.int32(0), jnp.int32(0))
        )
        out_ref[0, 0] = pos
        out_ref[0, 1] = acc

    return kernel


def build_pallas(rows, with_write, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = make_onehot_kernel(rows, with_write)
    scratch = (
        [pltpu.VMEM((rows, LANES), jnp.int32)] if with_write else []
    )
    return jax.jit(
        lambda words, niter: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=scratch,
            interpret=interpret,
        )(words, niter)
    )


def measure(tag, fn, argses, ks):
    """Time fn at several iteration counts; report the marginal
    ns/iteration (slope), which cancels fixed dispatch overhead."""
    outs = []
    meds = []
    for args, k in zip(argses, ks):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        first = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t1)
        meds.append(sorted(ts)[1])
        outs.append(np.asarray(out).ravel()[:2])
    slope = (meds[-1] - meds[0]) / (ks[-1] - ks[0])
    print(
        f"{tag}: "
        + ", ".join(f"K={k}: {m*1e3:.2f} ms" for k, m in zip(ks, meds))
        + f" -> marginal {slope*1e9:.1f} ns/iter, out={outs[-1]}",
        flush=True,
    )


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    interpret = "--interpret" in sys.argv
    rows = ROWS * 32 if "--big" in sys.argv else ROWS
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    print(
        f"backend={jax.default_backend()} K={k} "
        f"array={rows*LANES*4//1024} KB",
        flush=True,
    )
    rng = np.random.default_rng(0)
    words = jnp.asarray(
        rng.integers(0, 2**31 - 1, (rows, LANES), dtype=np.int32)
    )
    ks = [k // 4, k]

    xla = jax.jit(make_xla_loop(rows), static_argnums=1)
    measure(
        "xla while_loop ",
        lambda w, n: xla(w, n),
        [(words, kk) for kk in ks],
        ks,
    )

    for tag, with_write in (
        ("pallas one-hot r ", False),
        ("pallas one-hot rw", True),
    ):
        try:
            fn = build_pallas(rows, with_write, interpret)
            measure(
                tag,
                fn,
                [(words, jnp.asarray([kk], jnp.int32)) for kk in ks],
                ks,
            )
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
