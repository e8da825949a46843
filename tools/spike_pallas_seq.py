"""Spike: per-iteration latency of a dependent scalar chain, Pallas vs XLA.

The device decoder's sequential LIS machine (codec/device_decoder.py) is
latency-bound: each fire does a dependent chain of (dynamic word read ->
scalar ALU -> dynamic write), measured at ~10 us/iteration as an XLA
while_loop on the v5e (BASELINE.md). This spike measures the SAME access
pattern as a single Pallas kernel holding all state in VMEM, to decide
whether a Pallas port of the bit machine is worth building.

Run: python tools/spike_pallas_seq.py [K] [--interpret]
Prints ns/iteration for both formulations.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


ROWS, LANES = 1024, 128  # 128K words of "stream" state


def _chain_step(pos, acc, word):
    """One dependent step mimicking a decoder fire: use the fetched word
    to advance the cursor a data-dependent distance and fold into acc."""
    step = (word >> (pos & 7)) & 7
    acc = acc ^ (word + pos)
    pos = (pos + 1 + step) & (ROWS * LANES - 1)
    return pos, acc


def pallas_kernel(words_ref, niter_ref, out_ref):
    import jax.experimental.pallas as pl  # noqa: F401

    n = niter_ref[0]

    def body(_, carry):
        pos, acc = carry
        word = words_ref[pos // LANES, pos % LANES]
        return _chain_step(pos, acc, word)

    pos, acc = jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))
    out_ref[0, 0] = pos
    out_ref[0, 1] = acc


def pallas_kernel_onehot(words_ref, niter_ref, out_ref):
    """Variant: vector row read + one-hot lane extraction (in case scalar
    dynamic lane indexing lowers poorly)."""
    n = niter_ref[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def body(_, carry):
        pos, acc = carry
        row = words_ref[pl.ds(pos // LANES, 1), :]
        word = jnp.sum(
            jnp.where(lanes == pos % LANES, row, 0), dtype=jnp.int32
        )
        return _chain_step(pos, acc, word)

    import jax.experimental.pallas as pl

    pos, acc = jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))
    out_ref[0, 0] = pos
    out_ref[0, 1] = acc


def pallas_kernel_rw(words_ref, niter_ref, out_ref, state_ref):
    """Variant: one dynamic read + one dynamic state write per iteration
    (the decoder fire pattern: fetch geometry/bits, update rec/queues)."""
    n = niter_ref[0]

    def body(_, carry):
        pos, acc = carry
        word = words_ref[pos // LANES, pos % LANES]
        pos2, acc2 = _chain_step(pos, acc, word)
        state_ref[acc2 % (ROWS * LANES) // LANES,
                  acc2 % LANES] = pos2
        return pos2, acc2

    pos, acc = jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))
    out_ref[0, 0] = pos
    out_ref[0, 1] = acc


def build_pallas_rw(interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax.jit(
        lambda words, niter: pl.pallas_call(
            pallas_kernel_rw,
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32)],
            interpret=interpret,
        )(words, niter)
    )


def build_pallas(kernel, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax.jit(
        lambda words, niter: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            interpret=interpret,
        )(words, niter)
    )


def xla_loop(words, niter):
    def body(_, carry):
        pos, acc = carry
        word = words[pos // LANES, pos % LANES]
        return _chain_step(pos, acc, word)

    pos, acc = jax.lax.fori_loop(
        0, niter, body, (jnp.int32(0), jnp.int32(0))
    )
    return jnp.stack([pos, acc])


def measure(tag, fn, args, k):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    first = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[1]
    print(f"{tag}: compile {first:.1f}s, median {med*1e3:.2f} ms "
          f"= {med/k*1e9:.0f} ns/iter, out={np.asarray(out).ravel()[:2]}",
          flush=True)
    return med


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    interpret = "--interpret" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend={jax.default_backend()} K={k}", flush=True)
    rng = np.random.default_rng(0)
    words = jnp.asarray(
        rng.integers(0, 2**31 - 1, (ROWS, LANES), dtype=np.int32)
    )
    niter = jnp.asarray([k], jnp.int32)

    xla = jax.jit(xla_loop, static_argnums=1)
    measure("xla while_loop ", lambda w: xla(w, k), (words,), k)

    global pl  # for the onehot kernel's pl.ds
    import jax.experimental.pallas as pl  # noqa: F811

    for tag, kern in (
        ("pallas scalar  ", pallas_kernel),
        ("pallas one-hot ", pallas_kernel_onehot),
    ):
        try:
            fn = build_pallas(kern, interpret)
            measure(tag, fn, (words, niter), k)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
    try:
        fn = build_pallas_rw(interpret)
        measure("pallas rd+wr   ", fn, (words, niter), k)
    except Exception as e:
        print(f"pallas rd+wr   : FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
