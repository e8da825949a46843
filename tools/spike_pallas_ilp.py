"""Spike: do B interleaved dependent chains overlap inside one kernel?

The Pallas bit machines are latency-bound on a per-iteration dependent
chain of row-granular VMEM accesses (~300 ns/iter measured by
spike_pallas_machine.py). Batched encode/decode via lax.map serializes
B kernels, so per-chip throughput stays single-stream. The candidate
fix is ONE kernel stepping B independent machines per loop iteration
(separate scalar carries + separate state arrays per lane): if the
core's scoreboard overlaps the B chains' VMEM latencies, the marginal
cost per iteration grows far slower than B, and batched throughput
approaches B x single-stream.

This spike measures exactly that: the per-iteration body of
spike_pallas_machine.py (stream-row read -> one-hot extract -> queue
row read -> two masked row RMWs -> dependent row read), unrolled over
B lanes with independent scalar carries and per-lane scratch arrays.

Run: python tools/spike_pallas_ilp.py [K] [--mb N] [--interpret]
Prints marginal ns/iter for B in {1, 2, 4, 8}; ILP factor = B * slope(1)/slope(B).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def build(B, rows_state, rows_words, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    size = rows_state * LANES

    def kernel(words_ref, niter_ref, out_ref, *state):
        # state = B * 4 scratch arrays: rec_b, lip_b, lsp_b, lis_b
        n = niter_ref[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def chain_step(b, pos, acc, lsp_cnt):
            rec_ref = state[4 * b + 0]
            lip_ref = state[4 * b + 1]
            lsp_ref = state[4 * b + 2]
            lis_ref = state[4 * b + 3]
            wrow = words_ref[pl.ds((pos // LANES) % rows_words, 1), :]
            word = jnp.sum(
                jnp.where(lanes == pos % LANES, wrow, 0), dtype=jnp.int32
            )
            bit = (word >> (pos & 31)) & 1
            erow = lip_ref[pl.ds((acc % size) // LANES, 1), :]
            ent = jnp.sum(
                jnp.where(lanes == acc % LANES, erow, 0), dtype=jnp.int32
            )
            node = (ent ^ word) % size
            rrow_i = node // LANES
            rrow = rec_ref[pl.ds(rrow_i, 1), :]
            rec_ref[pl.ds(rrow_i, 1), :] = jnp.where(
                lanes == node % LANES, rrow + bit + 1, rrow
            )
            arow_i = (lsp_cnt // LANES) % rows_state
            arow = lsp_ref[pl.ds(arow_i, 1), :]
            lsp_ref[pl.ds(arow_i, 1), :] = jnp.where(
                lanes == lsp_cnt % LANES, node, arow
            )
            lrow = lis_ref[pl.ds((node * 7 % size) // LANES, 1), :]
            lval = jnp.sum(
                jnp.where(lanes == (node * 7) % LANES, lrow, 0),
                dtype=jnp.int32,
            )
            acc2 = acc ^ (word + pos + lval)
            pos2 = (pos + 1 + ((word >> (pos & 7)) & 7)) % (
                rows_words * LANES
            )
            return pos2, acc2, lsp_cnt + (bit == 1).astype(jnp.int32)

        def body(it, carry):
            # carry: tuple of 3B scalars; the B chains share no values,
            # so the compiler is free to overlap their memory latencies
            out = []
            for b in range(B):
                pos, acc, cnt = carry[3 * b: 3 * b + 3]
                out.extend(chain_step(b, pos, acc, cnt))
            return tuple(out)

        init = tuple(
            jnp.int32(v)
            for b in range(B)
            for v in (b * 37, b * 101, 0)
        )
        fin = jax.lax.fori_loop(0, n, body, init)
        for b in range(B):
            out_ref[0, 3 * b] = fin[3 * b]
            out_ref[0, 3 * b + 1] = fin[3 * b + 1]
            out_ref[0, 3 * b + 2] = fin[3 * b + 2]

    return jax.jit(
        lambda words, niter: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 3 * B + 1), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((rows_state, LANES), jnp.int32)
                for _ in range(4 * B)
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            interpret=interpret,
        )(words, niter)
    )


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    interpret = "--interpret" in sys.argv
    mb = 2.0
    for i, a in enumerate(sys.argv):
        if a == "--mb":
            mb = float(sys.argv[i + 1])
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    rows_words = 1024
    rng = np.random.default_rng(0)
    words = jnp.asarray(
        rng.integers(0, 2**31 - 1, (rows_words, LANES), dtype=np.int32)
    )
    slopes = {}
    for B in (1, 2, 4, 8):
        rows_state = int(mb * 1024 * 1024 / 4 / LANES)
        total = (4 * B * rows_state + rows_words) * LANES * 4 / 1e6
        fn = build(B, rows_state, rows_words, interpret)
        ks = [k // 4, k]
        meds = []
        for kk in ks:
            niter = jnp.asarray([kk], jnp.int32)
            t0 = time.perf_counter()
            out = np.asarray(fn(words, niter))  # materialize (tunnel!)
            first = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t1 = time.perf_counter()
                out = np.asarray(fn(words, niter))
                ts.append(time.perf_counter() - t1)
            meds.append(sorted(ts)[1])
        slope = (meds[-1] - meds[0]) / (ks[-1] - ks[0])
        slopes[B] = slope
        ilp = B * slopes[1] / slope if slopes.get(1) else float("nan")
        print(
            f"B={B}: state {total:.0f} MB, compile {first:.1f}s, "
            f"marginal {slope*1e9:.1f} ns/iter (B chains/iter), "
            f"per-chain {slope*1e9/B:.1f} ns, ILP {ilp:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
