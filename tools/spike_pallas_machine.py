"""Spike stage 2: realistic SPIHT-decoder footprint in one Pallas kernel.

Emulates the per-bit body of the sequential decode machine at the
headline geometry's memory budget: four ~3.4 MB int32 state arrays in
VMEM (rec / lip / lsp / lis analogues) + the stream words, with a
dependent chain of row-granular accesses per iteration:

  read stream row -> extract bit -> read lip row (entry) ->
  masked-RMW rec row -> masked-RMW lsp append row

Answers two go/no-go questions for the Pallas decoder port:
  1. does a ~14 MB VMEM-resident kernel compile for the v5e?
  2. what is the marginal ns/iteration of a 4-5 row-op dependent body?

Run: python tools/spike_pallas_machine.py [K] [--interpret] [--mb N]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


LANES = 128


def build(rows_state, rows_words, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    size = rows_state * LANES

    def kernel(words_ref, niter_ref, out_ref, rec_ref, lip_ref,
               lsp_ref, lis_ref):
        n = niter_ref[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body(it, carry):
            pos, acc, lsp_cnt = carry
            # 1. stream bit: row read + one-hot extract (bit position
            #    chain mirrors cur advancing data-dependently)
            wrow = words_ref[pl.ds((pos // LANES) % rows_words, 1), :]
            word = jnp.sum(
                jnp.where(lanes == pos % LANES, wrow, 0),
                dtype=jnp.int32,
            )
            bit = (word >> (pos & 31)) & 1
            # 2. queue entry: dependent row read from lip
            erow = lip_ref[pl.ds((acc % size) // LANES, 1), :]
            ent = jnp.sum(
                jnp.where(lanes == acc % LANES, erow, 0),
                dtype=jnp.int32,
            )
            node = (ent ^ word) % size
            # 3. rec masked RMW at the entry's node
            rrow_i = node // LANES
            rrow = rec_ref[pl.ds(rrow_i, 1), :]
            rec_ref[pl.ds(rrow_i, 1), :] = jnp.where(
                lanes == node % LANES, rrow + bit + 1, rrow
            )
            # 4. lsp append masked RMW at the running count
            arow_i = (lsp_cnt // LANES) % rows_state
            arow = lsp_ref[pl.ds(arow_i, 1), :]
            lsp_ref[pl.ds(arow_i, 1), :] = jnp.where(
                lanes == lsp_cnt % LANES, node, arow
            )
            # 5. occasional lis touch (every iteration reads; keeps the
            #    4th array live in the footprint)
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

        pos, acc, cnt = jax.lax.fori_loop(
            0, n, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        )
        out_ref[0, 0] = pos
        out_ref[0, 1] = acc
        out_ref[0, 2] = cnt

    return jax.jit(
        lambda words, niter: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 4), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((rows_state, LANES), jnp.int32)
                for _ in range(4)
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
    mb = 3.4
    for i, a in enumerate(sys.argv):
        if a == "--mb":
            mb = float(sys.argv[i + 1])
    rows_state = int(mb * 1024 * 1024 / 4 / LANES)
    rows_words = 1024  # 512 KB stream
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    total = (4 * rows_state + rows_words) * LANES * 4 / 1e6
    print(
        f"backend={jax.default_backend()} K={k} state 4x{mb} MB "
        f"(total VMEM ~{total:.1f} MB)",
        flush=True,
    )
    rng = np.random.default_rng(0)
    words = jnp.asarray(
        rng.integers(0, 2**31 - 1, (rows_words, LANES), dtype=np.int32)
    )
    fn = build(rows_state, rows_words, interpret)
    ks = [k // 4, k]
    meds = []
    for kk in ks:
        niter = jnp.asarray([kk], jnp.int32)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(words, niter))
        first = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            out = jax.block_until_ready(fn(words, niter))
            ts.append(time.perf_counter() - t1)
        med = sorted(ts)[1]
        meds.append(med)
        print(
            f"K={kk}: compile {first:.1f}s, median {med*1e3:.2f} ms, "
            f"out={np.asarray(out).ravel()[:3]}",
            flush=True,
        )
    slope = (meds[-1] - meds[0]) / (ks[-1] - ks[0])
    print(f"marginal {slope*1e9:.1f} ns/iter", flush=True)


if __name__ == "__main__":
    main()
