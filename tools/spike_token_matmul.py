"""Can the decoder's LIP token scan move from VPU to MXU?

token_heads (codec/pallas_decoder.py) finds the token-start lanes of a
128-bit window under the LIP grammar (token = [0] or [1,sign]) by
pointer doubling: 7 stages x ~6 strictly-sequential VPU ops. The
interleaved machines are VPU-ISSUE-bound (BASELINE.md ILP spike), so
offloading the scan to the MXU could shorten the per-iteration chain:
heads = lanes reachable from lane 0 in the successor graph
succ(p) = p + 1 + bit(p), computed as a boolean matrix closure —
M = (I | S)^128 via 7 squarings of a 128x128 f32 matmul (values stay
0/1 <= 128 per dot: exact in f32 at Precision.HIGHEST), heads =
row 0 of M.

This spike runs K iterations of each formulation inside ONE Pallas
kernel (serialized by a carry, like the real phase loop) on hardware
and reports ns/iteration. Equality of the two head vectors is asserted
on every iteration's input.

Run: python tools/spike_token_matmul.py [K]
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

LANES = 128
_I32 = jnp.int32


def build(kind: str, K: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        lanes = lax.broadcasted_iota(_I32, (1, LANES), 1)
        sq0 = lax.broadcasted_iota(_I32, (LANES, LANES), 0)
        sq1 = lax.broadcasted_iota(_I32, (LANES, LANES), 1)
        eye = (sq0 == sq1).astype(jnp.float32)

        def shift_lanes(v, d, fill):
            return jnp.where(lanes < d, fill, jnp.roll(v, d, axis=1))

        def heads_vpu(b):
            fh = b
            ft = jnp.zeros((1, LANES), _I32)
            d = 1
            while d < LANES:
                gh = shift_lanes(fh, d, 0)
                gt = shift_lanes(ft, d, 1)
                nh = jnp.where(gh == 0, fh, ft)
                nt = jnp.where(gt == 0, fh, ft)
                fh, ft = nh, nt
                d *= 2
            sb = shift_lanes(fh, 1, 0)
            return (sb == 0).astype(_I32)

        def heads_mxu(b):
            # bT[p, :] = b[p] (transpose onto the sublane axis)
            bT = lax.dot_general(
                jnp.broadcast_to(b.astype(jnp.float32), (LANES, LANES)),
                eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            step = (sq1 == sq0 + 1 + bT.astype(_I32)).astype(jnp.float32)
            m = eye + step
            for _ in range(7):  # (I|S)^128
                mm = jnp.dot(
                    m, m, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
                m = (mm > 0).astype(jnp.float32)
            # row 0 of the closure IS the reachability set from lane 0
            return (m[0:1, :] > 0).astype(_I32)

        def heads_mxu_bf16(b):
            # 0/1 matrices are exact in bf16; MXU accumulates in f32,
            # dots <= 128 < 256 stay exact -> DEFAULT 1-pass matmuls
            bT = lax.dot_general(
                jnp.broadcast_to(b.astype(jnp.float32), (LANES, LANES)),
                eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            step = (sq1 == sq0 + 1 + bT.astype(_I32))
            m = (eye > 0) | step
            for _ in range(7):  # (I|S)^128
                mf = m.astype(jnp.bfloat16)
                mm = jnp.dot(
                    mf, mf, preferred_element_type=jnp.float32,
                )
                m = mm > 0
            return m[0:1, :].astype(_I32)

        def body(i, carry):
            acc, seed = carry
            b = (x_ref[pl.ds(i % 64, 1), :] ^ seed) & 1
            if kind == "vpu":
                h = heads_vpu(b)
            elif kind == "mxu":
                h = heads_mxu(b)
            elif kind == "mxu_bf16":
                h = heads_mxu_bf16(b)
            else:  # both: assert equality, count mismatches
                h = heads_vpu(b)
                h2 = heads_mxu(b)
                h3 = heads_mxu_bf16(b)
                acc = acc + (jnp.sum(
                    jnp.abs(h - h2), dtype=_I32
                ) + jnp.sum(jnp.abs(h - h3), dtype=_I32)) * 1000000
            s = jnp.sum(h, dtype=_I32)
            return acc + s, (seed + s) & 1

        acc, _ = lax.fori_loop(
            0, K, body, (jnp.zeros((), _I32), jnp.zeros((), _I32))
        )
        o_ref[0, 0] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        interpret=interpret,
    )

    @jax.jit
    def fn(x):
        return call(x)[0]

    return fn


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(3)
    x = jax.device_put(jnp.asarray(
        rng.integers(0, 2**30, (64, LANES)).astype(np.int32)
    ))
    print(f"backend={jax.default_backend()} K={K}", flush=True)

    # correctness first (small K)
    both = build("both", 512, interpret)
    acc = int(np.asarray(both(x))[0, 0])
    assert acc < 1000000, f"MISMATCH: {acc}"
    print(f"equality over 512 windows: ok (acc={acc})", flush=True)

    for kind in ("vpu", "mxu", "mxu_bf16"):
        fn = build(kind, K, interpret)
        np.asarray(fn(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{kind}: {med / K * 1e9:.0f} ns/iter (total {med*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
