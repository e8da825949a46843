"""Spike stage 3: vector-block primitives for the hybrid Pallas encoder.

The sequential machines (codec/pallas_{en,de}coder.py) pay ~300 ns per
queue entry on the dependent scalar chain. The LIP and refinement passes
have NO cross-entry value dependence (bits come from precomputed maps),
so a whole 128-lane row can be emitted per iteration IF Mosaic supports:

  1. prefix sums via a triangular (1,128)@(128,128) f32 matmul (exact:
     summands <= 2, totals <= 256 < 2^24)
  2. order-preserving compaction via one-hot permute matmuls, values
     split into 16-bit halves for f32 exactness, destinations spanning
     a 2-row window of the target queue
  3. variable-length bit-group emission: per-lane variable shifts +
     masked lane-reductions into a small static word window, OR-merged
     into the words buffer (disjoint bits => sum == or)
  4. (optional) pltpu.roll with a dynamic shift for block copies

This spike validates each primitive against numpy in interpret mode and
measures the marginal cost per block iteration on hardware.

Run: python tools/spike_pallas_block.py [K] [--interpret]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
_I32 = jnp.int32
W_WIN = 10  # emission window words (128 lanes * 2 bits + 31 skew)


def build(rows_state, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(mag_ref, tri_ref, sc_ref, out_ref, lsp_ref, lip_ref,
               words_ref):
        niter = sc_ref[0]
        tri = tri_ref[:]  # (128,128) f32: tri[j,c]=1 iff j<c
        eye = (
            jax.lax.broadcasted_iota(_I32, (LANES, LANES), 0)
            == jax.lax.broadcasted_iota(_I32, (LANES, LANES), 1)
        ).astype(jnp.float32)
        lsp_ref[:] = jnp.zeros((rows_state, LANES), _I32)
        lip_ref[:] = jnp.zeros((rows_state, LANES), _I32)
        words_ref[:] = jnp.zeros((rows_state, LANES), _I32)

        def prefix(v_i32):
            # exclusive prefix sum over lanes: (1,128)@(128,128)
            f = v_i32.astype(jnp.float32)
            return jnp.dot(
                f, tri, preferred_element_type=jnp.float32
            ).astype(_I32)

        def permute2(vals, dest, keep):
            """Order-preserving scatter of kept lanes to dest (0..255):
            two (1,128) rows via one-hot matmuls, 16-bit halves."""
            lo = (vals & 0xFFFF).astype(jnp.float32)
            hi = jax.lax.shift_right_logical(vals, 16).astype(
                jnp.float32
            )
            out_rows = []
            colf = jax.lax.broadcasted_iota(
                _I32, (LANES, LANES), 1
            ).astype(jnp.float32)
            # move dest to the SUBLANE axis via an MXU transpose:
            # broadcast d along sublanes, contract dim0 with identity
            dm = jnp.where(keep, dest, -1).astype(jnp.float32)
            d_t = jax.lax.dot_general(
                jnp.broadcast_to(dm, (LANES, LANES)),
                eye,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # d_t[j, :] == dest of source lane j (or -1)
            for r in range(2):
                # P[j, c] = 1 where lane j lands in column c of row r
                p = (d_t - (r * LANES) == colf).astype(jnp.float32)
                plo = jnp.dot(lo, p, preferred_element_type=jnp.float32)
                phi = jnp.dot(hi, p, preferred_element_type=jnp.float32)
                row = plo.astype(_I32) | (phi.astype(_I32) << 16)
                msk = jnp.dot(
                    jnp.ones((1, LANES), jnp.float32),
                    p,
                    preferred_element_type=jnp.float32,
                ).astype(_I32)
                out_rows.append((row, msk))
            return out_rows

        def body(it, carry):
            pos, lsp_cnt, lip_w, acc = carry
            row_i = it % rows_state
            mag = mag_ref[pl.ds(row_i, 1), :]
            n = it % 8
            sig = (jax.lax.shift_right_logical(mag, n) != 0).astype(
                _I32
            )
            sgn = (jax.lax.shift_right_logical(mag, 31) & 1).astype(
                _I32
            )
            # --- 1. prefix sums, nominal bit offsets ---
            kk = 1 + sig
            pre = prefix(kk)
            off = pos + pre
            grp = sig | (sgn << 1)
            # --- 3. emission window: per-lane shifts + reductions ---
            base = pos >> 5
            sub = off & 31
            rel = (off >> 5) - base
            lo = grp << sub
            spill = jnp.where(
                sub == 0,
                0,
                jax.lax.shift_right_logical(
                    grp, jnp.clip(32 - sub, 0, 31)
                ),
            )
            words = []
            for j in range(W_WIN):
                wj = jnp.sum(
                    jnp.where(rel == j, lo, 0), dtype=_I32
                ) + jnp.sum(jnp.where(rel == (j - 1), spill, 0),
                            dtype=_I32)
                words.append(wj)
            # merge window into words buffer rows (2 rows max)
            wcol = jax.lax.broadcasted_iota(_I32, (1, LANES), 1)
            r0 = base // LANES
            c0 = base % LANES
            merged = jnp.zeros((1, LANES), _I32)
            m1 = jnp.zeros((1, LANES), _I32)
            for j in range(W_WIN):
                tgt = c0 + j
                merged = merged | jnp.where(
                    wcol == tgt, words[j], 0
                )
                m1 = m1 | jnp.where(wcol == tgt - LANES, words[j], 0)
            wrow = words_ref[pl.ds(r0 % rows_state, 1), :]
            words_ref[pl.ds(r0 % rows_state, 1), :] = wrow | merged
            wrow1 = words_ref[pl.ds((r0 + 1) % rows_state, 1), :]
            words_ref[pl.ds((r0 + 1) % rows_state, 1), :] = wrow1 | m1
            # --- 2. compaction: commits -> lsp, retains -> lip ---
            commit = sig == 1
            dest_c = lsp_cnt % LANES + prefix(commit.astype(_I32))
            rows_c = permute2(mag, dest_c.astype(_I32), commit)
            lr0 = (lsp_cnt // LANES) % rows_state
            for r, (rowv, msk) in enumerate(rows_c):
                old = lsp_ref[pl.ds((lr0 + r) % rows_state, 1), :]
                lsp_ref[pl.ds((lr0 + r) % rows_state, 1), :] = (
                    jnp.where(msk != 0, rowv, old)
                )
            ncommit = jnp.sum(commit.astype(_I32), dtype=_I32)
            retain = sig == 0
            dest_r = lip_w % LANES + prefix(retain.astype(_I32))
            rows_r = permute2(mag, dest_r.astype(_I32), retain)
            pr0 = (lip_w // LANES) % rows_state
            for r, (rowv, msk) in enumerate(rows_r):
                old = lip_ref[pl.ds((pr0 + r) % rows_state, 1), :]
                lip_ref[pl.ds((pr0 + r) % rows_state, 1), :] = (
                    jnp.where(msk != 0, rowv, old)
                )
            nretain = jnp.sum(retain.astype(_I32), dtype=_I32)
            pos = pos + jnp.sum(kk, dtype=_I32)
            acc = acc ^ jnp.sum(grp, dtype=_I32)
            return (pos, lsp_cnt + ncommit, lip_w + nretain, acc)

        z = jnp.zeros((), _I32)
        pos, lsp_cnt, lip_w, acc = jax.lax.fori_loop(
            0, niter, body, (z, z, z, z)
        )
        out_ref[0, 0] = pos
        out_ref[0, 1] = lsp_cnt
        out_ref[0, 2] = lip_w
        out_ref[0, 3] = acc

    return jax.jit(
        lambda mag, tri, sc: pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((1, 4), jnp.int32),
                jax.ShapeDtypeStruct((rows_state, LANES), jnp.int32),
                jax.ShapeDtypeStruct((rows_state, LANES), jnp.int32),
                jax.ShapeDtypeStruct((rows_state, LANES), jnp.int32),
            ],
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            interpret=interpret,
        )(mag, tri, sc)
    )


def ref_model(mag2d, niter, rows_state):
    """Numpy model of the kernel for the correctness check."""
    pos = lsp_cnt = lip_w = acc = 0
    lsp = np.zeros(rows_state * LANES, np.int64)
    lip = np.zeros(rows_state * LANES, np.int64)
    words = np.zeros(rows_state * LANES, np.uint64)
    size = rows_state * LANES
    for it in range(niter):
        mag = mag2d[it % rows_state].astype(np.int64)
        n = it % 8
        sig = ((mag & 0xFFFFFFFF) >> n) != 0
        sgn = (mag >> 31) & 1
        grp = sig.astype(np.int64) | (sgn << 1)
        kk = 1 + sig.astype(np.int64)
        off = pos + np.concatenate([[0], np.cumsum(kk)[:-1]])
        base_word = pos >> 5
        for j in range(LANES):
            w = int(off[j]) >> 5
            s = int(off[j]) & 31
            words[w % size] |= np.uint64((int(grp[j]) << s) & 0xFFFFFFFF)
            if s and (int(grp[j]) >> (32 - s)):
                words[(w + 1) % size] |= np.uint64(
                    int(grp[j]) >> (32 - s)
                )
        del base_word
        for j in range(LANES):
            if sig[j]:
                lsp[lsp_cnt % size] = mag[j] & 0xFFFFFFFF
                lsp_cnt += 1
            else:
                lip[lip_w % size] = mag[j] & 0xFFFFFFFF
                lip_w += 1
        pos += int(kk.sum())
        acc ^= int(grp.sum()) & 0xFFFFFFFF
    return pos, lsp_cnt, lip_w, lsp, lip, words


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 2000
    interpret = "--interpret" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    rows_state = 512  # 256 KB per state array
    print(f"backend={jax.default_backend()} K={k}", flush=True)
    rng = np.random.default_rng(0)
    # small mixed magnitudes so sig varies with the plane n (= it % 8)
    mag = rng.integers(0, 512, (rows_state, LANES), np.int64)
    mag = (mag | (rng.integers(0, 2, mag.shape) << 31)).astype(np.int64)
    mag_i32 = mag.astype(np.uint32).view(np.int32).astype(np.int32)
    tri = np.triu(np.ones((LANES, LANES), np.float32), 1)
    fn = build(rows_state, interpret)

    if interpret:
        niter = 24
        out, lsp, lip, words = fn(
            jnp.asarray(mag_i32), jnp.asarray(tri),
            jnp.asarray([niter], np.int32),
        )
        out = np.asarray(out).ravel()
        pos, lsp_cnt, lip_w, rlsp, rlip, rwords = ref_model(
            mag_i32, niter, rows_state
        )
        assert out[0] == pos, (out[0], pos)
        assert out[1] == lsp_cnt, (out[1], lsp_cnt)
        assert out[2] == lip_w, (out[2], lip_w)
        got_lsp = np.asarray(lsp).ravel().astype(np.uint32)
        got_lip = np.asarray(lip).ravel().astype(np.uint32)
        np.testing.assert_array_equal(
            got_lsp[:lsp_cnt], rlsp[:lsp_cnt].astype(np.uint32)
        )
        np.testing.assert_array_equal(
            got_lip[:lip_w], rlip[:lip_w].astype(np.uint32)
        )
        nw = (pos + 31) // 32
        got_w = np.asarray(words).ravel().astype(np.uint32)
        np.testing.assert_array_equal(
            got_w[:nw], rwords[:nw].astype(np.uint32)
        )
        print("interpret correctness OK "
              f"(pos={pos} lsp={lsp_cnt} lip={lip_w} words={nw})",
              flush=True)
        return

    meds = []
    ks = [k // 4, k]
    for kk in ks:
        sc = jnp.asarray([kk], np.int32)
        t0 = time.perf_counter()
        out = fn(jnp.asarray(mag_i32), jnp.asarray(tri), sc)
        out = [np.asarray(o) for o in out]
        first = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            out = fn(jnp.asarray(mag_i32), jnp.asarray(tri), sc)
            out = [np.asarray(o) for o in out]
            ts.append(time.perf_counter() - t1)
        med = sorted(ts)[1]
        meds.append(med)
        print(
            f"K={kk}: compile {first:.1f}s, median {med*1e3:.2f} ms, "
            f"out={out[0].ravel()}",
            flush=True,
        )
    slope = (meds[-1] - meds[0]) / (ks[-1] - ks[0])
    print(
        f"marginal {slope*1e9:.1f} ns/block-iter "
        f"= {slope*1e9/LANES:.1f} ns/entry",
        flush=True,
    )


if __name__ == "__main__":
    main()
