"""Pallas sequential SPIHT decoder: the whole bit machine in ONE TPU kernel.

Why: the XLA formulations of the decode machine are latency-bound — every
iteration of a `lax.while_loop` pays ~2 us on dependent HBM-resident
dynamic slices (measured, tools/spike_pallas_seq.py), so the hybrid
machine (device_decoder._build_hybrid) had to parallelize the LIP and
refinement sections and run-skip the LIS worklist to reach 1.77 s / 10.8 s
at the 3x512x512/L6 headline geometry (BASELINE.md). Inside a Pallas
kernel the same dependent chain costs ~70-330 ns per row-granular access
(tools/spike_pallas_machine.py): the ENTIRE sequential machine — LIP,
LIS cascades, refinement — fits in one kernel with all queue state
VMEM-resident (~21 MB at the headline geometry, vmem_limit_bytes=40 MB),
processing one queue entry per inner-loop iteration.

Semantics are IDENTICAL to device_decoder._build_decoder (the proven
sequential machine): same pop-ladder truncation flags, same queue
orders, same duplicate-parent in-place rec writes — the reference
contract of /root/reference/src/encoder_decoder.rs:307-454. Plain decode
only (the metadata trace writes per-bit rows that exceed VMEM; that path
stays on the XLA machine).

TPU-specific mechanics:
  * Mosaic rejects scalar dynamic indexing of VMEM (`ref[i, j]` with
    traced i) and scalar stores; every access is a (1, 128) row
    dynamic-slice — reads extract the lane by one-hot reduction, writes
    are masked row read-modify-writes (the `want` mask doubles as the
    write predicate, so inactive writes need no scratch-slot redirect).
  * Bit reads use a 2-word funnel window: the <= 9-bit LIS cascade and
    the 2-bit LIP grammar both live in 32 bits from `cur`, so each
    iteration reads the words array once (two adjacent lanes).
  * The per-plane LIP/LIS double buffers of the XLA machine become
    single-buffer in-place FIFOs: within a pass the retain cursor
    trails the read cursor, and same-pass LIS appends land at the live
    tail, so compaction never overwrites unread entries.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .device_decoder import _dec_geom, _words_of
from .tree_bounds import QueueBounds, narrowed_caps, queue_bounds

__all__ = [
    "pallas_decode_fn", "pallas_decode",
    "MachineResourceLimit", "machine_vmem_bytes", "machine_fits",
    "interleaved_vmem_bytes", "interleaved_fits", "pallas_decode_batch",
]

LANES = 128
_I32 = jnp.int32
_U32 = jnp.uint32


def _rows(n: int) -> int:
    return max((n + LANES - 1) // LANES, 1)


class MachineResourceLimit(RuntimeError):
    """The geometry's queue/table state exceeds the VMEM the bit machine
    may request — callers fall back to the XLA formulations."""


# see pallas_encoder._VMEM_BUDGET_BYTES — same cliff, same rationale
_VMEM_BUDGET_BYTES = 128 << 20


def machine_vmem_bytes(
    c: int, h: int, w: int, ll_h: int, ll_w: int, cap_words: int,
    geo_hbm: bool = False,
) -> int:
    """VMEM bytes the decode machine that will actually run requests:
    duplicate-parent geometries use the sequential machine (rec-array
    in VMEM, full queue capacities); everything else uses the hybrid
    machine, whose queues are budget-narrowed by cap_words (see
    ``_narrowed_caps``) — which is what admits 2048^2-class geometries
    at bounded bit budgets.  ``geo_hbm`` (hybrid only) keeps the
    N-sized geometry table HBM-resident with a per-fire single-row DMA
    (the round-5 encoder t1_hbm pattern) — 4096^2-class admission.
    Closed-form — no geometry tables are materialized
    (tree_bounds.queue_bounds), so routing answers in microseconds at
    any size."""
    qb = queue_bounds(c, h, w, ll_h, ll_w)
    N = c * h * w
    li_rows = _rows(max(qb.n_lip0, 1))
    ls_rows = _rows(max(qb.n_lis0, 1))
    if qb.has_duplicate_parents:
        lip_rows = _rows(qb.ent_bound + 1)
        lis_rows = _rows(2 * qb.lis_bound + 1)
        lsp_rows = _rows(qb.ent_bound + 1)
        return 4 * LANES * (
            _rows(N) + lip_rows + lis_rows + 2 * lsp_rows + _rows(N)
            + _rows(cap_words) + li_rows + ls_rows + 256
        )
    lip_cap, lis_cap, lsp_cap = narrowed_caps(qb, cap_words)
    geo_rows = 1 if geo_hbm else _rows(N)
    return 4 * LANES * (
        _rows(lip_cap) + _rows(lis_cap) + 2 * _rows(lsp_cap) + geo_rows
        + _rows(cap_words) + li_rows + ls_rows + 256
    )


def machine_fits(
    c: int, h: int, w: int, ll_h: int, ll_w: int, cap_words: int,
    geo_hbm: bool = False,
) -> bool:
    """Whether the decode bit machine's state fits the VMEM budget.

    Per-machine packed-entry bounds: duplicate-parent geometries run
    the sequential machine (2^24 entries); duplicate-free ones run the
    hybrid machine, whose internal lspn packing (node | sgn << 26)
    is exact to 2^26 cells (round 5 — the geo word packs child0 << 2,
    good to 2^29)."""
    N = c * h * w
    if queue_bounds(c, h, w, ll_h, ll_w).has_duplicate_parents:
        if geo_hbm or N >= 1 << 24:
            return False
    elif N >= 1 << 26:
        return False
    return (
        machine_vmem_bytes(c, h, w, ll_h, ll_w, cap_words, geo_hbm)
        <= _VMEM_BUDGET_BYTES
    )


def _pad2d(a: np.ndarray, rows: int, dtype) -> np.ndarray:
    out = np.zeros(rows * LANES, dtype)
    out[: a.size] = a
    return out.reshape(rows, LANES)


@lru_cache(maxsize=None)
def _has_duplicate_parents(h: int, w: int, ll_h: int, ll_w: int) -> bool:
    """Odd LL dims make the parity offspring map overlap: a cell can
    have several parents, several LSP instances, and shared-rec
    refinement semantics (device_decoder docstring). The deferred-rec
    hybrid machine requires unique commits, so those geometries stay
    on the sequential machine.  Closed-form (tree_bounds; property-
    tested against the table-built coverage counts)."""
    return queue_bounds(1, h, w, ll_h, ll_w).has_duplicate_parents


def pallas_decode_fn(
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    interpret: bool = False,
    machine: str | None = None,
    out_dtype: str = "int32",
):
    """fn(words_u32[cap_words], nbits, max_n) -> rec (c, h, w).

    machine: 'hybrid' (stream-run-skipping parse + vector refinement +
    deferred rec materialization; requires a duplicate-free parent map,
    else falls back), 'hybrid_hbm' (the hybrid with the geometry table
    HBM-resident — 4096^2-class admission, round 5), or 'seq' (one
    queue entry per iteration).  SPIHT_TPU_PALLAS_DEC_MACHINE
    overrides the default.

    out_dtype: 'int32' (default) or 'int16'. Decoded coefficients are
    bounded by 2^(max_n+1), so for max_n <= 13 an int16 rec array is
    value-identical and HALVES the device->host transfer — the same
    budget-narrowed-transfer pattern the encode path uses for int8
    coefficient shipping (BASELINE.md). Callers must check max_n.
    """
    if machine is None:
        machine = os.environ.get("SPIHT_TPU_PALLAS_DEC_MACHINE", "hybrid")
    if machine in ("hybrid", "hybrid_hbm") and not _has_duplicate_parents(
        h, w, ll_h, ll_w
    ):
        return _hybrid_fn(c, h, w, ll_h, ll_w, cap_words, interpret,
                          out_dtype, geo_hbm=(machine == "hybrid_hbm"))
    return _seq_fn(c, h, w, ll_h, ll_w, cap_words, interpret, out_dtype)


@lru_cache(maxsize=None)
def _seq_fn(
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    interpret: bool = False,
    out_dtype: str = "int32",
):
    """fn(words_u32[cap_words], nbits, max_n) -> rec i32 (c, h, w)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if c * h * w >= 1 << 24:
        raise ValueError("geometry too large for packed queue entries")
    g = _dec_geom(c, h, w, ll_h, ll_w)
    N = c * h * w
    LIP_CAP = g["ent_bound"] + 1
    LIS_CAP = 2 * g["lis_bound"] + 1
    LSP_CAP = g["ent_bound"] + 1
    REC_ROWS = _rows(N)
    LIP_ROWS = _rows(LIP_CAP)
    LIS_ROWS = _rows(LIS_CAP)
    LSP_ROWS = _rows(LSP_CAP)
    W_ROWS = _rows(cap_words)

    # packed per-node geometry: child0 (bits 0-23) | has_child<<24 | hg<<25
    geo_np = (
        np.asarray(g["child0"], np.int64)
        | (np.asarray(g["has_child"], np.int64) << 24)
        | (np.asarray(g["hg"], np.int64) << 25)
    ).astype(np.int32)
    GEO_ROWS = _rows(N)
    geo2d = jnp.asarray(_pad2d(geo_np, GEO_ROWS, np.int32))

    lip0 = g["lip_init"]
    lis0 = (g["lis_init"].astype(np.int64) << 1 | 1).astype(np.int32)
    n_lip0 = int(lip0.size)
    n_lis0 = int(lis0.size)
    LI_ROWS = _rows(max(n_lip0, 1))
    LS_ROWS = _rows(max(n_lis0, 1))
    lipi2d = jnp.asarray(_pad2d(lip0, LI_ROWS, np.int32))
    lisi2d = jnp.asarray(_pad2d(lis0, LS_ROWS, np.int32))

    vmem_bytes = 4 * LANES * (
        REC_ROWS + LIP_ROWS + LIS_ROWS + LSP_ROWS + GEO_ROWS + W_ROWS
        + LI_ROWS + LS_ROWS + 64
    )

    def kernel(words_ref, geo_ref, lipi_ref, lisi_ref, sc_ref,
               rec_ref, lip_ref, lis_ref, lsp_ref):
        nbits = sc_ref[0]
        max_n = sc_ref[1]
        lanes = jax.lax.broadcasted_iota(_I32, (1, LANES), 1)

        rec_ref[:] = jnp.zeros((REC_ROWS, LANES), _I32)
        lip_ref[0:LI_ROWS, :] = lipi_ref[:]
        lis_ref[0:LS_ROWS, :] = lisi_ref[:]

        def rd(ref, idx, cap):
            i = jnp.clip(idx, 0, cap - 1)
            row = ref[pl.ds(i // LANES, 1), :]
            return jnp.sum(
                jnp.where(lanes == i % LANES, row, 0), dtype=_I32
            )

        def rmw(ref, idx, val, want, cap):
            i = jnp.clip(idx, 0, cap - 1)
            r = i // LANES
            row = ref[pl.ds(r, 1), :]
            ref[pl.ds(r, 1), :] = jnp.where(
                (lanes == i % LANES) & want, val, row
            )

        def funnel(cur):
            """int32 window holding stream bits cur..cur+31.

            All-int32: Mosaic has neither unsigned reductions nor scalar
            bitcasts, so the logical right shift is the lax primitive.
            """
            wi = jnp.clip(cur >> 5, 0, cap_words - 1)
            r0 = wi // LANES
            row0 = words_ref[pl.ds(r0, 1), :]
            w0 = jnp.sum(
                jnp.where(lanes == wi % LANES, row0, 0), dtype=_I32
            )
            wi1 = jnp.clip(wi + 1, 0, cap_words - 1)
            r1 = wi1 // LANES
            row1 = words_ref[pl.ds(r1, 1), :]
            w1 = jnp.sum(
                jnp.where(lanes == wi1 % LANES, row1, 0), dtype=_I32
            )
            s = cur & 31
            hi = jnp.where(
                s == 0, jnp.zeros((), _I32), w1 << (32 - s)
            )
            return jax.lax.shift_right_logical(w0, s) | hi

        def wbit(win, k):
            """bit k of the window (k: traced scalar in [0, 31])."""
            return (
                jax.lax.shift_right_logical(win, jnp.asarray(k, _I32)) & 1
            ) == 1

        def base_val_of(n):
            return jnp.where(
                n == 0,
                jnp.ones((), _I32),
                ((1 << jnp.maximum(n - 1, 0)) + (1 << n)).astype(_I32),
            )

        # carry: (cur, n, lip_cnt, lip_i, lip_w, lip_add,
        #         lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
        #         dead, done) — all int32 scalars (flags 0/1)
        def lip_phase(s):
            def cond(s):
                (cur, n, lip_cnt, lip_i, lip_w, lip_add,
                 lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                 dead, done) = s
                return (lip_i < lip_cnt) & (dead == 0)

            def body(s):
                (cur, n, lip_cnt, lip_i, lip_w, lip_add,
                 lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                 dead, done) = s
                ent = rd(lip_ref, lip_i, LIP_CAP)
                win = funnel(cur)
                ok0 = cur < nbits
                b0 = wbit(win, 0) & ok0
                dead0 = ~ok0
                fired = b0
                ok1 = fired & ((cur + 1) < nbits) & ~dead0
                b1 = wbit(win, 1) & ok1
                dead1 = fired & ~ok1 & ~dead0
                commit = fired & ok1
                bv = base_val_of(n)
                rmw(rec_ref, ent, jnp.where(b1, bv, -bv), commit, N)
                rmw(lsp_ref, lsp_cnt, ent, commit, LSP_CAP)
                lsp_cnt = lsp_cnt + commit.astype(_I32)
                retain = ok0 & ~b0
                rmw(lip_ref, lip_w, ent, retain, LIP_CAP)
                lip_w = lip_w + retain.astype(_I32)
                cur = cur + 1 + fired.astype(_I32)
                dead = dead | (dead0 | dead1).astype(_I32)
                lip_i = lip_i + 1
                return (cur, n, lip_cnt, lip_i, lip_w, lip_add,
                        lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                        dead, done)

            return jax.lax.while_loop(cond, body, s)

        def lis_phase(s):
            def cond(s):
                (cur, n, lip_cnt, lip_i, lip_w, lip_add,
                 lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                 dead, done) = s
                return (lis_i < lis_t) & (dead == 0)

            def body(s):
                (cur, n, lip_cnt, lip_i, lip_w, lip_add,
                 lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                 dead, done) = s
                e = rd(lis_ref, lis_i, LIS_CAP)
                node = jnp.clip(e >> 1, 0, N - 1)
                is_a = (e & 1) == 1
                gw = rd(geo_ref, node, N)
                hc = ((gw >> 24) & 1) == 1
                hgf = ((gw >> 25) & 1) == 1
                c0 = gw & 0xFFFFFF
                win = funnel(cur)
                ok0 = cur < nbits
                b0 = wbit(win, 0) & ok0
                dead0 = ~ok0
                a_fired = is_a & b0 & ~dead0
                run_children = a_fired & hc
                bv = base_val_of(n)
                koff = jnp.ones((), _I32)  # bits consumed past cur
                dead_c = dead0
                child_off = (0, 1, w, w + 1)
                for k in range(4):
                    ch = jnp.clip(c0 + child_off[k], 0, N - 1)
                    uset = run_children & ~dead_c
                    okt = uset & ((cur + koff) < nbits)
                    bt = wbit(win, koff) & okt
                    dt = uset & ~okt
                    koff = koff + okt.astype(_I32)
                    oks = bt & ((cur + koff) < nbits) & ~dt
                    bs = wbit(win, koff) & oks
                    ds = bt & ~oks & ~dt
                    koff = koff + oks.astype(_I32)
                    commit = bt & oks
                    rmw(rec_ref, ch, jnp.where(bs, bv, -bv), commit, N)
                    rmw(lsp_ref, lsp_cnt, ch, commit, LSP_CAP)
                    lsp_cnt = lsp_cnt + commit.astype(_I32)
                    insig = okt & ~bt
                    rmw(lip_ref, lip_w + lip_add, ch, insig, LIP_CAP)
                    lip_add = lip_add + insig.astype(_I32)
                    dead_c = dead_c | dt | ds
                # A fire with grandchildren -> B re-entry at live tail
                reapp = a_fired & hgf & ~dead_c
                rmw(lis_ref, lis_t, node << 1, reapp, LIS_CAP)
                lis_t = lis_t + reapp.astype(_I32)
                # B fire -> 4 A-children at live tail
                b_fired = (~is_a) & b0 & ok0 & hc
                for k in range(4):
                    ch = jnp.clip(c0 + child_off[k], 0, N - 1)
                    rmw(lis_ref, lis_t, (ch << 1) | 1, b_fired, LIS_CAP)
                    lis_t = lis_t + b_fired.astype(_I32)
                retain = ok0 & ~b0
                rmw(lis_ref, lis_w, e, retain, LIS_CAP)
                lis_w = lis_w + retain.astype(_I32)
                cur = cur + koff
                dead = dead | dead_c.astype(_I32)
                lis_i = lis_i + 1
                return (cur, n, lip_cnt, lip_i, lip_w, lip_add,
                        lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                        dead, done)

            return jax.lax.while_loop(cond, body, s)

        def ref_phase(s):
            def cond(s):
                (cur, n, lip_cnt, lip_i, lip_w, lip_add,
                 lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                 dead, done) = s
                return (ref_i < lsp_snap) & (dead == 0)

            def body(s):
                (cur, n, lip_cnt, lip_i, lip_w, lip_add,
                 lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                 dead, done) = s
                node = jnp.clip(rd(lsp_ref, ref_i, LSP_CAP), 0, N - 1)
                win = funnel(cur)
                ok0 = cur < nbits
                b0 = wbit(win, 0) & ok0
                r = node // LANES
                row = rec_ref[pl.ds(r, 1), :]
                x_old = jnp.sum(
                    jnp.where(lanes == node % LANES, row, 0), dtype=_I32
                )
                mag = jnp.abs(x_old)
                mag = jnp.where(b0, mag | (1 << n), mag & ~(1 << n))
                v = jnp.where(x_old >= 0, mag, -mag).astype(_I32)
                rec_ref[pl.ds(r, 1), :] = jnp.where(
                    (lanes == node % LANES) & ok0, v, row
                )
                cur = cur + 1
                ref_i = ref_i + 1
                dead = dead | (~ok0).astype(_I32)
                return (cur, n, lip_cnt, lip_i, lip_w, lip_add,
                        lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                        dead, done)

            return jax.lax.while_loop(cond, body, s)

        def outer_cond(s):
            return (s[12] == 0) & (s[13] == 0)  # ~dead & ~done

        def outer_body(s):
            s = lip_phase(s)
            s = lis_phase(s)
            s = ref_phase(s)
            (cur, n, lip_cnt, lip_i, lip_w, lip_add,
             lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
             dead, done) = s
            done = done | (n == 0).astype(_I32)
            return (
                cur,
                jnp.maximum(n - 1, 0),
                lip_w + lip_add,       # next plane's LIP count
                jnp.zeros((), _I32),   # lip_i
                jnp.zeros((), _I32),   # lip_w
                jnp.zeros((), _I32),   # lip_add
                jnp.zeros((), _I32),   # lis_i
                jnp.zeros((), _I32),   # lis_w
                lis_w,                 # lis_t: compacted live tail
                lsp_cnt,
                lsp_cnt,               # lsp_snap for next refinement
                jnp.zeros((), _I32),   # ref_i
                dead,
                done,
            )

        z = jnp.zeros((), _I32)
        init = (
            z, max_n,
            jnp.asarray(n_lip0, _I32), z, z, z,
            z, z, jnp.asarray(n_lis0, _I32),
            z, z, z,
            z, z,
        )
        jax.lax.while_loop(outer_cond, outer_body, init)

    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(vmem_bytes + (8 << 20), 24 << 20), 100 << 20
            )
        )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((REC_ROWS, LANES), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # words
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lip init
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lis init
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((LIP_ROWS, LANES), jnp.int32),
            pltpu.VMEM((LIS_ROWS, LANES), jnp.int32),
            pltpu.VMEM((LSP_ROWS, LANES), jnp.int32),
        ],
        interpret=interpret,
        **params,
    )

    @jax.jit
    def fn(words, nbits, max_n):
        # int32 word buffer: Mosaic lacks unsigned reductions, so the
        # kernel extracts words in int32 and bitcasts to u32 in-scalar
        words_i = jax.lax.bitcast_convert_type(
            jnp.asarray(words, jnp.uint32), jnp.int32
        )
        words2d = jnp.zeros(W_ROWS * LANES, jnp.int32).at[
            :cap_words
        ].set(words_i).reshape(W_ROWS, LANES)
        sc = jnp.stack(
            [jnp.asarray(nbits, _I32), jnp.asarray(max_n, _I32)]
        )
        rec = call(words2d, geo2d, lipi2d, lisi2d, sc)
        rec = rec.reshape(-1)[:N].reshape(c, h, w)
        if out_dtype == "int16":
            rec = rec.astype(jnp.int16)
        return rec

    return fn


@lru_cache(maxsize=None)
def _hybrid_fn(
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    interpret: bool = False,
    out_dtype: str = "int32",
    with_log: bool = False,
    geo_hbm: bool = False,
):
    """Hybrid vector/sequential decode machine (production for
    duplicate-free geometries).

    The sequential machine pays the dependent-chain latency once per
    queue entry. Decode-side the stream itself provides the vector
    structure:

      * insignificance is a ZERO RUN: a 32-bit funnel window is spread
        across lanes and the first 1-bit bounds how many LIP/LIS
        entries consume single 0 bits — those are skipped in bulk, and
        only significance hits run scalar bodies.
      * the refinement pass consumes exactly one CONTIGUOUS stream bit
        per LSP entry, so whole 128-entry rows update at once from a
        5-word window.
      * rec is never written inside the kernel: LSP is two parallel
        queues (node|sign, evolving magnitude) — a commit appends the
        1.5*2^n base magnitude, refinement edits bit n lane-locally —
        and the final rec is ONE XLA scatter outside the kernel. Valid
        only when every node commits at most once (duplicate-parent
        geometries use _seq_fn, see _has_duplicate_parents).
      * queue retention is one order-preserving permute matmul per row
        (16-bit halves at Precision.HIGHEST: the TPU f32 matmul default
        rounds through bf16), optimistic past a budget cut — a dead
        machine never reads its queues again.

    Bit-for-bit semantics: /root/reference/src/encoder_decoder.rs:307-454
    including byte-prefix truncation.

    with_log=True additionally emits the COMPACT EVENT LOG: one packed
    i32 per attempted bit at its stream offset —
    ``node | action << 24 | (n+1) << 27`` (action ids as
    device_decoder._A_*; the +1 marks written rows) — from which
    codec/meta_expand.py reconstructs the reference 8-column metadata
    trace (/root/reference/src/encoder_decoder.rs:616-630) outside the
    kernel. The log rows for bulk-parsed windows are vector writes
    placed with a dynamic lane roll, so the fast machine keeps its
    run-skipping structure.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # internal packings (round 5): geo = (child0 << 2) | hc << 1 | hg
    # (exact to 2^29 cells), lspn = node | sgn << 26 (exact to 2^26).
    # The PUBLIC event-log word keeps its 24-bit node contract, so
    # with_log stays bounded at 2^24.
    if c * h * w >= (1 << 24 if with_log else 1 << 26):
        raise ValueError("geometry too large for packed queue entries")
    g = _dec_geom(c, h, w, ll_h, ll_w)
    N = c * h * w
    # budget-narrowed capacities (provably safe for any stream of
    # <= cap_words*32 bits, see _narrowed_caps) — the hybrid machine
    # admits 2048^2-class geometries at bounded bit budgets this way
    LIP_CAP, LIS_CAP, LSP_CAP = _narrowed_caps(g, cap_words)
    LIP_ROWS = _rows(LIP_CAP)
    LIS_ROWS = _rows(LIS_CAP)
    LSP_ROWS = _rows(LSP_CAP)
    W_ROWS = _rows(cap_words)
    LOG_ROWS = _rows(cap_words * 32 + 1) if with_log else 0

    geo_np = (
        (np.asarray(g["child0"], np.int64) << 2)
        | (np.asarray(g["has_child"], np.int64) << 1)
        | np.asarray(g["hg"], np.int64)
    ).astype(np.int32)
    GEO_ROWS = _rows(N)
    geo2d = jnp.asarray(_pad2d(geo_np, GEO_ROWS, np.int32))

    lip0 = g["lip_init"]
    lis0 = (g["lis_init"].astype(np.int64) << 1 | 1).astype(np.int32)
    n_lip0 = int(lip0.size)
    n_lis0 = int(lis0.size)
    LI_ROWS = _rows(max(n_lip0, 1))
    LS_ROWS = _rows(max(n_lis0, 1))
    lipi2d = jnp.asarray(_pad2d(lip0, LI_ROWS, np.int32))
    lisi2d = jnp.asarray(_pad2d(lis0, LS_ROWS, np.int32))

    vmem_bytes = 4 * LANES * (
        LIP_ROWS + LIS_ROWS + 2 * LSP_ROWS
        + (1 if geo_hbm else GEO_ROWS) + W_ROWS
        + LOG_ROWS + LI_ROWS + LS_ROWS + 256
    )

    _c31 = np.int32(31)
    _c16 = np.int32(16)

    # carry layout (i32 scalars):
    # 0 cur, 1 n, 2 lip_cnt, 3 lip_w, 4 lip_add, 5 lis_w, 6 lis_t,
    # 7 lsp_cnt, 8 lsp_snap, 9 cursor, 10 dead, 11 done
    def kernel(words_ref, geo_ref, lipi_ref, lisi_ref, sc_ref,
               lspn_ref, lspm_ref, stat_ref, *rest):
        gsc_ref = gsem_ref = None
        if with_log:
            log_ref, lip_ref, lis_ref = rest[:3]
        else:
            lip_ref, lis_ref = rest[:2]
            log_ref = None
        if geo_hbm:
            gsc_ref, gsem_ref = rest[-2:]
        nbits = sc_ref[0]
        max_n = sc_ref[1]
        lanes = jax.lax.broadcasted_iota(_I32, (1, LANES), 1)
        sq0 = jax.lax.broadcasted_iota(_I32, (LANES, LANES), 0)
        sq1 = jax.lax.broadcasted_iota(_I32, (LANES, LANES), 1)
        eye = (sq0 == sq1).astype(jnp.float32)
        tri = (sq0 < sq1).astype(jnp.float32)
        colf = sq1.astype(jnp.float32)
        onesrow = jnp.ones((1, LANES), jnp.float32)

        lspn_ref[:] = jnp.zeros((LSP_ROWS, LANES), _I32)
        lspm_ref[:] = jnp.zeros((LSP_ROWS, LANES), _I32)
        lip_ref[0:LI_ROWS, :] = lipi_ref[:]
        lis_ref[0:LS_ROWS, :] = lisi_ref[:]
        if with_log:
            log_ref[:] = jnp.zeros((LOG_ROWS, LANES), _I32)

        def place_log(vals, mask, cur):
            """Write vals[q] (event at stream offset cur+q, q < 128) to
            the log buffer: one dynamic lane roll + a 2-row masked
            write."""
            if not with_log:
                return
            s = cur % LANES
            r0 = cur // LANES
            mi = mask.astype(_I32)
            v = pltpu.roll(jnp.where(mask, vals, 0), s, 1)
            m = pltpu.roll(mi, s, 1)
            ra = jnp.clip(r0, 0, LOG_ROWS - 1)
            row = log_ref[pl.ds(ra, 1), :]
            log_ref[pl.ds(ra, 1), :] = jnp.where(
                (m != 0) & (lanes >= s), v, row
            )
            rb = jnp.clip(r0 + 1, 0, LOG_ROWS - 1)
            row1 = log_ref[pl.ds(rb, 1), :]
            log_ref[pl.ds(rb, 1), :] = jnp.where(
                (m != 0) & (lanes < s), v, row1
            )

        def rd(ref, idx, cap):
            i = jnp.clip(idx, 0, cap - 1)
            row = ref[pl.ds(i // LANES, 1), :]
            return jnp.sum(
                jnp.where(lanes == i % LANES, row, 0), dtype=_I32
            )

        def rmw(ref, idx, val, want, cap):
            i = jnp.clip(idx, 0, cap - 1)
            r = i // LANES
            row = ref[pl.ds(r, 1), :]
            ref[pl.ds(r, 1), :] = jnp.where(
                (lanes == i % LANES) & want, val, row
            )

        def ext(row, lane_idx):
            return jnp.sum(
                jnp.where(lanes == lane_idx, row, 0), dtype=_I32
            )

        def appendk(targets, base, slots, cap):
            """Batch <=4 consecutive queue appends into ONE 2-row
            masked write per target array (vs one RMW per append).

            targets: [(ref, vals)] sharing positions; slots: list of
            (offset_scalar, want_bool, value-index) per append where
            offset is the scalar slot offset from base.
            """
            i0 = jnp.clip(base, 0, cap - 1)
            r0 = i0 // LANES
            accs = [
                [jnp.zeros((1, LANES), _I32) for _ in targets]
                for _ in range(2)
            ]
            mask = [jnp.zeros((1, LANES), jnp.bool_) for _ in range(2)]
            for off, want, vi in slots:
                lane0 = base + off - r0 * LANES
                for r in range(2):
                    m = (lanes == lane0 - r * LANES) & want
                    mask[r] = mask[r] | m
                    for t, (_ref, vals) in enumerate(targets):
                        accs[r][t] = accs[r][t] | jnp.where(
                            m, vals[vi], 0
                        )
            nrows = (cap + LANES - 1) // LANES
            for r in range(2):
                ri = jnp.clip(r0 + r, 0, nrows - 1)
                for t, (ref, _vals) in enumerate(targets):
                    old = ref[pl.ds(ri, 1), :]
                    ref[pl.ds(ri, 1), :] = jnp.where(
                        mask[r], accs[r][t], old
                    )

        def prefix(v_i32):
            return jnp.dot(
                v_i32.astype(jnp.float32), tri,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(_I32)

        def isum(v):
            return jnp.sum(v.astype(_I32), dtype=_I32)

        def scatter_rows(w_off, vals_list, keep):
            dest = (w_off % LANES) + prefix(keep.astype(_I32))
            dm = jnp.where(keep, dest, -1).astype(jnp.float32)
            d_t = jax.lax.dot_general(
                jnp.broadcast_to(dm, (LANES, LANES)), eye,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            r0 = w_off // LANES
            for r in range(2):
                p = (d_t - (r * LANES) == colf).astype(jnp.float32)
                msk = jnp.dot(
                    onesrow, p, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(_I32)
                for ref, rows_cap, vals in vals_list:
                    lo = (vals & 0xFFFF).astype(jnp.float32)
                    hi = jax.lax.shift_right_logical(
                        vals, _c16
                    ).astype(jnp.float32)
                    plo = jnp.dot(
                        lo, p, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    phi = jnp.dot(
                        hi, p, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    neww = plo.astype(_I32) | (phi.astype(_I32) << 16)
                    ri = jnp.clip(r0 + r, 0, rows_cap - 1)
                    old = ref[pl.ds(ri, 1), :]
                    ref[pl.ds(ri, 1), :] = jnp.where(
                        msk != 0, neww, old
                    )

        def bits128(cur):
            """(1,128) vector of stream bits cur..cur+127."""
            wi = cur >> 5
            s = cur & 31
            ws = [rd(words_ref, wi + k, cap_words) for k in range(5)]
            sj = s + lanes
            k = sj >> 5
            sh = sj & 31
            val = jnp.where(
                k == 0, ws[0],
                jnp.where(
                    k == 1, ws[1],
                    jnp.where(k == 2, ws[2],
                              jnp.where(k == 3, ws[3], ws[4])),
                ),
            )
            return jax.lax.shift_right_logical(val, sh) & 1

        def base_val_of(n):
            return jnp.where(
                n == 0,
                jnp.ones((), _I32),
                ((1 << jnp.maximum(n - 1, 0)) + (1 << n)).astype(_I32),
            )

        def shift_lanes(v, d, fill):
            """lane q <- lane q-d (lanes < d get fill)."""
            return jnp.where(lanes < d, fill, jnp.roll(v, d, axis=1))

        def token_heads(b):
            """Parallel tokenization of the LIP grammar {0, 1s}: a
            log-depth scan composes the 2-state transfer functions
            (H=awaiting token, T=inside a sig token's sign slot) so
            head(q) = the window position q starts a token, given the
            window itself starts one."""
            fh = b  # f_q(H): 0->H stays head-chain, 1->T
            ft = jnp.zeros((1, LANES), _I32)  # f_q(T) = H
            d = 1
            while d < LANES:
                gh = shift_lanes(fh, d, 0)  # identity fill: img(H)=H
                gt = shift_lanes(ft, d, 1)  # img(T)=T
                nh = jnp.where(gh == 0, fh, ft)
                nt = jnp.where(gt == 0, fh, ft)
                fh, ft = nh, nt
                d *= 2
            sb = shift_lanes(fh, 1, 0)  # state BEFORE q, from H
            return sb == 0

        def lip_phase(s):
            def cond(s):
                return (s[9] * LANES < s[2]) & (s[10] == 0)

            def body(s):
                (cur, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                 lsp_cnt, lsp_snap, r, dead, done) = s
                row = lip_ref[pl.ds(r, 1), :]
                vend = jnp.minimum(lip_cnt - r * LANES, LANES)
                bv = base_val_of(n)

                # inner: (cur, cpos, lsp_cnt, dead, cmask) — one full
                # 128-bit window of LIP tokens per iteration
                def icond(t):
                    return (t[1] < vend) & (t[3] == 0)

                def ibody(t):
                    cur, cpos, lsp_cnt, dead, cmask = t
                    b = bits128(cur)
                    hd = token_heads(b)
                    remaining = vend - cpos
                    rk = prefix(hd.astype(_I32))  # heads before q
                    within = rk < remaining
                    fits = (lanes + 1 + b) <= LANES
                    badq = jnp.min(
                        jnp.where(hd & ~(within & fits), lanes, LANES)
                    )
                    parsed = hd & (lanes < badq)
                    pos_q = cur + lanes
                    ok0 = parsed & (pos_q < nbits)
                    fired = ok0 & (b == 1)
                    ok1 = fired & ((pos_q + 1) < nbits)
                    sgn_h = jnp.roll(b, -1, axis=1)  # bit at q+1
                    commit_h = fired & ok1
                    dead = dead | (
                        isum(parsed & ~ok0) + isum(fired & ~ok1) > 0
                    ).astype(_I32)
                    # map head-position values onto consecutive ENTRY
                    # lanes cpos+rank via one one-hot permute
                    dest = jnp.where(parsed, cpos + rk, -1).astype(
                        jnp.float32
                    )
                    d_t = jax.lax.dot_general(
                        jnp.broadcast_to(dest, (LANES, LANES)), eye,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    p = (d_t == colf).astype(jnp.float32)

                    def perm(v):
                        return jnp.dot(
                            v.astype(jnp.float32), p,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        ).astype(_I32)

                    fired_e = perm(fired.astype(_I32))
                    commit_e = perm(commit_h.astype(_I32))
                    sgn_e = perm(
                        jnp.where(commit_h, sgn_h, 0)
                    )
                    cmask = cmask | fired_e
                    if with_log:
                        # event rows: action 0 at each parsed head,
                        # action 1 at its sign slot (head lane + 1);
                        # node ids ride the INVERSE permute (entry ->
                        # head lanes), 16-bit halves for exactness
                        def iperm(v):
                            return jax.lax.dot_general(
                                v.astype(jnp.float32), p,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            ).astype(_I32)

                        nodes_h = iperm(row & 0xFFFF) | (
                            iperm(jax.lax.shift_right_logical(
                                row, _c16)) << 16
                        )
                        nf = (n + 1) << 27
                        pos_ok = pos_q <= nbits
                        m0 = parsed & pos_ok
                        m1 = (jnp.roll(fired.astype(_I32), 1, axis=1)
                              != 0) & pos_ok
                        a1 = jnp.roll(nodes_h, 1, axis=1) | (
                            1 << 24) | nf
                        place_log(
                            jnp.where(m0, nodes_h | nf, 0)
                            | jnp.where(m1, a1, 0),
                            m0 | m1, cur,
                        )
                    # LSP appends, in entry order (sign at bit 26:
                    # node field exact to 2^26 cells)
                    scatter_rows(
                        lsp_cnt,
                        [
                            (lspn_ref, LSP_ROWS, row | (sgn_e << 26)),
                            (lspm_ref, LSP_ROWS,
                             bv + jnp.zeros((1, LANES), _I32)),
                        ],
                        commit_e == 1,
                    )
                    lsp_cnt = lsp_cnt + isum(commit_h)
                    cur = cur + isum(parsed) + isum(parsed & (b == 1))
                    cpos = cpos + isum(parsed)
                    return (cur, cpos, lsp_cnt, dead, cmask)

                z = jnp.zeros((), _I32)
                t = jax.lax.while_loop(
                    icond, ibody,
                    (cur, z, lsp_cnt,
                     dead, jnp.zeros((1, LANES), _I32)),
                )
                cur, _, lsp_cnt, dead, cmask = t
                retain = (lanes < vend) & (cmask == 0)
                scatter_rows(
                    lip_w, [(lip_ref, LIP_ROWS, row)], retain
                )
                return (cur, n, lip_cnt, lip_w + isum(retain),
                        lip_add, lis_w, lis_t, lsp_cnt, lsp_snap,
                        r + 1, dead, done)

            return jax.lax.while_loop(cond, body, s)

        child_off = (0, 1, w, w + 1)

        def lis_phase(s):
            def cond(s):
                return (s[9] < s[6]) & (s[10] == 0)

            def body(s):
                (cur, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                 lsp_cnt, lsp_snap, lis_i, dead, done) = s
                r = lis_i // LANES
                erow = lis_ref[pl.ds(r, 1), :]
                start = lis_i % LANES
                vend = jnp.minimum(lis_t - r * LANES, LANES)
                bv = base_val_of(n)

                # inner: (cur, cpos, lip_add, lis_t, lsp_cnt, dead,
                #         fmask)
                def icond(t):
                    return (t[1] < vend) & (t[5] == 0)

                def ibody(t):
                    """Parse up to TWO fired entries per iteration from
                    ONE 64-bit funnel window (3 word reads): each fire
                    needs <= 9 cascade bits at window offset <= 54, so
                    zero-run + fire + zero-run + fire all fit; both
                    fires' queue appends merge into ONE 2-row masked
                    write per queue array. A phase is gated on no prior
                    death, so the straight-line pair is bit-equivalent
                    to two sequential iterations of the 1-fire body."""
                    (cur, cpos, lip_add, lis_t, lsp_cnt, dead,
                     fmask) = t
                    wi = jnp.clip(cur >> 5, 0, cap_words - 1)
                    w0 = rd(words_ref, wi, cap_words)
                    w1 = rd(words_ref, wi + 1, cap_words)
                    w2 = rd(words_ref, wi + 2, cap_words)
                    s = cur & 31
                    lo = jax.lax.shift_right_logical(w0, s) | jnp.where(
                        s == 0, jnp.zeros((), _I32), w1 << (32 - s)
                    )
                    hi = jax.lax.shift_right_logical(w1, s) | jnp.where(
                        s == 0, jnp.zeros((), _I32), w2 << (32 - s)
                    )

                    def wbit64(idx):
                        losh = jax.lax.shift_right_logical(
                            lo, jnp.clip(idx, 0, 31)
                        )
                        hish = jax.lax.shift_right_logical(
                            hi, jnp.clip(idx - 32, 0, 31)
                        )
                        return (
                            jnp.where(idx < 32, losh, hish) & 1
                        ) == 1

                    lov = lo + jnp.zeros((1, LANES), _I32)
                    hiv = hi + jnp.zeros((1, LANES), _I32)

                    def scan_vec(roff):
                        idxv = roff + lanes
                        v = jnp.where(
                            idxv < 32,
                            jax.lax.shift_right_logical(
                                lov, jnp.clip(idxv, 0, 31)
                            ),
                            jax.lax.shift_right_logical(
                                hiv, jnp.clip(idxv - 32, 0, 31)
                            ),
                        )
                        return v & 1

                    # merged append accumulators across both fires
                    lsp_sl, lip_sl, lis_sl = [], [], []
                    csum = jnp.zeros((), _I32)
                    isumk = jnp.zeros((), _I32)
                    lsum = jnp.zeros((), _I32)
                    roff = jnp.zeros((), _I32)
                    adv_ok = dead == 0
                    dead_n = jnp.zeros((), jnp.bool_)
                    if with_log:
                        wlogv = jnp.zeros((1, LANES), _I32)
                        wlogm = jnp.zeros((1, LANES), _I32)
                    for _phase in range(2):
                        remaining = vend - cpos
                        wlim = jnp.clip(
                            jnp.minimum(remaining, 54 - roff), 0, 127
                        )
                        blim = jnp.clip(nbits - cur - roff, 0, wlim)
                        bvecp = scan_vec(roff)
                        one_at = jnp.min(
                            jnp.where(
                                (bvecp == 1) & (lanes < blim),
                                lanes, LANES,
                            )
                        )
                        hit = (one_at < blim) & adv_ok
                        run = jnp.where(
                            adv_ok,
                            jnp.where(one_at < blim, one_at, blim),
                            0,
                        )
                        dead_s = adv_ok & (one_at >= blim) & (
                            blim < wlim
                        )
                        if with_log:
                            # run entries each consume one 0 bit
                            # (action 2/5 by type); the fired or
                            # budget-cut entry at lane cpos+run gets
                            # its row too
                            extra = (hit | dead_s).astype(_I32)
                            sel = (lanes >= cpos) & (
                                lanes < cpos + run + extra
                            )
                            actv = jnp.where(
                                (erow & 1) == 1, 2, 5
                            ) << 24
                            pv = (erow >> 1) | actv | ((n + 1) << 27)
                            sh = (roff - cpos) % LANES
                            wlogv = wlogv | pltpu.roll(
                                jnp.where(sel, pv, 0), sh, 1
                            )
                            wlogm = wlogm | pltpu.roll(
                                sel.astype(_I32), sh, 1
                            )
                        roff = roff + run
                        cpos_f = cpos + run
                        cpos = cpos_f + hit.astype(_I32)
                        fmask = fmask | jnp.where(
                            (lanes == cpos_f) & hit, 1, 0
                        )
                        # fired entry: the sequential cascade
                        e = ext(erow, cpos_f)
                        node = jnp.clip(e >> 1, 0, N - 1)
                        is_a = (e & 1) == 1
                        if geo_hbm:
                            # HBM geometry table: one single-row DMA
                            # per fire (the round-5 encoder t1_hbm
                            # pattern; ~1 us dependent-access latency,
                            # spike_hbm_table.py)
                            pltpu.make_async_copy(
                                geo_ref.at[pl.ds(node // LANES, 1), :],
                                gsc_ref, gsem_ref,
                            ).start()
                            pltpu.make_async_copy(
                                geo_ref.at[pl.ds(node // LANES, 1), :],
                                gsc_ref, gsem_ref,
                            ).wait()
                            gw = ext(gsc_ref[:], node % LANES)
                        else:
                            gw = rd(geo_ref, node, N)
                        hc = ((gw >> 1) & 1) == 1
                        hgf = (gw & 1) == 1
                        c0 = jax.lax.shift_right_logical(
                            gw, jnp.asarray(2, gw.dtype)
                        )
                        a_fired = is_a & hit
                        run_children = a_fired & hc
                        koff = jnp.ones((), _I32)
                        dead_c = jnp.zeros((), jnp.bool_)
                        scur = cur + roff
                        for k in range(4):
                            ch = jnp.clip(
                                c0 + child_off[k], 0, N - 1
                            )
                            uset = run_children & ~dead_c
                            okt = uset & ((scur + koff) < nbits)
                            bt = wbit64(roff + koff) & okt
                            dt = uset & ~okt
                            if with_log:
                                q1 = roff + koff
                                m1c = (lanes == q1) & uset
                                wlogv = wlogv | jnp.where(
                                    m1c,
                                    ch | (3 << 24) | ((n + 1) << 27),
                                    0,
                                )
                                wlogm = wlogm | m1c.astype(_I32)
                            koff = koff + okt.astype(_I32)
                            oks = bt & ((scur + koff) < nbits) & ~dt
                            bs = wbit64(roff + koff) & oks
                            ds = bt & ~oks & ~dt
                            if with_log:
                                q2 = roff + koff
                                m2c = (lanes == q2) & bt
                                wlogv = wlogv | jnp.where(
                                    m2c,
                                    ch | (4 << 24) | ((n + 1) << 27),
                                    0,
                                )
                                wlogm = wlogm | m2c.astype(_I32)
                            koff = koff + oks.astype(_I32)
                            commit = bt & oks
                            lsp_sl.append(
                                (csum, commit,
                                 ch | (jnp.where(bs, 1, 0) << 26))
                            )
                            csum = csum + commit.astype(_I32)
                            insig = okt & ~bt
                            lip_sl.append((isumk, insig, ch))
                            isumk = isumk + insig.astype(_I32)
                            dead_c = dead_c | dt | ds
                        reapp = a_fired & hgf & ~dead_c
                        lis_sl.append((lsum, reapp, node << 1))
                        lsum = lsum + reapp.astype(_I32)
                        b_fired = (~is_a) & hit & hc
                        for k in range(4):
                            lis_sl.append(
                                (lsum + k, b_fired,
                                 (jnp.clip(c0 + child_off[k], 0,
                                           N - 1) << 1) | 1)
                            )
                        lsum = lsum + jnp.where(b_fired, 4, 0)
                        roff = roff + jnp.where(hit, koff, 0)
                        adv_ok = adv_ok & ~dead_s & ~dead_c
                        dead_n = dead_n | dead_s | dead_c
                    # ONE 2-row masked write per queue for BOTH fires
                    appendk(
                        [(lspn_ref, [v for _, _, v in lsp_sl]),
                         (lspm_ref, [bv] * len(lsp_sl))],
                        lsp_cnt,
                        [(o, wnt, i)
                         for i, (o, wnt, _) in enumerate(lsp_sl)],
                        LSP_CAP,
                    )
                    lsp_cnt = lsp_cnt + csum
                    appendk(
                        [(lip_ref, [v for _, _, v in lip_sl])],
                        lip_w + lip_add,
                        [(o, wnt, i)
                         for i, (o, wnt, _) in enumerate(lip_sl)],
                        LIP_CAP,
                    )
                    lip_add = lip_add + isumk
                    appendk(
                        [(lis_ref, [v for _, _, v in lis_sl])],
                        lis_t,
                        [(o, wnt, i)
                         for i, (o, wnt, _) in enumerate(lis_sl)],
                        LIS_CAP,
                    )
                    lis_t = lis_t + lsum
                    if with_log:
                        place_log(wlogv, wlogm, cur)
                    cur = cur + roff
                    dead = dead | dead_n.astype(_I32)
                    return (cur, cpos, lip_add, lis_t, lsp_cnt, dead,
                            fmask)

                t = jax.lax.while_loop(
                    icond, ibody,
                    (cur, start, lip_add, lis_t, lsp_cnt, dead,
                     jnp.zeros((1, LANES), _I32)),
                )
                cur, _, lip_add, lis_t, lsp_cnt, dead, fmask = t
                retain = (
                    (lanes >= start) & (lanes < vend) & (fmask == 0)
                )
                scatter_rows(
                    lis_w, [(lis_ref, LIS_ROWS, erow)], retain
                )
                return (cur, n, lip_cnt, lip_w, lip_add,
                        lis_w + isum(retain), lis_t, lsp_cnt, lsp_snap,
                        r * LANES + vend, dead, done)

            return jax.lax.while_loop(cond, body, s)

        def ref_phase(s):
            def cond(s):
                return (s[9] * LANES < s[8]) & (s[10] == 0)

            def body(s):
                (cur, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                 lsp_cnt, lsp_snap, r, dead, done) = s
                mrow = lspm_ref[pl.ds(r, 1), :]
                valid = lanes < (lsp_snap - r * LANES)
                bvec = bits128(cur)
                off = cur + prefix(valid.astype(_I32))
                ok = valid & (off < nbits)
                if with_log:
                    nrow = lspn_ref[pl.ds(r, 1), :]
                    place_log(
                        (nrow & 0xFFFFFF) | (6 << 24) | ((n + 1) << 27),
                        valid & (off <= nbits), cur,
                    )
                nbit = (1 << n).astype(_I32)
                newm = jnp.where(
                    bvec == 1, mrow | nbit, mrow & ~nbit
                )
                lspm_ref[pl.ds(r, 1), :] = jnp.where(ok, newm, mrow)
                dead = dead | (isum(valid & ~ok) > 0).astype(_I32)
                return (cur + isum(ok), n, lip_cnt, lip_w, lip_add,
                        lis_w, lis_t, lsp_cnt, lsp_snap, r + 1, dead,
                        done)

            return jax.lax.while_loop(cond, body, s)

        def outer_cond(s):
            return (s[10] == 0) & (s[11] == 0)

        def outer_body(s):
            s = lip_phase(s)
            s = tuple(
                jnp.zeros((), _I32) if i == 9 else s[i]
                for i in range(12)
            )
            s = lis_phase(s)
            s = tuple(
                jnp.zeros((), _I32) if i == 9 else s[i]
                for i in range(12)
            )
            s = ref_phase(s)
            (cur, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
             lsp_cnt, lsp_snap, r, dead, done) = s
            done = done | (n == 0).astype(_I32)
            z = jnp.zeros((), _I32)
            return (
                cur, jnp.maximum(n - 1, 0),
                lip_w + lip_add, z, z,
                z, lis_w,
                lsp_cnt, lsp_cnt, z,
                dead, done,
            )

        z = jnp.zeros((), _I32)
        init = (
            z, max_n,
            jnp.asarray(n_lip0, _I32), z, z,
            z, jnp.asarray(n_lis0, _I32),
            z, z, z,
            z, z,
        )
        end = jax.lax.while_loop(outer_cond, outer_body, init)
        stat_ref[0, 0] = end[7]  # lsp_cnt
        stat_ref[0, 1] = end[10]

    params = {}
    if not interpret:
        # geo_hbm frees the N-table from VMEM; its remaining state may
        # use more of the 128 MB chip VMEM than the all-resident
        # machines' 110 MB ceiling
        cap_mb = 121 if geo_hbm else 110
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(vmem_bytes + (8 << 20), 24 << 20), cap_mb << 20
            )
        )

    out_shape = [
        jax.ShapeDtypeStruct((LSP_ROWS, LANES), jnp.int32),
        jax.ShapeDtypeStruct((LSP_ROWS, LANES), jnp.int32),
        jax.ShapeDtypeStruct((1, 2), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    if with_log:
        out_shape.append(
            jax.ShapeDtypeStruct((LOG_ROWS, LANES), jnp.int32)
        )
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # words
            pl.BlockSpec(                           # geo
                memory_space=(
                    pltpu.MemorySpace.HBM if geo_hbm else pltpu.VMEM
                )
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lip init
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lis init
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((LIP_ROWS, LANES), jnp.int32),
            pltpu.VMEM((LIS_ROWS, LANES), jnp.int32),
            *([pltpu.VMEM((1, LANES), jnp.int32),
               pltpu.SemaphoreType.DMA(())] if geo_hbm else []),
        ],
        interpret=interpret,
        **params,
    )

    @jax.jit
    def fn(words, nbits, max_n):
        words_i = jax.lax.bitcast_convert_type(
            jnp.asarray(words, jnp.uint32), jnp.int32
        )
        words2d = jnp.zeros(W_ROWS * LANES, jnp.int32).at[
            :cap_words
        ].set(words_i).reshape(W_ROWS, LANES)
        sc = jnp.stack(
            [jnp.asarray(nbits, _I32), jnp.asarray(max_n, _I32)]
        )
        outs = call(words2d, geo2d, lipi2d, lisi2d, sc)
        lspn, lspm, stat = outs[0], outs[1], outs[2]
        cnt = stat[0, 0]
        nodes = (lspn & ((1 << 26) - 1)).reshape(-1)
        sgn = ((lspn >> 26) & 1).reshape(-1)
        mags = lspm.reshape(-1)
        idx = jnp.arange(LSP_ROWS * LANES, dtype=_I32)
        live = idx < cnt
        vals = jnp.where(sgn == 1, mags, -mags)
        tgt = jnp.where(live, nodes, N)
        rec = jnp.zeros(N, jnp.int32).at[tgt].set(
            jnp.where(live, vals, 0), mode="drop"
        )
        rec = rec.reshape(c, h, w)
        if out_dtype == "int16":
            rec = rec.astype(jnp.int16)
        if with_log:
            return rec, outs[3].reshape(-1)
        return rec

    return fn


def _narrowed_caps(g, cap_words: int):
    """Budget-narrowed queue capacities — safe for any stream of
    <= cap_words*32 bits by the same bit-charging argument as
    pallas_encoder._narrowed_caps (decode consumes the bits the encoder
    emitted: LIP insert <-> one consumed child sig bit, LSP commit <->
    two consumed bits, LIS appends <= consumed bits)."""
    return narrowed_caps(
        QueueBounds(
            n_lip0=int(g["lip_init"].size), n_lis0=int(g["lis_init"].size),
            ent_bound=int(g["ent_bound"]), lis_bound=int(g["lis_bound"]),
            dup=False,
        ),
        cap_words,
    )


def interleaved_vmem_bytes(
    B: int, c: int, h: int, w: int, ll_h: int, ll_w: int, cap_words: int
) -> int:
    """VMEM bytes of the B-chain interleaved decode machine (geometry
    table, LIP/LIS init entries shared; queues budget-narrowed).
    Closed-form, like ``machine_vmem_bytes``."""
    qb = queue_bounds(c, h, w, ll_h, ll_w)
    N = c * h * w
    lip_cap, lis_cap, lsp_cap = narrowed_caps(qb, cap_words)
    li_rows = _rows(max(qb.n_lip0, 1))
    ls_rows = _rows(max(qb.n_lis0, 1))
    per_chain = (
        _rows(lip_cap) + _rows(lis_cap) + 2 * _rows(lsp_cap)
        + _rows(cap_words)
    )
    shared = _rows(N) + li_rows + ls_rows + 256
    return 4 * LANES * (B * per_chain + shared)


def interleaved_fits(
    B: int, c: int, h: int, w: int, ll_h: int, ll_w: int, cap_words: int
) -> bool:
    if c * h * w >= 1 << 24:
        return False
    if _has_duplicate_parents(h, w, ll_h, ll_w):
        return False  # deferred-rec machine needs unique commits
    return (
        interleaved_vmem_bytes(B, c, h, w, ll_h, ll_w, cap_words)
        <= _VMEM_BUDGET_BYTES
    )


@lru_cache(maxsize=None)
def _interleaved_fn(
    B: int,
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    interpret: bool = False,
    out_dtype: str = "int32",
):
    """B-chain INTERLEAVED hybrid decode machine: ONE kernel steps B
    independent machines per loop iteration so the B dependent parse
    chains overlap on the core (see pallas_encoder._interleaved_fn and
    the ILP spike in BASELINE.md). Per-chain semantics are identical to
    ``_hybrid_fn`` (/root/reference/src/encoder_decoder.rs:307-454,
    byte-prefix truncation included); finished chains are naturally
    inert in the lockstep phase loops. Requires a duplicate-free parent
    map (callers gate on ``interleaved_fits``).

    fn(words u32[B,cap_words], nbits[B], max_ns[B]) -> rec (B,c,h,w).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if c * h * w >= 1 << 24:
        raise ValueError("geometry too large for packed queue entries")
    g = _dec_geom(c, h, w, ll_h, ll_w)
    N = c * h * w
    LIP_CAP, LIS_CAP, LSP_CAP = _narrowed_caps(g, cap_words)
    LIP_ROWS = _rows(LIP_CAP)
    LIS_ROWS = _rows(LIS_CAP)
    LSP_ROWS = _rows(LSP_CAP)
    W_ROWS = _rows(cap_words)

    geo_np = (
        np.asarray(g["child0"], np.int64)
        | (np.asarray(g["has_child"], np.int64) << 24)
        | (np.asarray(g["hg"], np.int64) << 25)
    ).astype(np.int32)
    GEO_ROWS = _rows(N)
    geo2d = jnp.asarray(_pad2d(geo_np, GEO_ROWS, np.int32))

    lip0 = g["lip_init"]
    lis0 = (g["lis_init"].astype(np.int64) << 1 | 1).astype(np.int32)
    n_lip0 = int(lip0.size)
    n_lis0 = int(lis0.size)
    LI_ROWS = _rows(max(n_lip0, 1))
    LS_ROWS = _rows(max(n_lis0, 1))
    lipi2d = jnp.asarray(_pad2d(lip0, LI_ROWS, np.int32))
    lisi2d = jnp.asarray(_pad2d(lis0, LS_ROWS, np.int32))

    vmem_bytes = interleaved_vmem_bytes(B, c, h, w, ll_h, ll_w, cap_words)

    _c31 = np.int32(31)
    _c16 = np.int32(16)

    # per-chain carry layout (i32 scalars), as in _hybrid_fn:
    # 0 cur, 1 n, 2 lip_cnt, 3 lip_w, 4 lip_add, 5 lis_w, 6 lis_t,
    # 7 lsp_cnt, 8 lsp_snap, 9 cursor, 10 dead, 11 done
    def kernel(words_ref, geo_ref, lipi_ref, lisi_ref, sc_ref,
               lspn_ref, lspm_ref, stat_ref, lip_ref, lis_ref):
        lanes = jax.lax.broadcasted_iota(_I32, (1, LANES), 1)
        sq0 = jax.lax.broadcasted_iota(_I32, (LANES, LANES), 0)
        sq1 = jax.lax.broadcasted_iota(_I32, (LANES, LANES), 1)
        eye = (sq0 == sq1).astype(jnp.float32)
        tri = (sq0 < sq1).astype(jnp.float32)
        colf = sq1.astype(jnp.float32)
        onesrow = jnp.ones((1, LANES), jnp.float32)

        lspn_ref[:] = jnp.zeros((B * LSP_ROWS, LANES), _I32)
        lspm_ref[:] = jnp.zeros((B * LSP_ROWS, LANES), _I32)
        for b in range(B):
            lip_ref[pl.ds(b * LIP_ROWS, LI_ROWS), :] = lipi_ref[:]
            lis_ref[pl.ds(b * LIS_ROWS, LS_ROWS), :] = lisi_ref[:]

        def rd(ref, base, idx, cap):
            i = jnp.clip(idx, 0, cap - 1)
            row = ref[pl.ds(base + i // LANES, 1), :]
            return jnp.sum(
                jnp.where(lanes == i % LANES, row, 0), dtype=_I32
            )

        def rmw(ref, base, idx, val, want, cap):
            i = jnp.clip(idx, 0, cap - 1)
            r = base + i // LANES
            row = ref[pl.ds(r, 1), :]
            ref[pl.ds(r, 1), :] = jnp.where(
                (lanes == i % LANES) & want, val, row
            )

        def ext(row, lane_idx):
            return jnp.sum(
                jnp.where(lanes == lane_idx, row, 0), dtype=_I32
            )

        def appendk(targets, base_off, slots, cap):
            """targets: [(ref, seg_base_row, vals)]."""
            i0 = jnp.clip(base_off, 0, cap - 1)
            r0 = i0 // LANES
            accs = [
                [jnp.zeros((1, LANES), _I32) for _ in targets]
                for _ in range(2)
            ]
            mask = [jnp.zeros((1, LANES), jnp.bool_) for _ in range(2)]
            for off, want, vi in slots:
                lane0 = base_off + off - r0 * LANES
                for r in range(2):
                    m = (lanes == lane0 - r * LANES) & want
                    mask[r] = mask[r] | m
                    for t, (_ref, _b, vals) in enumerate(targets):
                        accs[r][t] = accs[r][t] | jnp.where(
                            m, vals[vi], 0
                        )
            nrows = (cap + LANES - 1) // LANES
            for r in range(2):
                ri = jnp.clip(r0 + r, 0, nrows - 1)
                for t, (ref, seg_base, _vals) in enumerate(targets):
                    old = ref[pl.ds(seg_base + ri, 1), :]
                    ref[pl.ds(seg_base + ri, 1), :] = jnp.where(
                        mask[r], accs[r][t], old
                    )

        def prefix(v_i32):
            return jnp.dot(
                v_i32.astype(jnp.float32), tri,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(_I32)

        def isum(v):
            return jnp.sum(v.astype(_I32), dtype=_I32)

        def scatter_rows(w_off, vals_list, keep):
            """vals_list: [(ref, seg_base_row, rows_cap, vals)]."""
            dest = (w_off % LANES) + prefix(keep.astype(_I32))
            dm = jnp.where(keep, dest, -1).astype(jnp.float32)
            d_t = jax.lax.dot_general(
                jnp.broadcast_to(dm, (LANES, LANES)), eye,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            r0 = w_off // LANES
            for r in range(2):
                p = (d_t - (r * LANES) == colf).astype(jnp.float32)
                msk = jnp.dot(
                    onesrow, p, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(_I32)
                for ref, seg_base, rows_cap, vals in vals_list:
                    lo = (vals & 0xFFFF).astype(jnp.float32)
                    hi = jax.lax.shift_right_logical(
                        vals, _c16
                    ).astype(jnp.float32)
                    plo = jnp.dot(
                        lo, p, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    phi = jnp.dot(
                        hi, p, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    neww = plo.astype(_I32) | (phi.astype(_I32) << 16)
                    ri = seg_base + jnp.clip(r0 + r, 0, rows_cap - 1)
                    old = ref[pl.ds(ri, 1), :]
                    ref[pl.ds(ri, 1), :] = jnp.where(
                        msk != 0, neww, old
                    )

        def bits128(wbase, cur):
            wi = cur >> 5
            s = cur & 31
            ws = [rd(words_ref, wbase, wi + k, cap_words)
                  for k in range(5)]
            sj = s + lanes
            k = sj >> 5
            sh = sj & 31
            val = jnp.where(
                k == 0, ws[0],
                jnp.where(
                    k == 1, ws[1],
                    jnp.where(k == 2, ws[2],
                              jnp.where(k == 3, ws[3], ws[4])),
                ),
            )
            return jax.lax.shift_right_logical(val, sh) & 1

        def base_val_of(n):
            return jnp.where(
                n == 0,
                jnp.ones((), _I32),
                ((1 << jnp.maximum(n - 1, 0)) + (1 << n)).astype(_I32),
            )

        def shift_lanes(v, d, fill):
            return jnp.where(lanes < d, fill, jnp.roll(v, d, axis=1))

        def token_heads(b):
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
            return sb == 0

        def lip_body_chain(b, s):
            (cur, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
             lsp_cnt, lsp_snap, r, dead, done) = s
            act = (r * LANES < lip_cnt) & (dead == 0) & (done == 0)
            nbits = sc_ref[2 * b]
            lbase = b * LIP_ROWS
            rr = jnp.clip(r, 0, LIP_ROWS - 1)
            row = lip_ref[pl.ds(lbase + rr, 1), :]
            vend = jnp.where(
                act, jnp.minimum(lip_cnt - r * LANES, LANES), 0
            )
            bv = base_val_of(n)

            def icond(t):
                return (t[1] < vend) & (t[3] == 0)

            def ibody(t):
                cur, cpos, lsp_cnt, dead, cmask = t
                bvec = bits128(b * W_ROWS, cur)
                hd = token_heads(bvec)
                remaining = vend - cpos
                rk = prefix(hd.astype(_I32))
                within = rk < remaining
                fits = (lanes + 1 + bvec) <= LANES
                badq = jnp.min(
                    jnp.where(hd & ~(within & fits), lanes, LANES)
                )
                parsed = hd & (lanes < badq)
                pos_q = cur + lanes
                ok0 = parsed & (pos_q < nbits)
                fired = ok0 & (bvec == 1)
                ok1 = fired & ((pos_q + 1) < nbits)
                sgn_h = jnp.roll(bvec, -1, axis=1)
                commit_h = fired & ok1
                dead = dead | (
                    isum(parsed & ~ok0) + isum(fired & ~ok1) > 0
                ).astype(_I32)
                dest = jnp.where(parsed, cpos + rk, -1).astype(
                    jnp.float32
                )
                d_t = jax.lax.dot_general(
                    jnp.broadcast_to(dest, (LANES, LANES)), eye,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                p = (d_t == colf).astype(jnp.float32)

                def perm(v):
                    return jnp.dot(
                        v.astype(jnp.float32), p,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    ).astype(_I32)

                fired_e = perm(fired.astype(_I32))
                commit_e = perm(commit_h.astype(_I32))
                sgn_e = perm(jnp.where(commit_h, sgn_h, 0))
                cmask = cmask | fired_e
                scatter_rows(
                    lsp_cnt,
                    [
                        (lspn_ref, b * LSP_ROWS, LSP_ROWS,
                         row | (sgn_e << 24)),
                        (lspm_ref, b * LSP_ROWS, LSP_ROWS,
                         bv + jnp.zeros((1, LANES), _I32)),
                    ],
                    commit_e == 1,
                )
                lsp_cnt = lsp_cnt + isum(commit_h)
                cur = cur + isum(parsed) + isum(parsed & (bvec == 1))
                cpos = cpos + isum(parsed)
                return (cur, cpos, lsp_cnt, dead, cmask)

            z = jnp.zeros((), _I32)
            t = jax.lax.while_loop(
                icond, ibody,
                (cur, z, lsp_cnt, dead, jnp.zeros((1, LANES), _I32)),
            )
            cur, _, lsp_cnt, dead, cmask = t
            retain = (lanes < vend) & (cmask == 0)
            scatter_rows(
                lip_w, [(lip_ref, lbase, LIP_ROWS, row)], retain
            )
            r = jnp.where(act, r + 1, r)
            return (cur, n, lip_cnt, lip_w + isum(retain),
                    lip_add, lis_w, lis_t, lsp_cnt, lsp_snap,
                    r, dead, done)

        child_off = (0, 1, w, w + 1)

        def lis_body_chain(b, s):
            (cur, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
             lsp_cnt, lsp_snap, lis_i, dead, done) = s
            act = (lis_i < lis_t) & (dead == 0) & (done == 0)
            nbits = sc_ref[2 * b]
            lbase = b * LIS_ROWS
            r = jnp.clip(lis_i // LANES, 0, LIS_ROWS - 1)
            erow = lis_ref[pl.ds(lbase + r, 1), :]
            start = lis_i % LANES
            vend = jnp.where(
                act, jnp.minimum(lis_t - r * LANES, LANES), start
            )
            bv = base_val_of(n)
            wbase = b * W_ROWS

            def icond(t):
                return (t[1] < vend) & (t[5] == 0)

            def ibody(t):
                (cur, cpos, lip_add, lis_t, lsp_cnt, dead, fmask) = t
                wi = jnp.clip(cur >> 5, 0, cap_words - 1)
                w0 = rd(words_ref, wbase, wi, cap_words)
                w1 = rd(words_ref, wbase, wi + 1, cap_words)
                w2 = rd(words_ref, wbase, wi + 2, cap_words)
                sft = cur & 31
                lo = jax.lax.shift_right_logical(w0, sft) | jnp.where(
                    sft == 0, jnp.zeros((), _I32), w1 << (32 - sft)
                )
                hi = jax.lax.shift_right_logical(w1, sft) | jnp.where(
                    sft == 0, jnp.zeros((), _I32), w2 << (32 - sft)
                )

                def wbit64(idx):
                    losh = jax.lax.shift_right_logical(
                        lo, jnp.clip(idx, 0, 31)
                    )
                    hish = jax.lax.shift_right_logical(
                        hi, jnp.clip(idx - 32, 0, 31)
                    )
                    return (jnp.where(idx < 32, losh, hish) & 1) == 1

                lov = lo + jnp.zeros((1, LANES), _I32)
                hiv = hi + jnp.zeros((1, LANES), _I32)

                def scan_vec(roff):
                    idxv = roff + lanes
                    v = jnp.where(
                        idxv < 32,
                        jax.lax.shift_right_logical(
                            lov, jnp.clip(idxv, 0, 31)
                        ),
                        jax.lax.shift_right_logical(
                            hiv, jnp.clip(idxv - 32, 0, 31)
                        ),
                    )
                    return v & 1

                lsp_sl, lip_sl, lis_sl = [], [], []
                csum = jnp.zeros((), _I32)
                isumk = jnp.zeros((), _I32)
                lsum = jnp.zeros((), _I32)
                roff = jnp.zeros((), _I32)
                adv_ok = dead == 0
                dead_n = jnp.zeros((), jnp.bool_)
                for _phase in range(2):
                    remaining = vend - cpos
                    wlim = jnp.clip(
                        jnp.minimum(remaining, 54 - roff), 0, 127
                    )
                    blim = jnp.clip(nbits - cur - roff, 0, wlim)
                    bvecp = scan_vec(roff)
                    one_at = jnp.min(
                        jnp.where(
                            (bvecp == 1) & (lanes < blim),
                            lanes, LANES,
                        )
                    )
                    hit = (one_at < blim) & adv_ok
                    run = jnp.where(
                        adv_ok,
                        jnp.where(one_at < blim, one_at, blim),
                        0,
                    )
                    dead_s = adv_ok & (one_at >= blim) & (blim < wlim)
                    roff = roff + run
                    cpos_f = cpos + run
                    cpos = cpos_f + hit.astype(_I32)
                    fmask = fmask | jnp.where(
                        (lanes == cpos_f) & hit, 1, 0
                    )
                    e = ext(erow, cpos_f)
                    node = jnp.clip(e >> 1, 0, N - 1)
                    is_a = (e & 1) == 1
                    gw = rd(geo_ref, 0, node, N)
                    hc = ((gw >> 24) & 1) == 1
                    hgf = ((gw >> 25) & 1) == 1
                    c0 = gw & 0xFFFFFF
                    a_fired = is_a & hit
                    run_children = a_fired & hc
                    koff = jnp.ones((), _I32)
                    dead_c = jnp.zeros((), jnp.bool_)
                    scur = cur + roff
                    for k in range(4):
                        ch = jnp.clip(c0 + child_off[k], 0, N - 1)
                        uset = run_children & ~dead_c
                        okt = uset & ((scur + koff) < nbits)
                        bt = wbit64(roff + koff) & okt
                        dt = uset & ~okt
                        koff = koff + okt.astype(_I32)
                        oks = bt & ((scur + koff) < nbits) & ~dt
                        bs = wbit64(roff + koff) & oks
                        ds = bt & ~oks & ~dt
                        koff = koff + oks.astype(_I32)
                        commit = bt & oks
                        lsp_sl.append(
                            (csum, commit,
                             ch | (jnp.where(bs, 1, 0) << 24))
                        )
                        csum = csum + commit.astype(_I32)
                        insig = okt & ~bt
                        lip_sl.append((isumk, insig, ch))
                        isumk = isumk + insig.astype(_I32)
                        dead_c = dead_c | dt | ds
                    reapp = a_fired & hgf & ~dead_c
                    lis_sl.append((lsum, reapp, node << 1))
                    lsum = lsum + reapp.astype(_I32)
                    b_fired = (~is_a) & hit & hc
                    for k in range(4):
                        lis_sl.append(
                            (lsum + k, b_fired,
                             (jnp.clip(c0 + child_off[k], 0,
                                       N - 1) << 1) | 1)
                        )
                    lsum = lsum + jnp.where(b_fired, 4, 0)
                    roff = roff + jnp.where(hit, koff, 0)
                    adv_ok = adv_ok & ~dead_s & ~dead_c
                    dead_n = dead_n | dead_s | dead_c
                appendk(
                    [(lspn_ref, b * LSP_ROWS,
                      [v for _, _, v in lsp_sl]),
                     (lspm_ref, b * LSP_ROWS, [bv] * len(lsp_sl))],
                    lsp_cnt,
                    [(o, wnt, i)
                     for i, (o, wnt, _) in enumerate(lsp_sl)],
                    LSP_CAP,
                )
                lsp_cnt = lsp_cnt + csum
                appendk(
                    [(lip_ref, b * LIP_ROWS,
                      [v for _, _, v in lip_sl])],
                    lip_w + lip_add,
                    [(o, wnt, i)
                     for i, (o, wnt, _) in enumerate(lip_sl)],
                    LIP_CAP,
                )
                lip_add = lip_add + isumk
                appendk(
                    [(lis_ref, lbase, [v for _, _, v in lis_sl])],
                    lis_t,
                    [(o, wnt, i)
                     for i, (o, wnt, _) in enumerate(lis_sl)],
                    LIS_CAP,
                )
                lis_t = lis_t + lsum
                cur = cur + roff
                dead = dead | dead_n.astype(_I32)
                return (cur, cpos, lip_add, lis_t, lsp_cnt, dead,
                        fmask)

            t = jax.lax.while_loop(
                icond, ibody,
                (cur, start, lip_add, lis_t, lsp_cnt, dead,
                 jnp.zeros((1, LANES), _I32)),
            )
            cur, _, lip_add, lis_t, lsp_cnt, dead, fmask = t
            retain = (lanes >= start) & (lanes < vend) & (fmask == 0)
            scatter_rows(
                lis_w, [(lis_ref, lbase, LIS_ROWS, erow)], retain
            )
            post_act = (dead == 0) & (done == 0)
            new_i = jnp.where(
                post_act & (lis_i < lis_t), r * LANES + vend, lis_i
            )
            return (cur, n, lip_cnt, lip_w, lip_add,
                    lis_w + isum(retain), lis_t, lsp_cnt, lsp_snap,
                    new_i, dead, done)

        def ref_body_chain(b, s):
            (cur, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
             lsp_cnt, lsp_snap, r, dead, done) = s
            act = (r * LANES < lsp_snap) & (dead == 0) & (done == 0)
            nbits = sc_ref[2 * b]
            rr = jnp.clip(r, 0, LSP_ROWS - 1)
            mrow = lspm_ref[pl.ds(b * LSP_ROWS + rr, 1), :]
            valid = act & (lanes < (lsp_snap - r * LANES))
            bvec = bits128(b * W_ROWS, cur)
            off = cur + prefix(valid.astype(_I32))
            ok = valid & (off < nbits)
            nbit = (1 << n).astype(_I32)
            newm = jnp.where(bvec == 1, mrow | nbit, mrow & ~nbit)
            lspm_ref[pl.ds(b * LSP_ROWS + rr, 1), :] = jnp.where(
                ok, newm, mrow
            )
            dead = dead | (isum(valid & ~ok) > 0).astype(_I32)
            r = jnp.where(act, r + 1, r)
            return (cur + isum(ok), n, lip_cnt, lip_w, lip_add,
                    lis_w, lis_t, lsp_cnt, lsp_snap, r, dead, done)

        def any_true(flags):
            out = flags[0]
            for f in flags[1:]:
                out = out | f
            return out

        def lip_phase(states):
            def cond(states):
                return any_true(tuple(
                    (s[9] * LANES < s[2]) & (s[10] == 0) & (s[11] == 0)
                    for s in states
                ))

            def body(states):
                return tuple(
                    lip_body_chain(b, states[b]) for b in range(B)
                )

            return jax.lax.while_loop(cond, body, states)

        def lis_phase(states):
            def cond(states):
                return any_true(tuple(
                    (s[9] < s[6]) & (s[10] == 0) & (s[11] == 0)
                    for s in states
                ))

            def body(states):
                return tuple(
                    lis_body_chain(b, states[b]) for b in range(B)
                )

            return jax.lax.while_loop(cond, body, states)

        def ref_phase(states):
            def cond(states):
                return any_true(tuple(
                    (s[9] * LANES < s[8]) & (s[10] == 0) & (s[11] == 0)
                    for s in states
                ))

            def body(states):
                return tuple(
                    ref_body_chain(b, states[b]) for b in range(B)
                )

            return jax.lax.while_loop(cond, body, states)

        def outer_cond(states):
            return any_true(tuple(
                (s[10] == 0) & (s[11] == 0) for s in states
            ))

        def outer_body(states):
            def zero9(states):
                return tuple(
                    tuple(
                        jnp.zeros((), _I32) if i == 9 else s[i]
                        for i in range(12)
                    )
                    for s in states
                )

            states = lip_phase(states)
            states = zero9(states)
            states = lis_phase(states)
            states = zero9(states)
            states = ref_phase(states)
            out = []
            for s in states:
                (cur, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                 lsp_cnt, lsp_snap, r, dead, done) = s
                act = (dead == 0) & (done == 0)
                done = done | (act & (n == 0)).astype(_I32)
                z = jnp.zeros((), _I32)
                out.append((
                    cur,
                    jnp.where(act, jnp.maximum(n - 1, 0), n),
                    jnp.where(act, lip_w + lip_add, lip_cnt),
                    z, z,
                    z,
                    jnp.where(act, lis_w, lis_t),
                    lsp_cnt, jnp.where(act, lsp_cnt, lsp_snap), z,
                    dead, done,
                ))
            return tuple(out)

        z = jnp.zeros((), _I32)
        init = tuple(
            (
                z, sc_ref[2 * b + 1],
                jnp.asarray(n_lip0, _I32), z, z,
                z, jnp.asarray(n_lis0, _I32),
                z, z, z,
                z, z,
            )
            for b in range(B)
        )
        end = jax.lax.while_loop(outer_cond, outer_body, init)
        for b in range(B):
            stat_ref[0, 2 * b] = end[b][7]   # lsp_cnt
            stat_ref[0, 2 * b + 1] = end[b][10]

    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(vmem_bytes + (8 << 20), 24 << 20), 127 << 20
            )
        )

    call = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B * LSP_ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B * LSP_ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 2 * B), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # words stacked
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geo (shared)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lip init (shared)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lis init (shared)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars (2B,)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B * LIP_ROWS, LANES), jnp.int32),
            pltpu.VMEM((B * LIS_ROWS, LANES), jnp.int32),
        ],
        interpret=interpret,
        **params,
    )

    @jax.jit
    def fn(words, nbits, max_ns):
        words_i = jax.lax.bitcast_convert_type(
            jnp.asarray(words, jnp.uint32), jnp.int32
        )
        words2d = jnp.zeros((B, W_ROWS * LANES), jnp.int32).at[
            :, :cap_words
        ].set(words_i).reshape(B * W_ROWS, LANES)
        sc = jnp.stack(
            [jnp.asarray(nbits, _I32), jnp.asarray(max_ns, _I32)],
            axis=1,
        ).reshape(2 * B)
        lspn, lspm, stat = call(words2d, geo2d, lipi2d, lisi2d, sc)
        lspn = lspn.reshape(B, LSP_ROWS * LANES)
        lspm = lspm.reshape(B, LSP_ROWS * LANES)
        cnt = stat[0, 0::2]
        nodes = lspn & 0xFFFFFF
        sgn = (lspn >> 24) & 1
        idx = jnp.arange(LSP_ROWS * LANES, dtype=_I32)
        live = idx[None, :] < cnt[:, None]
        vals = jnp.where(sgn == 1, lspm, -lspm)
        tgt = jnp.where(live, nodes, N)
        rec = jnp.zeros((B, N), jnp.int32).at[
            jnp.arange(B, dtype=_I32)[:, None], tgt
        ].set(jnp.where(live, vals, 0), mode="drop")
        rec = rec.reshape(B, c, h, w)
        if out_dtype == "int16":
            rec = rec.astype(jnp.int16)
        return rec

    return fn


def pallas_decode(
    data: bytes, max_n: int, c: int, h: int, w: int, ll_h: int, ll_w: int,
    interpret: bool = False,
) -> np.ndarray:
    """Decode a SPIHT stream with the Pallas kernel (plain decode)."""
    nbits = len(data) * 8
    cap_words = max((nbits + 31) // 32, 1)
    fn = pallas_decode_fn(c, h, w, ll_h, ll_w, cap_words, interpret)
    words = jnp.asarray(_words_of(data, cap_words))
    return np.asarray(fn(words, nbits, max_n))


def pallas_decode_batch_fn(
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    interpret: bool = False,
    machine: str | None = None,
    out_dtype: str = "int32",
):
    """fn(words[B], nbits[B], max_ns[B]) -> rec[B] — ONE program, a
    lax.map loop of the bit machine (vmap cannot grid-batch the SMEM
    operands). out_dtype='int16' ships narrowed recs (max_n <= 13 only,
    see pallas_decode_fn)."""
    if machine is None:
        machine = os.environ.get("SPIHT_TPU_PALLAS_DEC_MACHINE", "hybrid")
    return _dec_batch_fn_cached(c, h, w, ll_h, ll_w, cap_words,
                                interpret, machine, out_dtype)


@lru_cache(maxsize=None)
def _dec_batch_fn_cached(c, h, w, ll_h, ll_w, cap_words, interpret,
                         machine, out_dtype="int32"):
    fn = pallas_decode_fn(c, h, w, ll_h, ll_w, cap_words, interpret,
                          machine, out_dtype)

    @jax.jit
    def bfn(words, nbits, max_ns):
        return jax.lax.map(
            lambda t: fn.__wrapped__(t[0], t[1], t[2]),
            (words, nbits, max_ns),
        )

    return bfn


def _ilv_chunk_b() -> int:
    try:
        return max(int(os.environ.get("SPIHT_TPU_PALLAS_ILV_B", "8")), 1)
    except ValueError:
        return 8


def pallas_decode_batch(
    datas, max_ns, c: int, h: int, w: int, ll_h: int, ll_w: int,
    interpret: bool = False, machine: str | None = None,
) -> np.ndarray:
    """Decode B same-geometry streams in one program -> rec (B,c,h,w).

    Routes to the B-chain INTERLEAVED machine when its state fits VMEM
    and the geometry is duplicate-parent free, else to the lax.map loop
    of single machines. SPIHT_TPU_PALLAS_DEC_BATCH=map|ilv forces a
    route; SPIHT_TPU_PALLAS_ILV_B caps the chains per kernel.
    """
    B = len(datas)
    cap_words = max(
        max((len(d) * 8 + 31) // 32 for d in datas), 1
    )
    words = np.stack([_words_of(d, cap_words) for d in datas])
    nbits = np.array([len(d) * 8 for d in datas], np.int32)
    mns = np.asarray(max_ns, np.int32)
    if mns.ndim == 0:
        mns = np.full(B, int(mns), np.int32)
    od = "int16" if int(mns.max()) <= 13 else "int32"
    mode = os.environ.get("SPIHT_TPU_PALLAS_DEC_BATCH", "auto")
    if machine is None:
        machine = os.environ.get("SPIHT_TPU_PALLAS_DEC_MACHINE", "hybrid")
    bchunk = min(_ilv_chunk_b(), B)
    use_ilv = mode != "map" and machine == "hybrid" and (
        interleaved_fits(bchunk, c, h, w, ll_h, ll_w, cap_words)
    )
    if mode == "ilv" and not use_ilv:
        raise MachineResourceLimit(f"ilv B={bchunk} {c}x{h}x{w}")
    if use_ilv:
        recs = []
        for s in range(0, B, bchunk):
            e = min(s + bchunk, B)
            fn = _interleaved_fn(e - s, c, h, w, ll_h, ll_w,
                                 cap_words, interpret, od)
            recs.append(np.asarray(fn(
                jnp.asarray(words[s:e]), jnp.asarray(nbits[s:e]),
                jnp.asarray(mns[s:e]),
            )))
        rec = np.concatenate(recs)
    else:
        fn = pallas_decode_batch_fn(c, h, w, ll_h, ll_w, cap_words,
                                    interpret, machine, out_dtype=od)
        rec = np.asarray(
            fn(jnp.asarray(words), jnp.asarray(nbits), jnp.asarray(mns))
        )
    return rec.astype(np.int32, copy=False) if od == "int16" else rec
