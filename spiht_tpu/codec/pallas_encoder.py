"""Pallas sequential SPIHT encoder: the emission machine in ONE TPU kernel.

The mirror of codec/pallas_decoder.py: the encoder's pop ladder is
structurally IDENTICAL to the decoder's (same slots, same budget/dead
flags with max_bits in place of nbits) except the bit values come from
the significance maps instead of the stream, and each ladder slot EMITS
its bit. Significance questions are one comparison each against the
precomputed M/D/G level maps (codec/maps.py — the same reformulation
the native scheduler uses), so the per-entry body is pure scalar work
over VMEM-resident tables; bits accumulate in a scalar word and flush
to the output buffer once per 32.

Semantics: oracle.encode_bits / the native kernel verbatim
(/root/reference/src/encoder_decoder.rs:155-303): channel-innermost
list init, same-pass LIS worklist, lsp_len refinement snapshot, exact
mid-symbol max_bits stop. Unlike the sort-based device encoder
(codec/device_encoder.py) this machine is CHILD-based, so odd-LL
(duplicate-parent) geometries work — no even-LL fallback.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .device_decoder import _dec_geom
from .maps import significance_maps
from .tree_bounds import QueueBounds, narrowed_caps, queue_bounds

__all__ = [
    "pallas_encode_fn", "pallas_encode", "EncCapacityOverflow",
    "MachineResourceLimit", "machine_vmem_bytes", "machine_fits",
    "interleaved_vmem_bytes", "interleaved_fits", "pallas_encode_batch",
]

LANES = 128
_I32 = jnp.int32
# int32 shift constants (python ints promote to i64 under x64 tests)
_C16 = np.int32(16)
_C29 = np.int32(29)
_C31 = np.int32(31)


class EncCapacityOverflow(RuntimeError):
    """The stream hit the static word-buffer capacity before max_bits."""


class MachineResourceLimit(RuntimeError):
    """The geometry's queue/table state exceeds the VMEM the bit machine
    may request — callers fall back to the XLA formulations."""


def _rows(n: int) -> int:
    return max((n + LANES - 1) // LANES, 1)


def _pad2d(a: np.ndarray, rows: int, dtype) -> np.ndarray:
    out = np.zeros(rows * LANES, dtype)
    out[: a.size] = a
    return out.reshape(rows, LANES)


# bits per coefficient cell that provably cover any stream (see
# device_encoder._CAP_BITS_PER_CELL discussion / ADVICE fix)
_CAP_BITS_PER_CELL = 40

# Geometries whose state sum exceeds this route to the XLA machines
# instead of risking a Mosaic resource failure minutes into a remote
# compile. Anchors: 3x1024x1024/L7 (enc dims 1053^2, 114.3 MB by this
# formula at 1 bpp) compiles and runs bit-exact on v5e hardware
# (BASELINE.md); 2048-class geometries (~430 MB) cannot fit. The static
# sum overcounts Mosaic's real usage slightly (the 114.3 MB case ran
# under a 110 MB vmem_limit request), so chip VMEM is the honest bound.
_VMEM_BUDGET_BYTES = 128 << 20


def machine_vmem_bytes(
    c: int, h: int, w: int, ll_h: int, ll_w: int, cap_words: int,
    compact: bool = False, t1_hbm: bool = False,
) -> int:
    """Exact VMEM bytes the hybrid machine requests for this geometry
    (mirrors ``_hybrid_fn``'s table/queue layout with budget-narrowed
    queue capacities — see ``_narrowed_caps``; the seq machine needs
    strictly less except for its full-capacity queues, and is only
    selected explicitly).  ``compact`` is the one-combo-table variant
    (max_n <= 15): 1 N-sized table instead of 3.  Closed-form — no
    geometry tables are materialized, so routing answers in
    microseconds at any size (tree_bounds.queue_bounds is
    property-tested equal to the ``_bound_dp`` table DP)."""
    qb = queue_bounds(c, h, w, ll_h, ll_w)
    N = c * h * w
    lip_cap, lis_cap, lsp_cap = narrowed_caps(qb, cap_words)
    li_rows = _rows(max(qb.n_lip0, 1))
    ls_rows = _rows(max(qb.n_lis0, 1))
    n_tables = 1 if compact else 3
    # t1_hbm (compact only): the combo table stays HBM-resident and the
    # fire body DMAs one row per child into a 4-row scratch — the
    # N-sized term leaves VMEM entirely (spike_hbm_table.py round-5)
    table_rows = 4 if t1_hbm else n_tables * _rows(N)
    return 4 * LANES * (
        table_rows + _rows(lip_cap) + 2 * _rows(lis_cap)
        + _rows(lsp_cap)
        + _rows(cap_words) + li_rows + 2 * ls_rows + 256
    )


def machine_fits(
    c: int, h: int, w: int, ll_h: int, ll_w: int, cap_words: int,
    compact: bool = False, t1_hbm: bool = False,
) -> bool:
    """Whether the bit machine's state fits the VMEM budget.  With
    ``compact=True``, answers for the one-combo-table machine (only
    valid when max_n <= 15 and c <= 8 — the CALLER checks max_n, which
    is a property of the data, not the geometry).  ``t1_hbm`` keeps the
    combo table HBM-resident (compact only) — 4096^2-class admission."""
    # Packed-entry representation bound for the HYBRID machine family:
    # LIS entry words carry first-child indices scaled by up to
    # (c+1)*h*w << 1 (compact append rule 2*ch - cix*h*w, then <<1|1),
    # so int32 entries are exact while c*h*w < 2^28. The seq and
    # interleaved machines keep their own tighter 2^24 guards.
    # Validated bit-exact past 2^24 on hardware (BASELINE.md round 5).
    if c * h * w >= 1 << 28:
        return False
    if compact and c > 8:
        return False
    if t1_hbm and not compact:
        return False
    return (
        machine_vmem_bytes(c, h, w, ll_h, ll_w, cap_words, compact,
                           t1_hbm)
        <= _VMEM_BUDGET_BYTES
    )


def preferred_machine(
    c: int, h: int, w: int, ll_h: int, ll_w: int, cap_words: int,
    max_n: int,
) -> str:
    """Data-backed single-image machine choice (round-5 hardware sweep,
    BASELINE.md; tools/sweep_compact_default.py).

    compact when the bit budget is BOUNDED (cap_words below the
    geometry's full-stream bound) and the data is valid for it
    (max_n <= 15, c <= 8) — measured +3-19%% at 0.25-1.0 bpp across
    277^2/537^2/1049^2 — or when the standard machine's state does not
    fit VMEM (compact admits 1049^2 full streams and 2048^2 bounded
    budgets). hybrid (standard) at full-stream budgets where it fits:
    the full-budget cells were mixed (+27%% at 277^2, -17%% at 537^2)
    and the headline full-stream lane measured faster on hybrid.

    Raises MachineResourceLimit when neither machine admits the
    geometry (callers fall back to the XLA formulations).
    """
    full_cap = _cap_words_for(c, h, w, 2**31 - 2)
    hybrid_ok = machine_fits(c, h, w, ll_h, ll_w, cap_words)
    compact_ok = max_n <= 15 and machine_fits(
        c, h, w, ll_h, ll_w, cap_words, compact=True
    )
    if compact_ok and (cap_words < full_cap or not hybrid_ok):
        return "compact"
    if hybrid_ok:
        return "hybrid"
    # last resort before the XLA fallback: the combo table moves to HBM
    # (per-fire single-row DMAs; spike_hbm_table.py measured ~1 us per
    # dependent access, flat to 256 MB) — admits 4096^2-class
    # geometries at bounded budgets. SPIHT_TPU_DISABLE_HBM_MACHINES=1
    # opts out (escape hatch for the one recorded geometry anomaly,
    # BASELINE.md round 5).
    if (
        max_n <= 15
        and os.environ.get("SPIHT_TPU_DISABLE_HBM_MACHINES") != "1"
        and machine_fits(
            c, h, w, ll_h, ll_w, cap_words, compact=True, t1_hbm=True
        )
    ):
        return "compact_hbm"
    raise MachineResourceLimit(f"{c}x{h}x{w}")


def pallas_encode_fn(
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    interpret: bool = False,
    machine: str | None = None,
):
    """fn(arr_i32(c,h,w), max_n, max_bits) ->
    (words u32[cap_words], total_bits, overflow).

    machine: 'hybrid' (vector-block LIP/refinement + run-skipping LIS,
    the default), 'compact' (the hybrid with one combo table and
    closed-form child indices — ONLY valid for max_n <= 15 data), or
    'seq' (the original one-entry-per-iteration machine);
    SPIHT_TPU_PALLAS_ENC_MACHINE overrides the default.
    """
    if machine is None:
        machine = os.environ.get("SPIHT_TPU_PALLAS_ENC_MACHINE", "hybrid")
    if machine == "hybrid":
        return _hybrid_fn(c, h, w, ll_h, ll_w, cap_words, interpret)
    if machine == "compact":
        return _hybrid_fn(
            c, h, w, ll_h, ll_w, cap_words, interpret, compact=True
        )
    if machine == "compact_hbm":
        return _hybrid_fn(
            c, h, w, ll_h, ll_w, cap_words, interpret, compact=True,
            t1_hbm=True,
        )
    return _seq_fn(c, h, w, ll_h, ll_w, cap_words, interpret)


@lru_cache(maxsize=None)
def _seq_fn(
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    interpret: bool = False,
):
    """fn(arr_i32(c,h,w), max_n, max_bits) ->
    (words u32[cap_words], total_bits, overflow)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if c * h * w >= 1 << 24:
        raise ValueError("geometry too large for packed queue entries")
    g = _dec_geom(c, h, w, ll_h, ll_w)
    N = c * h * w
    LIP_CAP = g["ent_bound"] + 1
    LIS_CAP = 2 * g["lis_bound"] + 1
    LSP_CAP = g["ent_bound"] + 1
    LIP_ROWS = _rows(LIP_CAP)
    LIS_ROWS = _rows(LIS_CAP)
    LSP_ROWS = _rows(LSP_CAP)
    T_ROWS = _rows(N)
    W_ROWS = _rows(cap_words)
    cap_bits = cap_words * 32

    hc_np = np.asarray(g["has_child"], bool)
    hg_np = np.asarray(g["hg"], bool)
    child0_np = np.asarray(g["child0"], np.int32)
    geo2d = jnp.asarray(_pad2d(child0_np, T_ROWS, np.int32))
    hc_flags = jnp.asarray(
        (hc_np.astype(np.int32) << 16) | (hg_np.astype(np.int32) << 17)
    )

    lip0 = g["lip_init"]
    lis0 = (g["lis_init"].astype(np.int64) << 1 | 1).astype(np.int32)
    n_lip0 = int(lip0.size)
    n_lis0 = int(lis0.size)
    LI_ROWS = _rows(max(n_lip0, 1))
    LS_ROWS = _rows(max(n_lis0, 1))
    lipi2d = jnp.asarray(_pad2d(lip0, LI_ROWS, np.int32))
    lisi2d = jnp.asarray(_pad2d(lis0, LS_ROWS, np.int32))

    vmem_bytes = 4 * LANES * (
        3 * T_ROWS + LIP_ROWS + LIS_ROWS + LSP_ROWS + W_ROWS
        + LI_ROWS + LS_ROWS + 64
    )

    def kernel(t1_ref, t2_ref, t3_ref, lipi_ref, lisi_ref, sc_ref,
               words_ref, stat_ref, lip_ref, lis_ref, lsp_ref):
        max_bits = sc_ref[0]
        max_n = sc_ref[1]
        lanes = jax.lax.broadcasted_iota(_I32, (1, LANES), 1)

        words_ref[:] = jnp.zeros((W_ROWS, LANES), _I32)
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

        def flush(pos, cw, grp, kk):
            """Merge a kk-bit group into the bit cursor; write out the
            completed word (at most one boundary per iteration: kk<=10)."""
            sh = pos & 31
            cw = cw | (grp << sh)
            fl = (sh + kk) >= 32
            rmw(words_ref, pos >> 5, cw, fl, cap_words)
            spill = jax.lax.shift_right_logical(
                grp, jnp.clip(32 - sh, 0, 31)
            )
            cw = jnp.where(fl, spill, cw)
            return pos + kk, cw

        # carry: (pos, cw, n, lip_cnt, lip_i, lip_w, lip_add,
        #         lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
        #         dead, done)
        def lip_phase(s):
            def cond(s):
                return (s[4] < s[3]) & (s[13] == 0)

            def body(s):
                (pos, cw, n, lip_cnt, lip_i, lip_w, lip_add,
                 lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                 dead, done) = s
                ent = rd(lip_ref, lip_i, LIP_CAP)
                t1 = rd(t1_ref, ent, N)
                sig = ((t1 & 31) - 1) >= n
                sgn = ((t1 >> 15) & 1) == 1
                ok0 = pos < max_bits
                b0 = sig & ok0
                dead0 = ~ok0
                ok1 = b0 & ((pos + 1) < max_bits)
                dead1 = b0 & ~ok1
                commit = b0 & ok1
                grp = b0.astype(_I32) | ((sgn & ok1).astype(_I32) << 1)
                kk = ok0.astype(_I32) + ok1.astype(_I32)
                pos, cw = flush(pos, cw, grp, kk)
                rmw(lsp_ref, lsp_cnt, ent, commit, LSP_CAP)
                lsp_cnt = lsp_cnt + commit.astype(_I32)
                retain = ok0 & ~sig
                rmw(lip_ref, lip_w, ent, retain, LIP_CAP)
                lip_w = lip_w + retain.astype(_I32)
                dead = dead | (dead0 | dead1).astype(_I32)
                lip_i = lip_i + 1
                return (pos, cw, n, lip_cnt, lip_i, lip_w, lip_add,
                        lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                        dead, done)

            return jax.lax.while_loop(cond, body, s)

        def lis_phase(s):
            def cond(s):
                return (s[7] < s[9]) & (s[13] == 0)

            def body(s):
                (pos, cw, n, lip_cnt, lip_i, lip_w, lip_add,
                 lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                 dead, done) = s
                e = rd(lis_ref, lis_i, LIS_CAP)
                node = jnp.clip(e >> 1, 0, N - 1)
                is_a = (e & 1) == 1
                t1 = rd(t1_ref, node, N)
                hc = ((t1 >> 16) & 1) == 1
                hgf = ((t1 >> 17) & 1) == 1
                dlev = ((t1 >> 5) & 31) - 1
                glev = ((t1 >> 10) & 31) - 1
                c0 = rd(t2_ref, node, N)
                # slot 0: A emits D>=n, B emits G>=n
                sig0 = jnp.where(is_a, dlev >= n, glev >= n)
                ok0 = pos < max_bits
                b0 = sig0 & ok0
                dead0 = ~ok0
                a_fired = is_a & b0
                run_children = a_fired & hc
                grp = b0.astype(_I32)
                kk = ok0.astype(_I32)
                dead_c = dead0
                child_off = (0, 1, w, w + 1)
                for k in range(4):
                    ch = jnp.clip(c0 + child_off[k], 0, N - 1)
                    ct1 = rd(t1_ref, ch, N)
                    csig = ((ct1 & 31) - 1) >= n
                    csgn = ((ct1 >> 15) & 1) == 1
                    uset = run_children & ~dead_c
                    okt = uset & ((pos + kk) < max_bits)
                    bt = csig & okt
                    dt = uset & ~okt
                    grp = grp | (bt.astype(_I32) << kk)
                    kk = kk + okt.astype(_I32)
                    oks = bt & ((pos + kk) < max_bits) & ~dt
                    ds = bt & ~oks & ~dt
                    grp = grp | ((csgn & oks).astype(_I32) << kk)
                    kk = kk + oks.astype(_I32)
                    commit = bt & oks
                    rmw(lsp_ref, lsp_cnt, ch, commit, LSP_CAP)
                    lsp_cnt = lsp_cnt + commit.astype(_I32)
                    insig = okt & ~bt
                    rmw(lip_ref, lip_w + lip_add, ch, insig, LIP_CAP)
                    lip_add = lip_add + insig.astype(_I32)
                    dead_c = dead_c | dt | ds
                pos, cw = flush(pos, cw, grp, kk)
                reapp = a_fired & hgf & ~dead_c
                rmw(lis_ref, lis_t, node << 1, reapp, LIS_CAP)
                lis_t = lis_t + reapp.astype(_I32)
                b_fired = (~is_a) & b0 & hc
                for k in range(4):
                    ch = jnp.clip(c0 + child_off[k], 0, N - 1)
                    rmw(lis_ref, lis_t, (ch << 1) | 1, b_fired, LIS_CAP)
                    lis_t = lis_t + b_fired.astype(_I32)
                retain = ok0 & ~sig0
                rmw(lis_ref, lis_w, e, retain, LIS_CAP)
                lis_w = lis_w + retain.astype(_I32)
                dead = dead | dead_c.astype(_I32)
                lis_i = lis_i + 1
                return (pos, cw, n, lip_cnt, lip_i, lip_w, lip_add,
                        lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                        dead, done)

            return jax.lax.while_loop(cond, body, s)

        def ref_phase(s):
            def cond(s):
                return (s[12] < s[11]) & (s[13] == 0)

            def body(s):
                (pos, cw, n, lip_cnt, lip_i, lip_w, lip_add,
                 lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                 dead, done) = s
                node = jnp.clip(rd(lsp_ref, ref_i, LSP_CAP), 0, N - 1)
                mag = rd(t3_ref, node, N)
                ok0 = pos < max_bits
                b = (
                    jax.lax.shift_right_logical(mag, jnp.clip(n, 0, 31))
                    & 1
                ) == 1
                grp = (b & ok0).astype(_I32)
                pos, cw = flush(pos, cw, grp, ok0.astype(_I32))
                dead = dead | (~ok0).astype(_I32)
                ref_i = ref_i + 1
                return (pos, cw, n, lip_cnt, lip_i, lip_w, lip_add,
                        lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
                        dead, done)

            return jax.lax.while_loop(cond, body, s)

        def outer_cond(s):
            return (s[13] == 0) & (s[14] == 0)

        def outer_body(s):
            s = lip_phase(s)
            s = lis_phase(s)
            s = ref_phase(s)
            (pos, cw, n, lip_cnt, lip_i, lip_w, lip_add,
             lis_i, lis_w, lis_t, lsp_cnt, lsp_snap, ref_i,
             dead, done) = s
            done = done | (n == 0).astype(_I32)
            z = jnp.zeros((), _I32)
            return (
                pos, cw,
                jnp.maximum(n - 1, 0),
                lip_w + lip_add, z, z, z,
                z, z, lis_w,
                lsp_cnt, lsp_cnt, z,
                dead, done,
            )

        z = jnp.zeros((), _I32)
        init = (
            z, z, max_n,
            jnp.asarray(n_lip0, _I32), z, z, z,
            z, z, jnp.asarray(n_lis0, _I32),
            z, z, z,
            z, z,
        )
        end = jax.lax.while_loop(outer_cond, outer_body, init)
        pos, cw = end[0], end[1]
        # final partial word
        rmw(words_ref, pos >> 5, cw, (pos & 31) != 0, cap_words)
        stat_ref[0, 0] = pos
        stat_ref[0, 1] = end[13]  # dead (budget/capacity stop mid-symbol)

    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(vmem_bytes + (8 << 20), 24 << 20), 100 << 20
            )
        )

    call = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((W_ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # T1 maps+flags
            pl.BlockSpec(memory_space=pltpu.VMEM),  # T2 child0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # T3 |x|
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lip init
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lis init
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((LIP_ROWS, LANES), jnp.int32),
            pltpu.VMEM((LIS_ROWS, LANES), jnp.int32),
            pltpu.VMEM((LSP_ROWS, LANES), jnp.int32),
        ],
        interpret=interpret,
        **params,
    )

    @jax.jit
    def fn(arr, max_n, max_bits):
        arr = jnp.asarray(arr, jnp.int32)
        m, d, gm = significance_maps(arr, ll_h, ll_w)
        mf = m.reshape(-1).astype(_I32) + 1
        df = d.reshape(-1).astype(_I32) + 1
        gf = gm.reshape(-1).astype(_I32) + 1
        sgn = (arr.reshape(-1) >= 0).astype(_I32)
        t1 = mf | (df << 5) | (gf << 10) | (sgn << 15) | hc_flags
        pad = T_ROWS * LANES - N
        t1 = jnp.pad(t1, (0, pad)).reshape(T_ROWS, LANES)
        t3 = jnp.pad(
            jnp.abs(arr.reshape(-1)), (0, pad)
        ).reshape(T_ROWS, LANES)
        mb = jnp.minimum(
            jnp.asarray(max_bits, _I32), jnp.asarray(cap_bits, _I32)
        )
        sc = jnp.stack([mb, jnp.asarray(max_n, _I32)])
        words2d, stat = call(t1, geo2d, t3, lipi2d, lisi2d, sc)
        words = jax.lax.bitcast_convert_type(
            words2d.reshape(-1)[:cap_words], jnp.uint32
        )
        total = stat[0, 0]
        # overflow: stopped by the STATIC buffer capacity, not the
        # caller's budget — the stream is incomplete
        overflow = (stat[0, 1] != 0) & (
            jnp.asarray(max_bits, _I32) > jnp.asarray(cap_bits, _I32)
        ) & (total >= cap_bits - 32)
        return words, total, overflow

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
    compact: bool = False,
    t1_hbm: bool = False,
):
    """Hybrid vector/sequential emission machine (the production one).

    The sequential machine (_seq_fn) pays ~300 ns of dependent-chain
    latency per queue entry. But the LIP pass, the refinement pass, and
    runs of insignificant LIS entries have NO cross-entry value
    dependence — every bit value comes from the precomputed maps — so
    whole 128-lane queue rows are processed per iteration here
    (tools/spike_pallas_block.py measured the block body at ~12
    ns/entry on hardware):

      * queues carry PAYLOADS, not indices: LIP/LSP rows hold packed
        (nonneg<<31 | magnitude) words so significance, sign, and
        refinement bits are lane-local; the LIS value queue holds the
        node's packed level/flag word (t1). The kernel gathers only in
        the fired-LIS cascade (4 children), like the native scheduler.
      * per-row exclusive prefix sums via a strict-triangular f32
        matmul give every lane its nominal bit offset; budget masks
        reproduce the sequential mid-symbol max_bits cut exactly
        (once any bit misses the budget, all later nominal offsets
        also exceed it, so lane masks == sequential semantics).
      * variable-length bit groups are merged into a static word
        window with masked lane reductions and OR'd into the words
        buffer (disjoint bits => sum == or); no carried cursor word.
      * order-preserving queue compaction (LSP commits, LIP/LIS
        retention) is a one-hot permute matmul in 16-bit halves, with
        an MXU transpose to move destinations onto the sublane axis.
        Retention is optimistic past a budget cut: once the machine is
        dead the queues are never read again, so their content is
        allowed to be stale (the emitted words and position are exact).
      * the LIS worklist stays order-sequential (same-pass appends are
        part of the wire format, SURVEY.md 3.6), but each row is
        classified once, its non-fired entries are bulk-retained and
        their zero bits emitted as one run, and only FIRED entries run
        the scalar cascade body.

    COMPACT mode (``compact=True``, requires ``max_n <= 15`` i.e.
    magnitudes < 2^16, and ``c <= 8``): the three N-sized tables fold
    into ONE combo word per cell — mag(0:16) | sgn(16) | d+1(17:22) |
    g+1(22:27) | hc(27) | hg(28) | cix(29:32) — and LIS entries carry
    the node's FIRST-CHILD index instead of the node (the cascade never
    needs node identity beyond c0; a child's own c0 is closed-form,
    ``2*ch - cix*h*w``, because every non-LL node's offspring are dyadic
    — device_decoder._dec_geom's ``oi=2i``/``oj=2j`` branch — and LL
    roots get their parity-rule c0 baked into the initial entries).
    This removes the geo gather entirely and halves the B-fire gathers
    (one combo read per child serves significance, sign, payload, AND
    the appended LIS value), cutting state from 3 to 1 N-table so
    2048^2-class geometries fit VMEM at bounded bit budgets.

    T1_HBM mode (``t1_hbm=True``, compact only): the combo table stays
    HBM-RESIDENT; the fire body issues one single-row DMA per child
    (4 copies in flight together — `pltpu.make_async_copy`) into a
    4-row VMEM scratch and extracts each child's word by lane. All
    other state (queues, words) keeps its monotone-window VMEM access. Removes the 4N-byte table
    from VMEM, admitting 4096^2-class geometries at bounded budgets
    (tools/spike_hbm_table.py: ~1 us per dependent DMA access, flat to
    256 MB tables — BASELINE.md round 5).

    Bit-for-bit semantics: /root/reference/src/encoder_decoder.rs:155-303.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # see machine_fits: the hybrid family's true packed-entry bound
    if c * h * w >= 1 << 28:
        raise ValueError("geometry too large for packed queue entries")
    if compact and c > 8:
        raise ValueError("compact machine packs cix in 3 bits (c <= 8)")
    if t1_hbm and not compact:
        raise ValueError("t1_hbm is a compact-machine mode")
    g = _dec_geom(c, h, w, ll_h, ll_w)
    N = c * h * w
    # budget-narrowed capacities (safe for any <= cap_words*32-bit
    # stream, see _narrowed_caps)
    LIP_CAP, LIS_CAP, LSP_CAP = _narrowed_caps(g, cap_words)
    LIP_ROWS = _rows(LIP_CAP)
    LIS_ROWS = _rows(LIS_CAP)
    LSP_ROWS = _rows(LSP_CAP)
    T_ROWS = _rows(N)
    W_ROWS = _rows(cap_words)
    cap_bits = cap_words * 32

    hc_np = np.asarray(g["has_child"], bool)
    hg_np = np.asarray(g["hg"], bool)
    child0_np = np.asarray(g["child0"], np.int32)
    if compact:
        geo2d = None
        cix_np = (
            np.arange(c, dtype=np.int32)[:, None]
            .repeat(h * w, axis=1).reshape(-1)
        )
        hc_flags = jnp.asarray(
            (hc_np.astype(np.int32) << 27)
            | (hg_np.astype(np.int32) << 28)
            | (cix_np << 29)
        )
    else:
        geo2d = jnp.asarray(_pad2d(child0_np, T_ROWS, np.int32))
        hc_flags = jnp.asarray(
            (hc_np.astype(np.int32) << 16) | (hg_np.astype(np.int32) << 17)
        )

    lip0_np = g["lip_init"].astype(np.int64)
    lis_nodes_np = g["lis_init"].astype(np.int64)
    if compact:
        # entries carry the node's first-child index (LL parity rule
        # baked in here; non-LL appends compute it closed-form)
        lis0 = (
            (child0_np[lis_nodes_np].astype(np.int64) << 1) | 1
        ).astype(np.int32)
    else:
        lis0 = ((lis_nodes_np << 1) | 1).astype(np.int32)
    n_lip0 = int(lip0_np.size)
    n_lis0 = int(lis0.size)
    LI_ROWS = _rows(max(n_lip0, 1))
    LS_ROWS = _rows(max(n_lis0, 1))
    lisi2d = jnp.asarray(_pad2d(lis0, LS_ROWS, np.int32))
    lip0_j = jnp.asarray(lip0_np.astype(np.int32))
    lis_nodes_j = jnp.asarray(lis_nodes_np.astype(np.int32))

    vmem_bytes = machine_vmem_bytes(
        c, h, w, ll_h, ll_w, cap_words, compact=compact, t1_hbm=t1_hbm
    )

    # LIS value-word field offsets (combo vs t1 layouts)
    DF_SH, GF_SH, HC_SH, HG_SH = (
        (17, 22, 27, 28) if compact else (5, 10, 16, 17)
    )
    HW = h * w

    # carry layout (all i32 scalars):
    # 0 pos, 1 n, 2 lip_cnt, 3 lip_w, 4 lip_add, 5 lis_w, 6 lis_t,
    # 7 lsp_cnt, 8 lsp_snap, 9 cursor, 10 dead, 11 done
    def kernel(*refs):
        tsc_ref = tsem_ref = None
        if compact and t1_hbm:
            (t1_ref, lipi_ref, lisi_ref, lisvi_ref,
             sc_ref, words_ref, stat_ref, lip_ref, lis_ref, lisv_ref,
             lsp_ref, tsc_ref, tsem_ref) = refs
            t3s_ref = geo_ref = None
        elif compact:
            (t1_ref, lipi_ref, lisi_ref, lisvi_ref,
             sc_ref, words_ref, stat_ref, lip_ref, lis_ref, lisv_ref,
             lsp_ref) = refs
            t3s_ref = geo_ref = None
        else:
            (t1_ref, t3s_ref, geo_ref, lipi_ref, lisi_ref, lisvi_ref,
             sc_ref, words_ref, stat_ref, lip_ref, lis_ref, lisv_ref,
             lsp_ref) = refs
        max_bits = sc_ref[0]
        max_n = sc_ref[1]
        lanes = jax.lax.broadcasted_iota(_I32, (1, LANES), 1)
        sq0 = jax.lax.broadcasted_iota(_I32, (LANES, LANES), 0)
        sq1 = jax.lax.broadcasted_iota(_I32, (LANES, LANES), 1)
        eye = (sq0 == sq1).astype(jnp.float32)
        tri = (sq0 < sq1).astype(jnp.float32)  # tri[j,c]=1 iff j<c
        colf = sq1.astype(jnp.float32)
        onesrow = jnp.ones((1, LANES), jnp.float32)

        words_ref[:] = jnp.zeros((W_ROWS, LANES), _I32)
        lip_ref[0:LI_ROWS, :] = lipi_ref[:]
        lis_ref[0:LS_ROWS, :] = lisi_ref[:]
        lisv_ref[0:LS_ROWS, :] = lisvi_ref[:]

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
            masked write per target array (vs one RMW per append);
            see pallas_decoder.appendk."""
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
            # exclusive prefix sum over lanes (exact: totals <= 256)
            return jnp.dot(
                v_i32.astype(jnp.float32), tri,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(_I32)

        def isum(v):
            return jnp.sum(v.astype(_I32), dtype=_I32)

        def scatter_rows(refs, w_off, vals_list, keep):
            """Order-preserving append of kept lanes at queue offset
            w_off, for one or more (ref, rows) targets sharing the
            same keep mask and destinations."""
            dest = (w_off % LANES) + prefix(keep.astype(_I32))
            dm = jnp.where(keep, dest, -1).astype(jnp.float32)
            d_t = jax.lax.dot_general(
                jnp.broadcast_to(dm, (LANES, LANES)), eye,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # d_t[a, :] = dest of source lane a (or -1)
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
                        vals, _C16
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
            del refs

        def emit_window(pos, grp, off, wwin):
            """OR per-lane bit groups (already budget-masked) into the
            words buffer; off = nominal bit offsets, pos = block base."""
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
            wv = []
            for j in range(wwin):
                wj = jnp.sum(jnp.where(rel == j, lo, 0), dtype=_I32)
                if j > 0:
                    wj = wj + jnp.sum(
                        jnp.where(rel == (j - 1), spill, 0), dtype=_I32
                    )
                wv.append(wj)
            c0 = base % LANES
            r0 = base // LANES
            m0 = jnp.zeros((1, LANES), _I32)
            m1 = jnp.zeros((1, LANES), _I32)
            for j in range(wwin):
                m0 = m0 | jnp.where(lanes == c0 + j, wv[j], 0)
                m1 = m1 | jnp.where(lanes == c0 + j - LANES, wv[j], 0)
            ra = jnp.clip(r0, 0, W_ROWS - 1)
            row = words_ref[pl.ds(ra, 1), :]
            words_ref[pl.ds(ra, 1), :] = row | m0
            rb = jnp.clip(r0 + 1, 0, W_ROWS - 1)
            row1 = words_ref[pl.ds(rb, 1), :]
            words_ref[pl.ds(rb, 1), :] = row1 | m1

        def seq_emit(pos, grp, kk):
            """Scalar write-through emission of a kk-bit group."""
            w0 = pos >> 5
            sub = pos & 31
            cur = rd(words_ref, w0, cap_words)
            rmw(words_ref, w0, cur | (grp << sub), kk > 0, cap_words)
            spill = jnp.where(
                sub == 0,
                0,
                jax.lax.shift_right_logical(
                    grp, jnp.clip(32 - sub, 0, 31)
                ),
            )
            rmw(words_ref, w0 + 1, spill, (sub + kk) > 32, cap_words)
            return pos + kk

        def lip_phase(s):
            def cond(s):
                return (s[9] * LANES < s[2]) & (s[10] == 0)

            def body(s):
                (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                 lsp_cnt, lsp_snap, r, dead, done) = s
                row = lip_ref[pl.ds(r, 1), :]
                valid = lanes < (lip_cnt - r * LANES)
                mag = row & 0x7FFFFFFF
                nneg = jax.lax.shift_right_logical(row, _C31)
                nsh = jnp.clip(n, 0, 31)
                sig = valid & (
                    jax.lax.shift_right_logical(mag, nsh) != 0
                )
                kk_nom = valid.astype(_I32) + sig.astype(_I32)
                off = pos + prefix(kk_nom)
                ok0 = valid & (off < max_bits)
                b0 = sig & ok0
                ok1 = b0 & ((off + 1) < max_bits)
                grp = b0.astype(_I32) | (
                    jnp.where(ok1, nneg, 0) << 1
                )
                emit_window(pos, grp, off, 10)
                commit = b0 & ok1
                scatter_rows(
                    None, lsp_cnt, [(lsp_ref, LSP_ROWS, row)], commit
                )
                retain = ok0 & ~sig
                scatter_rows(
                    None, lip_w, [(lip_ref, LIP_ROWS, row)], retain
                )
                dead = dead | (
                    isum(valid & ~ok0) + isum(b0 & ~ok1) > 0
                ).astype(_I32)
                pos = pos + isum(ok0) + isum(ok1)
                return (pos, n, lip_cnt, lip_w + isum(retain),
                        lip_add, lis_w, lis_t, lsp_cnt + isum(commit),
                        lsp_snap, r + 1, dead, done)

            return jax.lax.while_loop(cond, body, s)

        def ref_phase(s):
            def cond(s):
                return (s[9] * LANES < s[8]) & (s[10] == 0)

            def body(s):
                (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                 lsp_cnt, lsp_snap, r, dead, done) = s
                row = lsp_ref[pl.ds(r, 1), :]
                valid = lanes < (lsp_snap - r * LANES)
                mag = row & 0x7FFFFFFF
                nsh = jnp.clip(n, 0, 31)
                bit = jax.lax.shift_right_logical(mag, nsh) & 1
                off = pos + prefix(valid.astype(_I32))
                ok0 = valid & (off < max_bits)
                grp = jnp.where(ok0, bit, 0)
                emit_window(pos, grp, off, 6)
                dead = dead | (isum(valid & ~ok0) > 0).astype(_I32)
                pos = pos + isum(ok0)
                return (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                        lsp_cnt, lsp_snap, r + 1, dead, done)

            return jax.lax.while_loop(cond, body, s)

        child_off = (0, 1, w, w + 1)

        def lis_phase(s):
            def cond(s):
                return (s[9] < s[6]) & (s[10] == 0)

            def body(s):
                (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                 lsp_cnt, lsp_snap, lis_i, dead, done) = s
                r = lis_i // LANES
                erow = lis_ref[pl.ds(r, 1), :]
                vrow = lisv_ref[pl.ds(r, 1), :]
                start = lis_i % LANES
                vend = jnp.minimum(lis_t - r * LANES, LANES)
                valid = (lanes >= start) & (lanes < vend)
                is_a = (erow & 1) == 1
                df = ((vrow >> DF_SH) & 31) - 1
                gf = ((vrow >> GF_SH) & 31) - 1
                # select over i32 then compare (Mosaic rejects i8->i1)
                sig0 = jnp.where(is_a, df, gf) >= n
                fired = valid & sig0
                retain = valid & ~sig0
                # optimistic bulk retention (exact while alive; stale
                # only after a budget cut, when queues are never read)
                scatter_rows(
                    None, lis_w,
                    [(lis_ref, LIS_ROWS, erow), (lisv_ref, LIS_ROWS, vrow)],
                    retain,
                )
                lis_w = lis_w + isum(retain)

                def icond(t):
                    return (t[1] < vend) & (t[5] == 0)

                def ibody(t):
                    pos, cur, lip_add, lis_t, lsp_cnt, dead = t
                    cand = jnp.where(
                        fired & (lanes >= cur), lanes, LANES
                    )
                    f = jnp.min(cand)
                    run = jnp.minimum(f, vend) - cur
                    allowed = jnp.clip(max_bits - pos, 0, run)
                    pos = pos + allowed
                    dead = dead | (allowed < run).astype(_I32)
                    do = (f < vend) & (dead == 0)
                    ent = ext(erow, f)
                    entv = ext(vrow, f)
                    node = jnp.clip(ent >> 1, 0, N - 1)
                    a_t = (ent & 1) == 1
                    ok0 = pos < max_bits
                    fire_ok = do & ok0
                    dead = dead | (do & ~ok0).astype(_I32)
                    grp = fire_ok.astype(_I32)
                    kk = fire_ok.astype(_I32)
                    hc = ((entv >> HC_SH) & 1) == 1
                    hgf = ((entv >> HG_SH) & 1) == 1
                    if compact:
                        c0 = ent >> 1  # entries carry child0 directly
                    else:
                        c0 = rd(geo_ref, node, N)
                    run_children = a_t & fire_ok & hc
                    dead_c = jnp.zeros((), jnp.bool_)
                    nsh = jnp.clip(n, 0, 31)
                    lsp_vals, lsp_slots = [], []
                    lip_vals, lip_slots = [], []
                    ccs = []
                    csum = jnp.zeros((), _I32)
                    isumk = jnp.zeros((), _I32)
                    if t1_hbm:
                        # HBM combo table: one single-row DMA per child
                        # (the exact shape spike_hbm_table.py validated
                        # at 2^26-entry tables on this chip), all four
                        # in flight together — dependent-access latency
                        # ~1 us hides across the copies. Real fires
                        # never clip (children of an hc node are
                        # in-bounds); clipped rows only serve inert
                        # lanes.
                        t1_rows = [
                            jnp.clip(c0 + child_off[k], 0, N - 1)
                            // LANES
                            for k in range(4)
                        ]
                        t1_cps = [
                            pltpu.make_async_copy(
                                t1_ref.at[pl.ds(t1_rows[k], 1), :],
                                tsc_ref.at[pl.ds(k, 1), :],
                                tsem_ref.at[k],
                            )
                            for k in range(4)
                        ]
                        for cp in t1_cps:
                            cp.start()
                        for cp in t1_cps:
                            cp.wait()
                    for k in range(4):
                        ch = jnp.clip(c0 + child_off[k], 0, N - 1)
                        if compact:
                            if t1_hbm:
                                cc = ext(
                                    tsc_ref[pl.ds(k, 1), :],
                                    ch % LANES,
                                )
                            else:
                                cc = rd(t1_ref, ch, N)
                            ccs.append((ch, cc))
                            cmag = cc & 0xFFFF
                            cnneg = (
                                jax.lax.shift_right_logical(cc, _C16) & 1
                            )
                            ct3 = (cnneg << 31) | cmag
                        else:
                            ct3 = rd(t3s_ref, ch, N)
                            cmag = ct3 & 0x7FFFFFFF
                            cnneg = jax.lax.shift_right_logical(ct3, _C31)
                        csig = (
                            jax.lax.shift_right_logical(cmag, nsh) != 0
                        )
                        uset = run_children & ~dead_c
                        okt = uset & ((pos + kk) < max_bits)
                        bt = csig & okt
                        dt = uset & ~okt
                        grp = grp | (bt.astype(_I32) << kk)
                        kk = kk + okt.astype(_I32)
                        oks = bt & ((pos + kk) < max_bits) & ~dt
                        dsx = bt & ~oks & ~dt
                        grp = grp | (
                            jnp.where(oks, cnneg, 0) << kk
                        )
                        kk = kk + oks.astype(_I32)
                        commit = bt & oks
                        lsp_vals.append(ct3)
                        lsp_slots.append((csum, commit, k))
                        csum = csum + commit.astype(_I32)
                        insig = okt & ~bt
                        lip_vals.append(ct3)
                        lip_slots.append((isumk, insig, k))
                        isumk = isumk + insig.astype(_I32)
                        dead_c = dead_c | dt | dsx
                    # one 2-row masked write per queue instead of one
                    # RMW per appended child
                    appendk([(lsp_ref, lsp_vals)], lsp_cnt, lsp_slots,
                            LSP_CAP)
                    lsp_cnt = lsp_cnt + csum
                    appendk([(lip_ref, lip_vals)], lip_w + lip_add,
                            lip_slots, LIP_CAP)
                    lip_add = lip_add + isumk
                    pos = seq_emit(pos, grp, kk)
                    reapp = a_t & fire_ok & hgf & ~dead_c
                    rmw(lis_ref, lis_t, node << 1, reapp, LIS_CAP)
                    rmw(lisv_ref, lis_t, entv, reapp, LIS_CAP)
                    lis_t = lis_t + reapp.astype(_I32)
                    b_fired = (~a_t) & fire_ok & hc
                    bent, bval = [], []
                    if compact:
                        # child's own c0 is closed-form (dyadic rule —
                        # children of any LIS node are non-LL); the
                        # combo words were already gathered above
                        cix = jax.lax.shift_right_logical(entv, _C29) & 7
                        cbase = cix * HW
                        for ch, cc in ccs:
                            bent.append((((ch << 1) - cbase) << 1) | 1)
                            bval.append(cc)
                    else:
                        for k in range(4):
                            ch = jnp.clip(c0 + child_off[k], 0, N - 1)
                            bent.append((ch << 1) | 1)
                            bval.append(rd(t1_ref, ch, N))
                    appendk(
                        [(lis_ref, bent), (lisv_ref, bval)],
                        lis_t,
                        [(jnp.asarray(k, _I32), b_fired, k)
                         for k in range(4)],
                        LIS_CAP,
                    )
                    lis_t = lis_t + jnp.where(b_fired, 4, 0)
                    dead = dead | dead_c.astype(_I32)
                    return (pos, f + 1, lip_add, lis_t, lsp_cnt, dead)

                t = jax.lax.while_loop(
                    icond, ibody,
                    (pos, start, lip_add, lis_t, lsp_cnt, dead),
                )
                pos, _, lip_add, lis_t, lsp_cnt, dead = t
                return (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                        lsp_cnt, lsp_snap, r * LANES + vend, dead,
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
            (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
             lsp_cnt, lsp_snap, r, dead, done) = s
            done = done | (n == 0).astype(_I32)
            z = jnp.zeros((), _I32)
            return (
                pos, jnp.maximum(n - 1, 0),
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
        stat_ref[0, 0] = end[0]
        stat_ref[0, 1] = end[10]

    params = {}
    if not interpret:
        # t1_hbm frees the N-table from VMEM; its remaining state can
        # legitimately use more of the 128 MB chip VMEM than the
        # all-resident machines' 110 MB ceiling
        cap_mb = 121 if t1_hbm else 110
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(vmem_bytes + (8 << 20), 24 << 20), cap_mb << 20
            )
        )

    n_tables = 1 if compact else 3
    t1_space = (
        pltpu.MemorySpace.HBM if t1_hbm else pltpu.VMEM
    )
    call = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((W_ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
        in_specs=[
            # compact: one combo table (HBM-resident in t1_hbm mode);
            # else T1 levels+flags, T3s sign|mag, child0
            pl.BlockSpec(memory_space=t1_space),
            *([pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_tables - 1)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lip init payload
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lis init entries
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lis init values
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((LIP_ROWS, LANES), jnp.int32),
            pltpu.VMEM((LIS_ROWS, LANES), jnp.int32),
            pltpu.VMEM((LIS_ROWS, LANES), jnp.int32),
            pltpu.VMEM((LSP_ROWS, LANES), jnp.int32),
            *([pltpu.VMEM((4, LANES), jnp.int32),
               pltpu.SemaphoreType.DMA((4,))] if t1_hbm else []),
        ],
        interpret=interpret,
        **params,
    )

    @jax.jit
    def fn(arr, max_n, max_bits):
        arr = jnp.asarray(arr, jnp.int32)
        m, d, gm = significance_maps(arr, ll_h, ll_w)
        df = d.reshape(-1).astype(_I32) + 1
        gf = gm.reshape(-1).astype(_I32) + 1
        flat = arr.reshape(-1)
        sgn = (flat >= 0).astype(_I32)
        t3s = (sgn << 31) | jnp.abs(flat)
        if compact:
            t1 = (
                jnp.abs(flat) | (sgn << 16) | (df << 17) | (gf << 22)
                | hc_flags
            )
        else:
            mf = m.reshape(-1).astype(_I32) + 1
            t1 = mf | (df << 5) | (gf << 10) | (sgn << 15) | hc_flags
        pad = T_ROWS * LANES - N
        t1p = jnp.pad(t1, (0, pad)).reshape(T_ROWS, LANES)
        lip_pay = t3s[lip0_j]
        lip_pay = jnp.pad(
            lip_pay, (0, LI_ROWS * LANES - n_lip0)
        ).reshape(LI_ROWS, LANES)
        lisv0 = t1[lis_nodes_j]
        lisv0 = jnp.pad(
            lisv0, (0, LS_ROWS * LANES - n_lis0)
        ).reshape(LS_ROWS, LANES)
        mb = jnp.minimum(
            jnp.asarray(max_bits, _I32), jnp.asarray(cap_bits, _I32)
        )
        sc = jnp.stack([mb, jnp.asarray(max_n, _I32)])
        if compact:
            tables = (t1p,)
        else:
            t3sp = jnp.pad(t3s, (0, pad)).reshape(T_ROWS, LANES)
            tables = (t1p, t3sp, geo2d)
        words2d, stat = call(
            *tables, lip_pay, lisi2d, lisv0, sc
        )
        words = jax.lax.bitcast_convert_type(
            words2d.reshape(-1)[:cap_words], jnp.uint32
        )
        total = stat[0, 0]
        overflow = (stat[0, 1] != 0) & (
            jnp.asarray(max_bits, _I32) > jnp.asarray(cap_bits, _I32)
        ) & (total >= cap_bits - 32)
        return words, total, overflow

    return fn


def _cap_words_for(c, h, w, max_bits) -> int:
    cap_bits = min(
        int(max_bits), c * h * w * _CAP_BITS_PER_CELL + 1024
    )
    return max((cap_bits + 31) // 32, 1)


def _narrowed_caps(g, cap_words: int):
    """Budget-narrowed queue capacities — provably safe for any stream
    of <= cap_words*32 bits, because every queue append is charged to
    an emitted bit:

      * LIP insert <-> one emitted child sig bit (``insig`` requires
        ``okt``), so lip indices <= n_lip0 + bits.
      * LSP commit <-> two emitted bits (sig + sign), so <= bits/2.
      * LIS appends: an A-reappend needs hgf (=> hc) and its fire emits
        >= 5 bits (D test + 4 child sig bits, all pre-deadline by
        ``~dead_c``); every type-B entry comes from exactly one earlier
        reappend and its fire (1 bit) appends 4 type-A children. Per
        reappend: >= 5+1 bits against 1+4 appends => appends <= bits.

    Writes past a budget cut never happen (every append mask requires
    its bit to be inside max_bits), and a dead machine never reads its
    queues, so narrowing preserves bit-exactness while shrinking the
    dominant VMEM arrays by ~3x at 1 bpp budgets.
    """
    return narrowed_caps(
        QueueBounds(
            n_lip0=int(g["lip_init"].size), n_lis0=int(g["lis_init"].size),
            ent_bound=int(g["ent_bound"]), lis_bound=int(g["lis_bound"]),
            dup=False,
        ),
        cap_words,
    )


def interleaved_vmem_bytes(
    B: int, c: int, h: int, w: int, ll_h: int, ll_w: int, cap_words: int,
    compact: bool = False, t1_hbm: bool = False,
) -> int:
    """Exact VMEM bytes the B-chain interleaved machine requests
    (per-chain tables/queues with budget-narrowed caps; the child0
    geometry table and LIS init entries are shared across chains).
    ``compact`` is the one-combo-table variant (max_n <= 15): one
    N-sized table per chain instead of two, and no shared geometry
    table.  ``t1_hbm`` (compact only) keeps the stacked combo tables
    HBM-resident with per-fire single-row DMAs into a 4-rows-per-chain
    scratch (round 5) — 2048^2/4096^2-class BATCHED admission.
    Closed-form, like ``machine_vmem_bytes``."""
    qb = queue_bounds(c, h, w, ll_h, ll_w)
    N = c * h * w
    lip_cap, lis_cap, lsp_cap = narrowed_caps(qb, cap_words)
    li_rows = _rows(max(qb.n_lip0, 1))
    ls_rows = _rows(max(qb.n_lis0, 1))
    n_tables = 1 if compact else 2
    table_rows = 4 if t1_hbm else n_tables * _rows(N)
    per_chain = (
        table_rows + _rows(lip_cap) + 2 * _rows(lis_cap)
        + _rows(lsp_cap) + _rows(cap_words) + li_rows + ls_rows
    )
    shared = (0 if compact else _rows(N)) + ls_rows + 256
    return 4 * LANES * (B * per_chain + shared)


def interleaved_fits(
    B: int, c: int, h: int, w: int, ll_h: int, ll_w: int, cap_words: int,
    compact: bool = False, t1_hbm: bool = False,
) -> bool:
    # the ILV machines keep the 2^24 packed-entry guard EXCEPT the
    # compact t1_hbm variant, which shares the hybrid family's 2^28
    # entry format (hardware-validated past 2^24, BASELINE.md round 5)
    if c * h * w >= (1 << 28 if (compact and t1_hbm) else 1 << 24):
        return False
    if compact and c > 8:
        return False
    if t1_hbm and not compact:
        return False
    return (
        interleaved_vmem_bytes(B, c, h, w, ll_h, ll_w, cap_words,
                               compact, t1_hbm)
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
    compact: bool = False,
    t1_hbm: bool = False,
):
    """B-chain INTERLEAVED hybrid emission machine: ONE kernel steps B
    independent machines per loop iteration (per-chain scalar carries +
    per-chain state segments stacked on the sublane axis), so the B
    dependent chains overlap on the core instead of serializing like
    ``lax.map`` (tools/spike_pallas_ilp.py measured 1.41x/1.56x/1.71x
    overlap at B=2/4/8 on v5e hardware).

    fn(arrs(B,c,h,w) i32, max_ns(B,), max_bits(B,)) ->
    (words u32[B,cap_words], totals i32[B], overflows bool[B]).

    Semantics per chain are byte-identical to ``_hybrid_fn`` (and thus
    /root/reference/src/encoder_decoder.rs:155-303): the lockstep phase
    loops run until every chain has finished the phase, with finished
    chains naturally inert (their lane masks are empty, so emissions OR
    zeros and queue writes mask out). Queue capacities are
    budget-narrowed (see ``_narrowed_caps``) so B=8 fits VMEM at the
    512^2 headline geometry; the child0 table and initial LIS entries
    are geometry-only and shared across chains.

    ``compact=True`` is the COMPACT layout (see ``_hybrid_fn``; requires
    ``max_n <= 15`` on every chain and ``c <= 8``): one combo word per
    cell and first-child LIS entries, so the fire body issues 4 one-hot
    gathers instead of 9.  The interleaved machine is VPU-ISSUE-bound
    (the ILP spike: chains overlap only ~1.7x at B=8), so cutting the
    fire body's issue count raises both per-chain speed and cross-chain
    overlap, and the saved N-table per chain (plus the dropped shared
    geometry table) buys VMEM headroom for larger B.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if c * h * w >= (1 << 28 if (compact and t1_hbm) else 1 << 24):
        raise ValueError("geometry too large for packed queue entries")
    if compact and c > 8:
        raise ValueError("compact machine packs cix in 3 bits (c <= 8)")
    if t1_hbm and not compact:
        raise ValueError("t1_hbm is a compact-machine mode")
    g = _dec_geom(c, h, w, ll_h, ll_w)
    N = c * h * w
    LIP_CAP, LIS_CAP, LSP_CAP = _narrowed_caps(g, cap_words)
    LIP_ROWS = _rows(LIP_CAP)
    LIS_ROWS = _rows(LIS_CAP)
    LSP_ROWS = _rows(LSP_CAP)
    T_ROWS = _rows(N)
    W_ROWS = _rows(cap_words)
    cap_bits = cap_words * 32

    hc_np = np.asarray(g["has_child"], bool)
    hg_np = np.asarray(g["hg"], bool)
    child0_np = np.asarray(g["child0"], np.int32)
    if compact:
        geo2d = None
        cix_np = (
            np.arange(c, dtype=np.int32)[:, None]
            .repeat(h * w, axis=1).reshape(-1)
        )
        hc_flags = jnp.asarray(
            (hc_np.astype(np.int32) << 27)
            | (hg_np.astype(np.int32) << 28)
            | (cix_np << 29)
        )
    else:
        geo2d = jnp.asarray(_pad2d(child0_np, T_ROWS, np.int32))
        hc_flags = jnp.asarray(
            (hc_np.astype(np.int32) << 16) | (hg_np.astype(np.int32) << 17)
        )

    lip0_np = g["lip_init"].astype(np.int64)
    lis_nodes_np = g["lis_init"].astype(np.int64)
    if compact:
        lis0 = (
            (child0_np[lis_nodes_np].astype(np.int64) << 1) | 1
        ).astype(np.int32)
    else:
        lis0 = ((lis_nodes_np << 1) | 1).astype(np.int32)
    n_lip0 = int(lip0_np.size)
    n_lis0 = int(lis0.size)
    LI_ROWS = _rows(max(n_lip0, 1))
    LS_ROWS = _rows(max(n_lis0, 1))
    lisi2d = jnp.asarray(_pad2d(lis0, LS_ROWS, np.int32))
    lip0_j = jnp.asarray(lip0_np.astype(np.int32))
    lis_nodes_j = jnp.asarray(lis_nodes_np.astype(np.int32))

    vmem_bytes = interleaved_vmem_bytes(
        B, c, h, w, ll_h, ll_w, cap_words, compact=compact,
        t1_hbm=t1_hbm,
    )

    # LIS value-word field offsets (combo vs t1 layouts)
    DF_SH, GF_SH, HC_SH, HG_SH = (
        (17, 22, 27, 28) if compact else (5, 10, 16, 17)
    )
    HW = h * w

    # per-chain carry layout (i32 scalars), as in _hybrid_fn:
    # 0 pos, 1 n, 2 lip_cnt, 3 lip_w, 4 lip_add, 5 lis_w, 6 lis_t,
    # 7 lsp_cnt, 8 lsp_snap, 9 cursor, 10 dead, 11 done
    def kernel(*refs):
        tsc_ref = tsem_ref = None
        if compact and t1_hbm:
            (t1_ref, lipi_ref, lisi_ref, lisvi_ref,
             sc_ref, words_ref, stat_ref, lip_ref, lis_ref, lisv_ref,
             lsp_ref, tsc_ref, tsem_ref) = refs
            t3s_ref = geo_ref = None
        elif compact:
            (t1_ref, lipi_ref, lisi_ref, lisvi_ref,
             sc_ref, words_ref, stat_ref, lip_ref, lis_ref, lisv_ref,
             lsp_ref) = refs
            t3s_ref = geo_ref = None
        else:
            (t1_ref, t3s_ref, geo_ref, lipi_ref, lisi_ref, lisvi_ref,
             sc_ref, words_ref, stat_ref, lip_ref, lis_ref, lisv_ref,
             lsp_ref) = refs
        lanes = jax.lax.broadcasted_iota(_I32, (1, LANES), 1)
        sq0 = jax.lax.broadcasted_iota(_I32, (LANES, LANES), 0)
        sq1 = jax.lax.broadcasted_iota(_I32, (LANES, LANES), 1)
        eye = (sq0 == sq1).astype(jnp.float32)
        tri = (sq0 < sq1).astype(jnp.float32)
        colf = sq1.astype(jnp.float32)
        onesrow = jnp.ones((1, LANES), jnp.float32)

        words_ref[:] = jnp.zeros((B * W_ROWS, LANES), _I32)
        for b in range(B):
            lip_ref[pl.ds(b * LIP_ROWS, LI_ROWS), :] = (
                lipi_ref[pl.ds(b * LI_ROWS, LI_ROWS), :]
            )
            lis_ref[pl.ds(b * LIS_ROWS, LS_ROWS), :] = lisi_ref[:]
            lisv_ref[pl.ds(b * LIS_ROWS, LS_ROWS), :] = (
                lisvi_ref[pl.ds(b * LS_ROWS, LS_ROWS), :]
            )

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

        def appendk(targets, base_off, slots, cap, seg_rows):
            """As _hybrid_fn.appendk, with a static per-chain segment
            base on every target ref. base_off is the in-chain index."""
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
            del seg_rows

        def prefix(v_i32):
            return jnp.dot(
                v_i32.astype(jnp.float32), tri,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(_I32)

        def isum(v):
            return jnp.sum(v.astype(_I32), dtype=_I32)

        def scatter_rows(w_off, vals_list, keep):
            """Order-preserving append of kept lanes; each target is
            (ref, seg_base_row, rows_cap, vals)."""
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
                        vals, _C16
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

        def emit_window(wbase, pos, grp, off, wwin):
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
            wv = []
            for j in range(wwin):
                wj = jnp.sum(jnp.where(rel == j, lo, 0), dtype=_I32)
                if j > 0:
                    wj = wj + jnp.sum(
                        jnp.where(rel == (j - 1), spill, 0), dtype=_I32
                    )
                wv.append(wj)
            c0 = base % LANES
            r0 = base // LANES
            m0 = jnp.zeros((1, LANES), _I32)
            m1 = jnp.zeros((1, LANES), _I32)
            for j in range(wwin):
                m0 = m0 | jnp.where(lanes == c0 + j, wv[j], 0)
                m1 = m1 | jnp.where(lanes == c0 + j - LANES, wv[j], 0)
            ra = wbase + jnp.clip(r0, 0, W_ROWS - 1)
            row = words_ref[pl.ds(ra, 1), :]
            words_ref[pl.ds(ra, 1), :] = row | m0
            rb = wbase + jnp.clip(r0 + 1, 0, W_ROWS - 1)
            row1 = words_ref[pl.ds(rb, 1), :]
            words_ref[pl.ds(rb, 1), :] = row1 | m1

        def seq_emit(wbase, pos, grp, kk):
            w0 = pos >> 5
            sub = pos & 31
            cur = rd(words_ref, wbase, w0, cap_words)
            rmw(words_ref, wbase, w0, cur | (grp << sub), kk > 0,
                cap_words)
            spill = jnp.where(
                sub == 0,
                0,
                jax.lax.shift_right_logical(
                    grp, jnp.clip(32 - sub, 0, 31)
                ),
            )
            rmw(words_ref, wbase, w0 + 1, spill, (sub + kk) > 32,
                cap_words)
            return pos + kk

        def lip_body_chain(b, s):
            (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
             lsp_cnt, lsp_snap, r, dead, done) = s
            act = (r * LANES < lip_cnt) & (dead == 0) & (done == 0)
            max_bits = sc_ref[2 * b]
            lbase = b * LIP_ROWS
            rr = jnp.clip(r, 0, LIP_ROWS - 1)
            row = lip_ref[pl.ds(lbase + rr, 1), :]
            valid = act & (lanes < (lip_cnt - r * LANES))
            mag = row & 0x7FFFFFFF
            nneg = jax.lax.shift_right_logical(row, _C31)
            nsh = jnp.clip(n, 0, 31)
            sig = valid & (
                jax.lax.shift_right_logical(mag, nsh) != 0
            )
            kk_nom = valid.astype(_I32) + sig.astype(_I32)
            off = pos + prefix(kk_nom)
            ok0 = valid & (off < max_bits)
            b0 = sig & ok0
            ok1 = b0 & ((off + 1) < max_bits)
            grp = b0.astype(_I32) | (jnp.where(ok1, nneg, 0) << 1)
            emit_window(b * W_ROWS, pos, grp, off, 10)
            commit = b0 & ok1
            scatter_rows(
                lsp_cnt,
                [(lsp_ref, b * LSP_ROWS, LSP_ROWS, row)], commit,
            )
            retain = ok0 & ~sig
            scatter_rows(
                lip_w,
                [(lip_ref, lbase, LIP_ROWS, row)], retain,
            )
            dead = dead | (
                isum(valid & ~ok0) + isum(b0 & ~ok1) > 0
            ).astype(_I32)
            pos = pos + isum(ok0) + isum(ok1)
            r = jnp.where(act, r + 1, r)
            return (pos, n, lip_cnt, lip_w + isum(retain),
                    lip_add, lis_w, lis_t, lsp_cnt + isum(commit),
                    lsp_snap, r, dead, done)

        def ref_body_chain(b, s):
            (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
             lsp_cnt, lsp_snap, r, dead, done) = s
            act = (r * LANES < lsp_snap) & (dead == 0) & (done == 0)
            max_bits = sc_ref[2 * b]
            rr = jnp.clip(r, 0, LSP_ROWS - 1)
            row = lsp_ref[pl.ds(b * LSP_ROWS + rr, 1), :]
            valid = act & (lanes < (lsp_snap - r * LANES))
            mag = row & 0x7FFFFFFF
            nsh = jnp.clip(n, 0, 31)
            bit = jax.lax.shift_right_logical(mag, nsh) & 1
            off = pos + prefix(valid.astype(_I32))
            ok0 = valid & (off < max_bits)
            grp = jnp.where(ok0, bit, 0)
            emit_window(b * W_ROWS, pos, grp, off, 6)
            dead = dead | (isum(valid & ~ok0) > 0).astype(_I32)
            pos = pos + isum(ok0)
            r = jnp.where(act, r + 1, r)
            return (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                    lsp_cnt, lsp_snap, r, dead, done)

        child_off = (0, 1, w, w + 1)

        def lis_row_chain(b, s):
            """One LIS row for chain b: classify, bulk-retain, then the
            per-fire scalar loop runs inside the shared inner lockstep
            loop (built by the caller); this returns the row context."""
            (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
             lsp_cnt, lsp_snap, lis_i, dead, done) = s
            act = (lis_i < lis_t) & (dead == 0) & (done == 0)
            lbase = b * LIS_ROWS
            r = jnp.clip(lis_i // LANES, 0, LIS_ROWS - 1)
            erow = lis_ref[pl.ds(lbase + r, 1), :]
            vrow = lisv_ref[pl.ds(lbase + r, 1), :]
            start = lis_i % LANES
            vend = jnp.where(
                act, jnp.minimum(lis_t - r * LANES, LANES), start
            )
            valid = (lanes >= start) & (lanes < vend)
            is_a = (erow & 1) == 1
            df = ((vrow >> DF_SH) & 31) - 1
            gf = ((vrow >> GF_SH) & 31) - 1
            sig0 = jnp.where(is_a, df, gf) >= n
            fired = valid & sig0
            retain = valid & ~sig0
            scatter_rows(
                lis_w,
                [(lis_ref, lbase, LIS_ROWS, erow),
                 (lisv_ref, lbase, LIS_ROWS, vrow)],
                retain,
            )
            lis_w = lis_w + isum(retain)
            s = (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                 lsp_cnt, lsp_snap, lis_i, dead, done)
            return s, (erow, vrow, fired, vend, r)

        def lis_fire_prefetch(b, s, ctx, cur):
            """Phase 1 of a t1_hbm fire step: from chain b's OWN
            (state, row ctx, cursor) — exactly the scalars
            lis_fire_chain recomputes — derive the fired entry's child
            rows and START its 4 single-row DMAs. Running phase 1 for
            ALL chains before any phase 2 puts 4*B copies in flight
            (spike_hbm_table.py hbm_fire: 188 ns/fire aggregate at
            B=16)."""
            erow, _vrow, fired, _vend, _r = ctx
            cur_clip = cur
            cand = jnp.where(fired & (lanes >= cur_clip), lanes, LANES)
            f = jnp.min(cand)
            ent = ext(erow, f)
            c0 = ent >> 1  # compact entries carry child0 directly
            tbase = b * T_ROWS
            cps = []
            for k in range(4):
                ch = jnp.clip(c0 + child_off[k], 0, N - 1)
                cp = pltpu.make_async_copy(
                    t1_ref.at[pl.ds(tbase + ch // LANES, 1), :],
                    tsc_ref.at[pl.ds(4 * b + k, 1), :],
                    tsem_ref.at[4 * b + k],
                )
                cp.start()
                cps.append(cp)
            return cps

        def lis_fire_chain(b, s, ctx, cur, cps=None):
            """One fired-entry step for chain b (the _hybrid_fn ibody),
            returns updated (s, cur)."""
            (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
             lsp_cnt, lsp_snap, lis_i, dead, done) = s
            erow, vrow, fired, vend, _r = ctx
            max_bits = sc_ref[2 * b]
            inner_act = (cur < vend) & (dead == 0) & (done == 0)
            cand = jnp.where(fired & (lanes >= cur), lanes, LANES)
            f = jnp.min(cand)
            run = jnp.where(inner_act, jnp.minimum(f, vend) - cur, 0)
            allowed = jnp.clip(max_bits - pos, 0, run)
            pos = pos + allowed
            dead = dead | (allowed < run).astype(_I32)
            do = inner_act & (f < vend) & (dead == 0)
            ent = ext(erow, f)
            entv = ext(vrow, f)
            node = jnp.clip(ent >> 1, 0, N - 1)
            a_t = (ent & 1) == 1
            ok0 = pos < max_bits
            fire_ok = do & ok0
            dead = dead | (do & ~ok0).astype(_I32)
            grp = fire_ok.astype(_I32)
            kk = fire_ok.astype(_I32)
            hc = ((entv >> HC_SH) & 1) == 1
            hgf = ((entv >> HG_SH) & 1) == 1
            if compact:
                c0 = ent >> 1  # entries carry child0 directly
            else:
                c0 = rd(geo_ref, 0, node, N)
            run_children = a_t & fire_ok & hc
            dead_c = jnp.zeros((), jnp.bool_)
            nsh = jnp.clip(n, 0, 31)
            lsp_vals, lsp_slots = [], []
            lip_vals, lip_slots = [], []
            ccs = []
            csum = jnp.zeros((), _I32)
            isumk = jnp.zeros((), _I32)
            tbase = b * T_ROWS
            if t1_hbm:
                # phase 2: the child rows were DMA'd by
                # lis_fire_prefetch (identical f/c0 derivation)
                for cp in cps:
                    cp.wait()
            for k in range(4):
                ch = jnp.clip(c0 + child_off[k], 0, N - 1)
                if compact:
                    if t1_hbm:
                        cc = ext(
                            tsc_ref[pl.ds(4 * b + k, 1), :],
                            ch % LANES,
                        )
                    else:
                        cc = rd(t1_ref, tbase, ch, N)
                    ccs.append((ch, cc))
                    cmag = cc & 0xFFFF
                    cnneg = (
                        jax.lax.shift_right_logical(cc, _C16) & 1
                    )
                    ct3 = (cnneg << 31) | cmag
                else:
                    ct3 = rd(t3s_ref, tbase, ch, N)
                    cmag = ct3 & 0x7FFFFFFF
                    cnneg = jax.lax.shift_right_logical(ct3, _C31)
                csig = (
                    jax.lax.shift_right_logical(cmag, nsh) != 0
                )
                uset = run_children & ~dead_c
                okt = uset & ((pos + kk) < max_bits)
                bt = csig & okt
                dt = uset & ~okt
                grp = grp | (bt.astype(_I32) << kk)
                kk = kk + okt.astype(_I32)
                oks = bt & ((pos + kk) < max_bits) & ~dt
                dsx = bt & ~oks & ~dt
                grp = grp | (jnp.where(oks, cnneg, 0) << kk)
                kk = kk + oks.astype(_I32)
                commit = bt & oks
                lsp_vals.append(ct3)
                lsp_slots.append((csum, commit, k))
                csum = csum + commit.astype(_I32)
                insig = okt & ~bt
                lip_vals.append(ct3)
                lip_slots.append((isumk, insig, k))
                isumk = isumk + insig.astype(_I32)
                dead_c = dead_c | dt | dsx
            appendk([(lsp_ref, b * LSP_ROWS, lsp_vals)], lsp_cnt,
                    lsp_slots, LSP_CAP, LSP_ROWS)
            lsp_cnt = lsp_cnt + csum
            appendk([(lip_ref, b * LIP_ROWS, lip_vals)],
                    lip_w + lip_add, lip_slots, LIP_CAP, LIP_ROWS)
            lip_add = lip_add + isumk
            pos = seq_emit(b * W_ROWS, pos, grp, kk)
            lbase = b * LIS_ROWS
            reapp = a_t & fire_ok & hgf & ~dead_c
            rmw(lis_ref, lbase, lis_t, node << 1, reapp, LIS_CAP)
            rmw(lisv_ref, lbase, lis_t, entv, reapp, LIS_CAP)
            lis_t = lis_t + reapp.astype(_I32)
            b_fired = (~a_t) & fire_ok & hc
            bent, bval = [], []
            if compact:
                # child's own c0 is closed-form (dyadic rule — children
                # of any LIS node are non-LL); the combo words were
                # already gathered above
                cix = jax.lax.shift_right_logical(entv, _C29) & 7
                cbase = cix * HW
                for ch, cc in ccs:
                    bent.append((((ch << 1) - cbase) << 1) | 1)
                    bval.append(cc)
            else:
                for k in range(4):
                    ch = jnp.clip(c0 + child_off[k], 0, N - 1)
                    bent.append((ch << 1) | 1)
                    bval.append(rd(t1_ref, tbase, ch, N))
            appendk(
                [(lis_ref, lbase, bent), (lisv_ref, lbase, bval)],
                lis_t,
                [(jnp.asarray(k, _I32), b_fired, k) for k in range(4)],
                LIS_CAP, LIS_ROWS,
            )
            lis_t = lis_t + jnp.where(b_fired, 4, 0)
            dead = dead | dead_c.astype(_I32)
            cur = jnp.where(inner_act, f + 1, cur)
            s = (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                 lsp_cnt, lsp_snap, lis_i, dead, done)
            return s, cur

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

        def lis_phase(states):
            def cond(states):
                return any_true(tuple(
                    (s[9] < s[6]) & (s[10] == 0) & (s[11] == 0)
                    for s in states
                ))

            def body(states):
                rows = []
                states = list(states)
                for b in range(B):
                    s, ctx = lis_row_chain(b, states[b])
                    states[b] = s
                    rows.append(ctx)

                def icond(t):
                    sts, curs = t
                    return any_true(tuple(
                        (curs[b] < rows[b][3]) & (sts[b][10] == 0)
                        & (sts[b][11] == 0)
                        for b in range(B)
                    ))

                def ibody(t):
                    sts, curs = t
                    sts = list(sts)
                    curs = list(curs)
                    cps_all = [None] * B
                    if t1_hbm:
                        # start ALL chains' child-row DMAs before any
                        # chain's fire body runs: 4*B copies in flight
                        for b in range(B):
                            cps_all[b] = lis_fire_prefetch(
                                b, sts[b], rows[b], curs[b]
                            )
                    for b in range(B):
                        sts[b], curs[b] = lis_fire_chain(
                            b, sts[b], rows[b], curs[b], cps_all[b]
                        )
                    return tuple(sts), tuple(curs)

                starts = tuple(
                    states[b][9] % LANES for b in range(B)
                )
                sts, _curs = jax.lax.while_loop(
                    icond, ibody, (tuple(states), starts)
                )
                out = []
                for b in range(B):
                    s = sts[b]
                    act = (s[10] == 0) & (s[11] == 0)
                    # advance the worklist cursor past this row
                    new_i = jnp.where(
                        act & (s[9] < s[6]),
                        jnp.clip(s[9] // LANES, 0, LIS_ROWS - 1)
                        * LANES + rows[b][3],
                        s[9],
                    )
                    out.append(tuple(
                        new_i if i == 9 else s[i] for i in range(12)
                    ))
                return tuple(out)

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
                (pos, n, lip_cnt, lip_w, lip_add, lis_w, lis_t,
                 lsp_cnt, lsp_snap, r, dead, done) = s
                act = (dead == 0) & (done == 0)
                done = done | (act & (n == 0)).astype(_I32)
                z = jnp.zeros((), _I32)
                out.append((
                    pos,
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
            stat_ref[0, 2 * b] = end[b][0]
            stat_ref[0, 2 * b + 1] = end[b][10]

    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(vmem_bytes + (8 << 20), 24 << 20), 127 << 20
            )
        )

    n_tables = 1 if compact else 3  # stacked T1 [+ stacked T3s + geo]
    call = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B * W_ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 2 * B), jnp.int32),
        ],
        in_specs=[
            # stacked T1 (HBM-resident in t1_hbm mode)
            pl.BlockSpec(memory_space=(
                pltpu.MemorySpace.HBM if t1_hbm else pltpu.VMEM
            )),
            *([pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_tables - 1)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lip init stacked
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lis init (shared)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lis values stacked
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars (2B,)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B * LIP_ROWS, LANES), jnp.int32),
            pltpu.VMEM((B * LIS_ROWS, LANES), jnp.int32),
            pltpu.VMEM((B * LIS_ROWS, LANES), jnp.int32),
            pltpu.VMEM((B * LSP_ROWS, LANES), jnp.int32),
            *([pltpu.VMEM((4 * B, LANES), jnp.int32),
               pltpu.SemaphoreType.DMA((4 * B,))] if t1_hbm else []),
        ],
        interpret=interpret,
        **params,
    )

    @jax.jit
    def fn(arrs, max_ns, max_bits):
        arrs = jnp.asarray(arrs, jnp.int32)
        m, d, gm = significance_maps(arrs, ll_h, ll_w)
        df = d.reshape(B, -1).astype(_I32) + 1
        gf = gm.reshape(B, -1).astype(_I32) + 1
        flat = arrs.reshape(B, -1)
        sgn = (flat >= 0).astype(_I32)
        if compact:
            t1 = (
                jnp.abs(flat) | (sgn << 16) | (df << 17) | (gf << 22)
                | hc_flags[None]
            )
        else:
            mf = m.reshape(B, -1).astype(_I32) + 1
            t1 = (
                mf | (df << 5) | (gf << 10) | (sgn << 15)
                | hc_flags[None]
            )
        t3s = (sgn << 31) | jnp.abs(flat)
        pad = T_ROWS * LANES - N
        t1p = jnp.pad(t1, ((0, 0), (0, pad))).reshape(
            B * T_ROWS, LANES
        )
        lip_pay = t3s[:, lip0_j]
        lip_pay = jnp.pad(
            lip_pay, ((0, 0), (0, LI_ROWS * LANES - n_lip0))
        ).reshape(B * LI_ROWS, LANES)
        lisv0 = t1[:, lis_nodes_j]
        lisv0 = jnp.pad(
            lisv0, ((0, 0), (0, LS_ROWS * LANES - n_lis0))
        ).reshape(B * LS_ROWS, LANES)
        mb = jnp.minimum(
            jnp.asarray(max_bits, _I32), jnp.asarray(cap_bits, _I32)
        )
        sc = jnp.stack(
            [mb, jnp.asarray(max_ns, _I32)], axis=1
        ).reshape(2 * B)
        if compact:
            tables = (t1p,)
        else:
            t3sp = jnp.pad(t3s, ((0, 0), (0, pad))).reshape(
                B * T_ROWS, LANES
            )
            tables = (t1p, t3sp, geo2d)
        words2d, stat = call(
            *tables, lip_pay, lisi2d, lisv0, sc
        )
        words = jax.lax.bitcast_convert_type(
            words2d.reshape(B, W_ROWS * LANES)[:, :cap_words],
            jnp.uint32,
        )
        totals = stat[0, 0::2]
        overflows = (stat[0, 1::2] != 0) & (
            jnp.asarray(max_bits, _I32) > jnp.asarray(cap_bits, _I32)
        ) & (totals >= cap_bits - 32)
        return words, totals, overflows

    return fn


def pallas_encode_batch_fn(
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    interpret: bool = False,
    machine: str | None = None,
):
    """fn(arrs[B], max_ns[B], max_bits[B]) -> (words[B], totals[B],
    overflows[B]) — ONE program, a lax.map loop of the bit machine
    (vmap cannot grid-batch the SMEM operands; the machine is
    latency-bound either way, so the loop costs only the per-element
    input slice)."""
    if machine is None:
        machine = os.environ.get("SPIHT_TPU_PALLAS_ENC_MACHINE", "hybrid")
    return _batch_fn_cached(c, h, w, ll_h, ll_w, cap_words, interpret,
                            machine)


@lru_cache(maxsize=None)
def _batch_fn_cached(c, h, w, ll_h, ll_w, cap_words, interpret, machine):
    fn = pallas_encode_fn(c, h, w, ll_h, ll_w, cap_words, interpret,
                          machine)

    @jax.jit
    def bfn(arrs, max_ns, max_bits):
        return jax.lax.map(
            lambda t: fn.__wrapped__(t[0], t[1], t[2]),
            (arrs, max_ns, max_bits),
        )

    return bfn


def _ilv_chunk_b() -> int:
    try:
        return max(int(os.environ.get("SPIHT_TPU_PALLAS_ILV_B", "16")), 1)
    except ValueError:
        return 16


def pallas_encode_batch(
    arrs: np.ndarray, ll_h: int, ll_w: int, max_bits,
    interpret: bool = False, machine: str | None = None,
):
    """Batched (bytes, max_n) list.

    Routes to the B-chain INTERLEAVED machine (one kernel stepping all
    chains per iteration — 1.4-1.7x per-chip over serialization,
    BASELINE.md ILP spike) when its state fits VMEM, else to the
    lax.map loop of single machines. SPIHT_TPU_PALLAS_ENC_BATCH=map|ilv
    forces a route; SPIHT_TPU_PALLAS_ILV_B caps the chains per kernel
    (default 8, chunked above that).
    """
    from .oracle import compute_max_n

    arrs = np.ascontiguousarray(arrs, dtype=np.int32)
    B, c, h, w = arrs.shape
    if np.isscalar(max_bits):
        mbs = np.full(B, min(int(max_bits), 2**31 - 2), np.int32)
    else:
        mbs = np.array(
            [min(int(m), 2**31 - 2) for m in max_bits], np.int32
        )
    cap_words = _cap_words_for(c, h, w, int(mbs.max(initial=1)))
    mode = os.environ.get("SPIHT_TPU_PALLAS_ENC_BATCH", "auto")
    if machine is None:
        machine = os.environ.get("SPIHT_TPU_PALLAS_ENC_MACHINE", "hybrid")
    mns = np.array([compute_max_n(a) for a in arrs], np.int32)

    def _fit_chunk(compact_flag, t1_hbm_flag=False):
        # largest halving chunk <= the requested B that fits VMEM
        # (halving keeps the compiled-kernel cache keys bounded)
        bc = min(_ilv_chunk_b(), B)
        while bc >= 1:
            if interleaved_fits(bc, c, h, w, ll_h, ll_w, cap_words,
                                compact=compact_flag,
                                t1_hbm=t1_hbm_flag):
                return bc
            bc //= 2
        return 0

    mn_ok = int(mns.max(initial=0)) <= 15
    bc_compact = _fit_chunk(True) if mn_ok else 0
    bc_std = _fit_chunk(False)
    ilv_hbm = False
    if machine == "compact":
        use_ilv = mode != "map" and bc_compact > 0
        ilv_compact, bchunk = True, max(bc_compact, 1)
    elif machine == "compact_hbm":
        # explicit ILV-hbm selection (mode='ilv'): bit-exact and
        # available, but on this dev tunnel batch calls are h2d-bound
        # (~33 MB/s first-touch transfers) so no aggregate benefit
        # over the host loop of singles was measurable
        # (BASELINE.md round 5); the auto route below prefers the
        # host loop
        bc_hbm = (_fit_chunk(True, True) if mn_ok else 0)
        use_ilv = mode == "ilv" and bc_hbm > 0
        ilv_compact = ilv_hbm = True
        bchunk = max(bc_hbm, 1)
    else:
        # the compact layout wins whenever it is valid (hardware at the
        # 512^2 headline, BASELINE.md round 4: 27.5 vs 21.7 MP/s
        # aggregate at B=8, 30.1 MP/s at B=16) and admits larger B at
        # equal VMEM; data with max_n > 15 keeps the standard layout
        use_ilv = mode != "map" and machine == "hybrid" and (
            bc_std > 0 or bc_compact > 0
        )
        ilv_compact = bc_compact > 0
        bchunk = max(bc_compact if ilv_compact else bc_std, 1)
        # 2048^2/4096^2-class BATCHED tier (round 5): no all-VMEM
        # interleaved layout fits, but the single-image HBM-table
        # machine does — run a HOST loop of the exact single-image
        # compact_hbm dispatch (hardware-validated; kernel-side
        # ~1.03 s/image at the real 4096^2/L6 geometry). The
        # one-program alternatives: lax.map-wrapping the HBM-operand
        # kernel crashed the TPU worker, and the ILV-hbm lockstep
        # variant showed no measurable benefit under this tunnel's
        # h2d-bound batch calls (BASELINE.md round 5).
        # SPIHT_TPU_DISABLE_HBM_MACHINES=1 opts out.
        if (
            not use_ilv and mode != "ilv" and mn_ok
            and os.environ.get("SPIHT_TPU_DISABLE_HBM_MACHINES") != "1"
            and not machine_fits(c, h, w, ll_h, ll_w, cap_words)
            and not machine_fits(c, h, w, ll_h, ll_w, cap_words,
                                 compact=True)
            and machine_fits(c, h, w, ll_h, ll_w, cap_words,
                             compact=True, t1_hbm=True)
        ):
            sfn = pallas_encode_fn(c, h, w, ll_h, ll_w, cap_words,
                                   interpret, "compact_hbm")
            out = []
            for b in range(B):
                wds, tot, ov = sfn(
                    jnp.asarray(arrs[b]), int(mns[b]), int(mbs[b])
                )
                if bool(ov):
                    raise EncCapacityOverflow(int(tot))
                t = int(tot)
                out.append((
                    np.asarray(wds).view(np.uint8)[: (t + 7) // 8]
                    .tobytes(),
                    int(mns[b]),
                ))
            return out
    if mode == "ilv" and not use_ilv:
        raise MachineResourceLimit(f"ilv {c}x{h}x{w}")
    if use_ilv:
        words_l, totals_l, ovf_l = [], [], []
        for s in range(0, B, bchunk):
            e = min(s + bchunk, B)
            fn = _interleaved_fn(e - s, c, h, w, ll_h, ll_w,
                                 cap_words, interpret,
                                 compact=ilv_compact,
                                 t1_hbm=ilv_hbm)
            wds, tot, ov = fn(
                jnp.asarray(arrs[s:e]), jnp.asarray(mns[s:e]),
                jnp.asarray(mbs[s:e]),
            )
            words_l.append(np.asarray(wds))
            totals_l.append(np.asarray(tot))
            ovf_l.append(np.asarray(ov))
        words = np.concatenate(words_l)
        totals = np.concatenate(totals_l)
        ovf = np.concatenate(ovf_l)
    else:
        if machine in ("compact", "compact_hbm") and not mn_ok:
            # the compact layout packs magnitudes into 16-bit halves;
            # max_n > 15 would silently corrupt the stream
            raise MachineResourceLimit(
                f"max_n={int(mns.max(initial=0))} > 15 (compact)"
            )
        if not machine_fits(
            c, h, w, ll_h, ll_w, cap_words,
            compact=machine in ("compact", "compact_hbm"),
            t1_hbm=(machine == "compact_hbm"),
        ):
            raise MachineResourceLimit(f"{c}x{h}x{w}")
        fn = pallas_encode_batch_fn(c, h, w, ll_h, ll_w, cap_words,
                                    interpret, machine)
        words, totals, ovf = fn(
            jnp.asarray(arrs), jnp.asarray(mns), jnp.asarray(mbs)
        )
        words = np.asarray(words)
        totals = np.asarray(totals)
        ovf = np.asarray(ovf)
    if ovf.any():
        raise EncCapacityOverflow(int(totals[int(np.argmax(ovf))]))
    return [
        (
            words[b].view(np.uint8)[: (int(totals[b]) + 7) // 8]
            .tobytes(),
            int(mns[b]),
        )
        for b in range(B)
    ]


def pallas_encode(
    arr: np.ndarray, ll_h: int, ll_w: int, max_bits: int = 2**31 - 2,
    interpret: bool = False, machine: str | None = None,
):
    """(bytes, max_n) via the Pallas emission machine.

    Auto-routing via preferred_machine (round-5 sweep, BASELINE.md):
    compact at bounded budgets / when only it fits (admits 2048^2-class
    geometries at bounded bit budgets and 1049^2 full streams), the
    standard hybrid at full-stream budgets where it fits;
    MachineResourceLimit when neither admits the geometry (callers fall
    back to the XLA formulations)."""
    from .oracle import compute_max_n

    arr = np.ascontiguousarray(arr, dtype=np.int32)
    c, h, w = arr.shape
    max_bits = min(int(max_bits), 2**31 - 2)
    cap_words = _cap_words_for(c, h, w, max_bits)
    mn = compute_max_n(arr)
    if machine is None and "SPIHT_TPU_PALLAS_ENC_MACHINE" not in os.environ:
        machine = preferred_machine(c, h, w, ll_h, ll_w, cap_words, mn)
    else:
        m = machine or os.environ.get("SPIHT_TPU_PALLAS_ENC_MACHINE")
        if m in ("compact", "compact_hbm") and mn > 15:
            raise MachineResourceLimit(f"max_n={mn} > 15 (compact)")
        if not machine_fits(
            c, h, w, ll_h, ll_w, cap_words,
            compact=m in ("compact", "compact_hbm"),
            t1_hbm=(m == "compact_hbm"),
        ):
            raise MachineResourceLimit(f"{c}x{h}x{w}")
    fn = pallas_encode_fn(c, h, w, ll_h, ll_w, cap_words, interpret, machine)
    words, total, overflow = fn(jnp.asarray(arr), mn, max_bits)
    if bool(overflow):
        raise EncCapacityOverflow(int(total))
    total = int(total)
    data = np.asarray(words).view(np.uint8)[: (total + 7) // 8].tobytes()
    return data, mn
