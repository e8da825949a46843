"""Fully device-side SPIHT decoder (one jitted program).

Decoding is a parsing problem: the meaning of bit t depends on the values
of bits < t (a fired set splices child tests into the same pass), and the
record schema depends on a queue the parse itself evolves — a
counter-dependent grammar that does not decompose into parallel scans the
way the ENCODER's order reconstruction does (see device_encoder.py).
The TPU-native answer here is a jitted sequential bit-machine over array
state: queues are fixed-capacity int32 buffers, one list entry is
processed per `lax.while_loop` iteration, and every update is masked so
byte-prefix truncation stops the machine mid-entry exactly like the
reference (`/root/reference/src/encoder_decoder.rs:307-454`, pop_bit
macro at :314-325). Under `jax.vmap` this becomes B lockstep decoders —
batched decode throughput scales with the batch on one chip, which is
the shape of the production use (many streams), while a single stream
remains latency-bound by design.

Bit-exact against the in-repo oracle / native kernel, including:
  * truncation at any bit (partial entries leave state untouched,
    matching the reference's early return);
  * the `decode_with_metadata` 8-column per-bit trace
    (reference: encoder_decoder.rs:631-841), including the f32
    local-position arithmetic and the (n_bits+1)-row layout.

Queue capacities are exact, not heuristic: they are computed from the
geometry's parent-multiplicity map (`_dec_geom`). Dyadic layouts give
the classic bounds (LIP <= N, LIS <= 2N, LSP <= N); odd-LL layouts have
overlapping offspring (a cell can have up to 4 parents, and instance
counts compound down the duplicated subtrees), and the bounds follow
the exact instance counts. Per plane the LIP/LIS queues
use double buffers (process one, write retained entries to the other);
same-pass LIS appends go to the tail of the buffer being processed,
which is exactly the reference's worklist order.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "decode_device",
    "decode_device_with_metadata",
    "decode_device_fn",
]

_I32 = jnp.int32

# action ids (reference metadata taxonomy, encoder_decoder.rs:722-828)
_A_LIP, _A_LIPSIGN, _A_DESC, _A_OFF, _A_OFFSIGN, _A_LSIG, _A_REF = range(7)

_F_LL, _F_DA, _F_AD, _F_DD = 0, 1, 2, 3


@lru_cache(maxsize=None)
def _dec_geom(c: int, h: int, w: int, ll_h: int, ll_w: int):
    """Static per-node decode geometry (child map, flags, child filter).

    Unlike the encoder's parent-gather formulation this is child-based,
    so odd LL dims are fine (reference _offspring semantics verbatim,
    SURVEY.md §3.4).
    """
    ii = np.arange(h)[:, None] * np.ones((1, w), np.int64)
    jj = np.ones((h, 1), np.int64) * np.arange(w)[None, :]
    in_ll = (ii < ll_h) & (jj < ll_w)
    even = (ii % 2 == 0) & (jj % 2 == 0)
    oi = np.where(in_ll, (ii % 2) * ll_h + (ii // 2) * 2, 2 * ii)
    oj = np.where(in_ll, (jj % 2) * ll_w + (jj // 2) * 2, 2 * jj)
    has_child = np.where(
        in_ll, ~even, (2 * ii + 1 < h) & (2 * jj + 1 < w)
    )
    # LL parity rule never produces out-of-range children (subband
    # rects exist by construction) except via the generic bound check
    has_child &= (oi + 1 < h) & (oj + 1 < w)
    hg = ((ii * 2 + 1) * 2 + 1 < h) & ((jj * 2 + 1) * 2 + 1 < w)
    # first-child flat index within the channel plane
    child0 = np.where(has_child, oi * w + oj, 0).astype(np.int64)
    # offspring filter for LL parents by parity (encoder_decoder.rs:137-150)
    llcf = np.where(
        (ii % 2 == 1) & (jj % 2 == 1),
        _F_DD,
        np.where((ii % 2 == 0) & (jj % 2 != 0), _F_AD, _F_DA),
    )
    # exact queue-capacity bounds under duplicate parents — closed form
    # (tree_bounds.queue_bounds, property-tested equal to the diagonal-
    # sweep table DP `_bound_dp` below; the DP took >100 s at 2048^2,
    # the closed form is O(ll*levels))
    from .tree_bounds import queue_bounds

    qb = queue_bounds(c, h, w, ll_h, ll_w)
    ent_bound = qb.ent_bound
    lis_bound = qb.lis_bound

    flat = lambda x: np.broadcast_to(
        x[None], (c, h, w)
    ).reshape(-1)
    base = (np.arange(c)[:, None, None] * (h * w)).astype(np.int64)
    child0_f = (
        np.broadcast_to(child0[None] + base, (c, h, w)).reshape(-1)
    ).astype(np.int32)
    # initial LIP: all LL cells, i->j->k channel-innermost
    # initial LIS: LL cells with not(even,even), type A
    lipq = []
    lisq = []
    for i in range(ll_h):
        for j in range(ll_w):
            for k in range(c):
                lipq.append(k * h * w + i * w + j)
    for i in range(ll_h):
        for j in range(ll_w):
            if i % 2 == 0 and j % 2 == 0:
                continue
            for k in range(c):
                lisq.append(k * h * w + i * w + j)
    return dict(
        has_child=jnp.asarray(flat(has_child)),
        hg=jnp.asarray(flat(hg)),
        child0=jnp.asarray(child0_f),
        llcf=jnp.asarray(flat(llcf).astype(np.int32)),
        in_ll=jnp.asarray(flat(in_ll)),
        lip_init=np.asarray(lipq, np.int32),
        lis_init=np.asarray(lisq, np.int32),
        ent_bound=ent_bound,
        lis_bound=lis_bound,
    )


def _bound_dp(c: int, h: int, w: int, ll_h: int, ll_w: int):
    """Diagonal-sweep table DP for (ent_bound, lis_bound) — the ground
    truth `tree_bounds.queue_bounds` is property-tested against
    (tests/test_vmem_guard.py).  With odd LL dims the parity offspring
    map overlaps: a cell can have up to 4 parents, and instance counts
    compound down the tree (a duplicated parent's whole subtree is
    traversed once per instance). inst[x] = number of LIS A-instances of
    x over the whole run; arrivals[x] = total child-test events on x =
    sum of parents' inst. Edges strictly increase i+j, so one diagonal
    sweep is a topological order. Dyadic geometries give inst == 1
    everywhere and the bounds reduce to the classic N / 2N."""
    ii = np.arange(h)[:, None] * np.ones((1, w), np.int64)
    jj = np.ones((h, 1), np.int64) * np.arange(w)[None, :]
    in_ll = (ii < ll_h) & (jj < ll_w)
    even = (ii % 2 == 0) & (jj % 2 == 0)
    oi = np.where(in_ll, (ii % 2) * ll_h + (ii // 2) * 2, 2 * ii)
    oj = np.where(in_ll, (jj % 2) * ll_w + (jj // 2) * 2, 2 * jj)
    has_child = np.where(
        in_ll, ~even, (2 * ii + 1 < h) & (2 * jj + 1 < w)
    )
    has_child &= (oi + 1 < h) & (oj + 1 < w)
    inst = np.zeros((h, w), np.int64)
    inst[:ll_h, :ll_w] = ~even[:ll_h, :ll_w]
    arrivals = np.zeros((h, w), np.int64)
    diag = (ii + jj).astype(np.int64)
    for d in range(int(diag.max()) + 1):
        m = diag == d
        upd = m & ~in_ll
        inst[upd] = arrivals[upd]
        pm = m & has_child & (inst > 0)
        if not pm.any():
            continue
        src = inst[pm]
        ti = oi[pm].astype(np.int64)
        tj = oj[pm].astype(np.int64)
        for di in (0, 1):
            for dj in (0, 1):
                np.add.at(arrivals, (ti + di, tj + dj), src)
    ent_bound = int(c * (ll_h * ll_w + arrivals.sum()))
    lis_bound = int(c * ((ll_h * ll_w - len(range(0, ll_h, 2)) *
                          len(range(0, ll_w, 2))) + arrivals.sum()))
    return ent_bound, lis_bound


def _rect_table(level: int, ll_h: int, ll_w: int, slices) -> np.ndarray:
    """(level+1, 4, 4) table of subband rects (r0, rlen, c0, clen) by
    (depth, filter) for the metadata local-position math."""
    tab = np.zeros((level + 1, 4, 4), np.int32)
    tab[level, :, :] = [0, ll_h, 0, ll_w]
    if slices is not None:
        top, other = slices
        tab[level, :, :] = [
            top[0][0],
            top[0][1] - top[0][0],
            top[1][0],
            top[1][1] - top[1][0],
        ]
        for depth in range(level):
            da, ad, dd = other[level - 1 - depth]
            for f, r in ((_F_DA, da), (_F_AD, ad), (_F_DD, dd)):
                tab[depth, f] = [
                    r[0][0],
                    r[0][1] - r[0][0],
                    r[1][0],
                    r[1][1] - r[1][0],
                ]
    # avoid div-by-zero on unused rows
    tab[:, :, 1] = np.maximum(tab[:, :, 1], 1)
    tab[:, :, 3] = np.maximum(tab[:, :, 3], 1)
    return tab


# queue entries: node * 2^7 | type * 2^6 | filter * 2^4 | depth
def _pack(node, typ, filt, depth):
    return ((node << 7) | (typ << 6) | (filt << 4) | depth).astype(_I32)


def _build_decoder(
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    level: int,
    rect_tab,
    cap_words: int,
    meta_rows: int,
):
    """Construct the jitted sequential decode machine.

    Returns fn(words_u32[cap_words], nbits, max_n) ->
    (rec_i32[c*h*w], meta_i32[meta_rows, 8]).
    `meta_rows` 0 disables the trace (plain decode).

    The while-loop body is STRAIGHT-LINE masked code: every queue/array
    update is a single dynamic-update-slice whose index redirects to a
    scratch slot when the write is inactive, and the per-plane LIP/LIS
    double buffers live in one (2, cap) array indexed by a parity
    scalar (flipped at plane end) instead of being swapped. With no
    lax.cond/select around carried arrays, XLA keeps every update in
    place — the round-2 rewrite took a loop iteration from ~120 us
    (cond-guarded updates copied MB-sized buffers) to the scalar-op
    floor.
    """
    if c * h * w >= 1 << 24:
        raise ValueError("geometry too large for packed queue entries")
    g = _dec_geom(c, h, w, ll_h, ll_w)
    N = c * h * w
    HW = h * w
    with_meta = meta_rows > 0
    if rect_tab is not None:
        rtab = jnp.asarray(
            np.asarray(rect_tab, np.int32).reshape(level + 1, 4, 4)
        )
    else:
        rtab = jnp.asarray(_rect_table(level, ll_h, ll_w, None))
    # exact bounds from the geometry's parent-multiplicity (duplicate
    # parents in odd-LL layouts make > N entries possible)
    LIP_CAP = g["ent_bound"] + 1
    LIS_CAP = 2 * g["lis_bound"] + 1
    ENT_CAP = g["ent_bound"] + 1

    lip_init = _pack(
        jnp.asarray(g["lip_init"]), jnp.int32(0), jnp.int32(_F_LL),
        jnp.int32(level),
    )
    lis_init = _pack(
        jnp.asarray(g["lis_init"]), jnp.int32(1), jnp.int32(_F_LL),
        jnp.int32(level),
    )
    n_lip0 = int(lip_init.shape[0])
    n_lis0 = int(lis_init.shape[0])

    PH_LIP, PH_LIS, PH_REF = 0, 1, 2

    def decode(words, nbits, max_n):
        nbits = jnp.asarray(nbits, _I32)
        max_n = jnp.asarray(max_n, _I32)

        lip2 = jnp.zeros((2, LIP_CAP), _I32).at[0, :n_lip0].set(lip_init)
        lis2 = jnp.zeros((2, LIS_CAP), _I32).at[0, :n_lis0].set(lis_init)

        st = dict(
            rec=jnp.zeros(N + 1, _I32),       # slot N = scratch
            meta=jnp.zeros((max(meta_rows, 1) + 1, 8), _I32),
            lip2=lip2,
            lis2=lis2,
            lsp=jnp.zeros(ENT_CAP, _I32),
            lipcur=jnp.zeros((), _I32),
            liscur=jnp.zeros((), _I32),
            lip_cnt=jnp.asarray(n_lip0, _I32),
            lip_i=jnp.zeros((), _I32),
            lip_w=jnp.zeros((), _I32),
            lip_add=jnp.zeros((), _I32),
            lis_cnt=jnp.asarray(n_lis0, _I32),
            lis_i=jnp.zeros((), _I32),
            lis_w=jnp.zeros((), _I32),
            lsp_cnt=jnp.zeros((), _I32),
            lsp_snap=jnp.zeros((), _I32),
            ref_i=jnp.zeros((), _I32),
            cur=jnp.zeros((), _I32),
            n=max_n,
            phase=jnp.asarray(PH_LIP, _I32),
            dead=jnp.zeros((), jnp.bool_),
            done=jnp.zeros((), jnp.bool_),
        )

        def bit_at(pos):
            word = words[jnp.clip(pos >> 5, 0, cap_words - 1)]
            return ((word >> (pos & 31).astype(jnp.uint32)) & 1) == 1

        def unpack(e):
            return e >> 7, (e >> 6) & 1, (e >> 4) & 3, e & 15

        def step(st):
            cur0 = st["cur"]
            n = st["n"]
            rec = st["rec"]
            meta = st["meta"]
            lip2 = st["lip2"]
            lis2 = st["lis2"]
            lsp = st["lsp"]

            in_lip = st["phase"] == PH_LIP
            in_lis = st["phase"] == PH_LIS
            in_ref = st["phase"] == PH_REF
            lip_have = in_lip & (st["lip_i"] < st["lip_cnt"])
            lis_have = in_lis & (st["lis_i"] < st["lis_cnt"])
            ref_have = in_ref & (st["ref_i"] < st["lsp_snap"])
            # phase advances (no bits consumed)
            adv_lip = in_lip & ~lip_have
            adv_lis = in_lis & ~lis_have
            plane_end = in_ref & ~ref_have

            # ---- fetch the active entry (exactly one of the three) ----
            e_lip = lip2[st["lipcur"], st["lip_i"]]
            e_lis = lis2[st["liscur"], st["lis_i"]]
            e_ref = lsp[st["ref_i"]]
            e = jnp.where(lip_have, e_lip,
                          jnp.where(lis_have, e_lis, e_ref))
            node, typ, filt, depth = unpack(e)
            node = jnp.clip(node, 0, N - 1)
            is_a = lis_have & (typ == 1)
            is_b = lis_have & (typ == 0)

            # ---- static per-node data (scalar gathers) ----
            hc = g["has_child"][node]
            hg_n = g["hg"][node]
            c0 = g["child0"][node]
            cfilt = jnp.where(filt == _F_LL, g["llcf"][node], filt).astype(
                _I32
            )
            cdep = jnp.maximum(depth - 1, 0)
            child_nodes = jnp.stack([c0, c0 + 1, c0 + w, c0 + w + 1])
            child_nodes = jnp.clip(child_nodes, 0, N - 1)

            # =========== sequential pop ladder (masked scalars) =========
            # Each potential bit consumption has a static slot in the
            # ladder; `use_k` says whether slot k consumes a bit this
            # iteration, all computed as scalars. Slot offsets are the
            # running sum of earlier slots' consumption.
            # Slots: 0: lip/desc/lsig/ref test bit
            #        1: lip sign
            #        2..9: per child: test, sign
            base_val = jnp.where(
                n == 0,
                jnp.ones((), _I32),
                ((1 << jnp.maximum(n - 1, 0)) + (1 << n)).astype(_I32),
            )

            use0 = lip_have | lis_have | ref_have
            off0 = cur0
            ok0 = use0 & (off0 < nbits)
            b0 = bit_at(off0) & ok0
            dead0 = use0 & ~ok0  # wanted a bit, none left

            # lip fired -> sign bit
            lip_fired = lip_have & b0
            use1 = lip_fired
            off1 = off0 + use0.astype(_I32)
            ok1 = use1 & (off1 < nbits) & ~dead0
            b1 = bit_at(off1) & ok1
            dead1 = use1 & ~ok1 & ~dead0

            # A-entry fired with children -> 4x (test, sign)
            a_fired = is_a & b0 & ~dead0
            run_children = a_fired & hc
            consumed = off1 + use1.astype(_I32)
            ch_test = []
            ch_sign = []
            dead_c = dead0 | dead1
            dead_at_child = []
            for k in range(4):
                dead_at_child.append(dead_c)
                uset = run_children & ~dead_c
                okt = uset & (consumed < nbits)
                bt = bit_at(consumed) & okt
                dt = uset & ~okt
                consumed = consumed + okt.astype(_I32)
                uses = bt
                oks = uses & (consumed < nbits) & ~dt
                bs = bit_at(consumed) & oks
                ds = uses & ~oks & ~dt
                consumed = consumed + oks.astype(_I32)
                ch_test.append((bt, okt))
                ch_sign.append((bs, oks))
                dead_c = dead_c | dt | ds
            new_dead = st["dead"] | dead_c

            # ================== state writes (masked DUS) ===============
            SCR_REC = N
            SCR_LIP = LIP_CAP - 1
            SCR_LIS = LIS_CAP - 1
            SCR_LSP = ENT_CAP - 1

            other_lip = 1 - st["lipcur"]
            other_lis = 1 - st["liscur"]

            # --- rec writes: lip commit, 4 child commits, ref commit ---
            lip_commit = lip_fired & ok1
            v_lip = jnp.where(b1, base_val, -base_val)
            rec = rec.at[jnp.where(lip_commit, node, SCR_REC)].set(v_lip)
            for k in range(4):
                bt, okt = ch_test[k]
                bs, oks = ch_sign[k]
                commit = bt & oks
                v = jnp.where(bs, base_val, -base_val)
                rec = rec.at[
                    jnp.where(commit, child_nodes[k], SCR_REC)
                ].set(v)
            ref_commit = ref_have & ok0
            x_old = rec[node]
            mag = jnp.abs(x_old)
            mag = jnp.where(b0, mag | (1 << n), mag & ~(1 << n))
            v_ref = jnp.where(x_old >= 0, mag, -mag).astype(_I32)
            rec = rec.at[jnp.where(ref_commit, node, SCR_REC)].set(v_ref)

            # --- LSP appends: lip fire, then significant children ------
            lsp_w = st["lsp_cnt"]
            lsp = lsp.at[jnp.where(lip_commit, lsp_w, SCR_LSP)].set(e)
            lsp_w = lsp_w + lip_commit.astype(_I32)
            for k in range(4):
                bt, okt = ch_test[k]
                bs, oks = ch_sign[k]
                commit = bt & oks
                ce = _pack(child_nodes[k], jnp.int32(0), cfilt, cdep)
                lsp = lsp.at[jnp.where(commit, lsp_w, SCR_LSP)].set(ce)
                lsp_w = lsp_w + commit.astype(_I32)

            # --- LIP writes: retained entry + insignificant children ---
            lip_retain = lip_have & ok0 & ~b0
            lip2 = lip2.at[
                other_lip, jnp.where(lip_retain, st["lip_w"], SCR_LIP)
            ].set(e)
            lip_w_new = st["lip_w"] + lip_retain.astype(_I32)
            lip_add = st["lip_add"]
            for k in range(4):
                bt, okt = ch_test[k]
                insig = okt & ~bt
                ce = _pack(child_nodes[k], jnp.int32(0), cfilt, cdep)
                pos = lip_w_new + lip_add
                lip2 = lip2.at[
                    other_lip, jnp.where(insig, pos, SCR_LIP)
                ].set(ce)
                lip_add = lip_add + insig.astype(_I32)

            # --- LIS writes ---
            # retained A (desc bit 0) or retained B (lsig bit 0)
            lis_retain = lis_have & ok0 & ~b0
            lis2 = lis2.at[
                other_lis, jnp.where(lis_retain, st["lis_w"], SCR_LIS)
            ].set(e)
            lis_w_new = st["lis_w"] + lis_retain.astype(_I32)
            # A fire -> B re-entry at the tail of the LIVE buffer (only
            # after all children were fully consumed, matching the
            # reference's order of operations under truncation)
            lis_w_cur = st["lis_cnt"]
            reapp = a_fired & hg_n & ~dead_c
            be = _pack(node, jnp.int32(0), filt, depth)
            lis2 = lis2.at[
                st["liscur"], jnp.where(reapp, lis_w_cur, SCR_LIS)
            ].set(be)
            lis_w_cur = lis_w_cur + reapp.astype(_I32)
            # B fire -> 4 A-children at the tail of the live buffer
            b_fired = is_b & b0 & ok0 & hc
            for k in range(4):
                ce = _pack(child_nodes[k], jnp.int32(1), cfilt, cdep)
                lis2 = lis2.at[
                    st["liscur"], jnp.where(b_fired, lis_w_cur, SCR_LIS)
                ].set(ce)
                lis_w_cur = lis_w_cur + b_fired.astype(_I32)

            # --- metadata rows (one per potential bit, masked) ---------
            if with_meta:
                def note(meta, action, nd, ft, dp, row, want):
                    k_ = nd // HW
                    i_ = (nd % HW) // w
                    j_ = nd % w
                    r = rtab[jnp.clip(dp, 0, level), ft]
                    f2 = jnp.float32
                    lh = (f2(i_) - f2(r[0])) / f2(r[1])
                    lw = (f2(j_) - f2(r[2])) / f2(r[3])
                    big = f2(3e38)
                    th_ = jnp.minimum(lh * f2(200000.0), big)
                    tw_ = jnp.minimum(lw * f2(200000.0), big)
                    lh = (th_ - f2(100000.0)).astype(_I32)
                    lw = (tw_ - f2(100000.0)).astype(_I32)
                    rowv = jnp.stack(
                        [jnp.asarray(action, _I32), lh, lw, k_, ft, dp,
                         n, st["rec"][nd]]
                    ).astype(_I32)
                    ok = want & (row <= meta_rows - 1)
                    return meta.at[
                        jnp.where(ok, row, meta_rows)
                    ].set(rowv)

                # rows are written for every ATTEMPTED pop (incl. the
                # one that fails), at its stream offset
                act0 = jnp.where(
                    lip_have, _A_LIP,
                    jnp.where(ref_have, _A_REF,
                              jnp.where(is_a, _A_DESC, _A_LSIG)),
                )
                meta = note(meta, act0, node, filt, depth, off0,
                            use0 & ~st["dead"])
                meta = note(meta, _A_LIPSIGN, node, filt, depth, off1,
                            use1 & ~dead0 & ~st["dead"])
                coff = off1 + use1.astype(_I32)
                for k in range(4):
                    bt, okt = ch_test[k]
                    bs, oks = ch_sign[k]
                    want_t = run_children & ~dead_at_child[k] & ~st["dead"]
                    meta = note(meta, _A_OFF, child_nodes[k], cfilt, cdep,
                                coff, want_t)
                    coff = coff + okt.astype(_I32)
                    meta = note(meta, _A_OFFSIGN, child_nodes[k], cfilt,
                                cdep, coff, bt & ~st["dead"])
                    coff = coff + oks.astype(_I32)

            # ---- scalar bookkeeping + phase machine -------------------
            lip_i = st["lip_i"] + lip_have.astype(_I32)
            lis_i = st["lis_i"] + lis_have.astype(_I32)
            ref_i = st["ref_i"] + ref_have.astype(_I32)
            phase = jnp.where(adv_lip, PH_LIS,
                              jnp.where(adv_lis, PH_REF, st["phase"]))
            done = st["done"] | (plane_end & (n == 0))
            # plane rollover (masked scalar selects only)
            pe = plane_end
            lipcur = jnp.where(pe, other_lip, st["lipcur"])
            liscur = jnp.where(pe, other_lis, st["liscur"])
            lip_cnt = jnp.where(pe, lip_w_new + lip_add, st["lip_cnt"])
            lis_cnt = jnp.where(pe, lis_w_new, lis_w_cur)
            lip_i = jnp.where(pe, 0, lip_i)
            lis_i = jnp.where(pe, 0, lis_i)
            ref_i = jnp.where(pe, 0, ref_i)
            lip_w = jnp.where(pe, 0, lip_w_new)
            lip_add2 = jnp.where(pe, 0, lip_add)
            lis_w = jnp.where(pe, 0, lis_w_new)
            lsp_snap = jnp.where(pe, lsp_w, st["lsp_snap"])
            n_new = jnp.where(pe, jnp.maximum(n - 1, 0), n)
            phase = jnp.where(pe, PH_LIP, phase)

            return dict(
                rec=rec, meta=meta, lip2=lip2, lis2=lis2, lsp=lsp,
                lipcur=lipcur, liscur=liscur,
                lip_cnt=lip_cnt, lip_i=lip_i, lip_w=lip_w,
                lip_add=lip_add2,
                lis_cnt=lis_cnt, lis_i=lis_i, lis_w=lis_w,
                lsp_cnt=lsp_w, lsp_snap=lsp_snap, ref_i=ref_i,
                cur=consumed, n=n_new, phase=phase,
                dead=new_dead, done=done,
            )

        out = lax.while_loop(
            lambda s: ~(s["dead"] | s["done"]), step, st
        )
        return out["rec"][:N].reshape(c, h, w), out["meta"][:-1]

    return decode


def _build_hybrid(c: int, h: int, w: int, ll_h: int, ll_w: int,
                  cap_words: int):
    """Hybrid plane-phase decoder (plain decode, no metadata).

    Decode parsing is counter-dependent, but only the LIS cascade truly
    is: per plane,
      * the LIP section is a 2-state grammar (test bit; if 1, a sign bit
        follows). A position is a sign bit iff the run of 1s ending just
        before it has odd length — one cummax + cumsums classify the
        whole section, and entry routing (retain / LSP append) becomes
        rank scatters. Fully parallel.
      * the refinement section is a known-length dense run over the LSP
        prefix — pure elementwise once LSP magnitudes are kept as a flat
        stream. Fully parallel, no gathers.
      * the LIS worklist keeps the sequential masked-DUS machine (fired
        sets splice child records into the same pass), but with a
        LIS-only body.
    Significance and refinement write a SHARED rec array in place (not
    per-LSP-entry running values): in non-dyadic geometries two LIS
    parents can own the same child (overlapping offspring), so a cell
    can enter LSP more than once, and the oracle semantics
    (encoder_decoder.rs-style in-place refinement) make every
    duplicate's bits land on the one shared cell — including the
    re-significance overwrite. Within one plane all duplicate writes
    carry identical values (the encoder emits the same actual
    coefficient bit for every instance), so the parallel scatters stay
    order-independent. Bit-exact vs the sequential machine / native
    kernel including byte-prefix truncation (reference pop_bit
    semantics, /root/reference/src/encoder_decoder.rs:314-325).
    """
    if c * h * w >= 1 << 24:
        raise ValueError("geometry too large for packed queue entries")
    g = _dec_geom(c, h, w, ll_h, ll_w)
    N = c * h * w
    # exact bounds from parent multiplicity (see _dec_geom): dyadic
    # geometries give the classic N / 2N
    LIP_CAP = g["ent_bound"] + 1
    ENT_CAP = g["ent_bound"] + 1
    LIS_CAP = 2 * g["lis_bound"] + 1
    # bulk-retention block width; buffers padded by KB so the block
    # dynamic-slices never clamp (slot LIS_BUF-1 is the write scratch)
    KB = 128
    LIS_BUF = LIS_CAP + KB
    # LIP-section window: <= 2 entries' bits per LIP slot, and never more
    # than the whole (padded) stream
    W = int(min(2 * g["ent_bound"] + 2, cap_words * 32))
    WW = (W + 31) // 32 + 2
    RW = int(min(ENT_CAP, cap_words * 32))
    RWW = (RW + 31) // 32 + 2

    lip_init = jnp.asarray(g["lip_init"])              # bare nodes
    lis_init = (jnp.asarray(g["lis_init"]) << 1) | 1   # node<<1 | typeA
    # per-node geometry packed into one word (child0 fits: N < 2^24)
    geo_pack = (
        jnp.asarray(g["child0"])
        | (g["has_child"].astype(_I32) << 24)
        | (g["hg"].astype(_I32) << 25)
    )
    n_lip0 = int(lip_init.shape[0])
    n_lis0 = int(lis_init.shape[0])
    PADW = cap_words + max(WW, RWW) + 2

    def decode(words, nbits, max_n):
        nbits = jnp.asarray(nbits, _I32)
        max_n = jnp.asarray(max_n, _I32)
        wpad = jnp.zeros(PADW, jnp.uint32).at[:cap_words].set(words)

        def bit_at(pos):
            word = words[jnp.clip(pos >> 5, 0, cap_words - 1)]
            return ((word >> (pos & 31).astype(jnp.uint32)) & 1) == 1

        def window(cur, nwords, nbits_w):
            ws = lax.dynamic_slice(wpad, (cur >> 5,), (nwords,))
            bits = (
                (ws[:, None] >> jnp.arange(32, dtype=jnp.uint32)[None, :])
                & 1
            ).astype(jnp.bool_).reshape(-1)
            return lax.dynamic_slice(bits, (cur & 31,), (nbits_w,))

        st = dict(
            lip2=jnp.zeros((2, LIP_CAP), _I32).at[0, :n_lip0].set(lip_init),
            lis2=jnp.zeros((2, LIS_BUF), _I32).at[0, :n_lis0].set(lis_init),
            rec=jnp.zeros(N + 1, _I32),        # slot N = scratch
            lsp_ent=jnp.zeros(ENT_CAP, _I32),  # bare node per LSP event
            lip_cnt=jnp.asarray(n_lip0, _I32),
            lis_cnt=jnp.asarray(n_lis0, _I32),
            lsp_cnt=jnp.zeros((), _I32),
            lipcur=jnp.zeros((), _I32),
            liscur=jnp.zeros((), _I32),
            cur=jnp.zeros((), _I32),
            n=max_n,
            dead=jnp.zeros((), jnp.bool_),
            done=jnp.zeros((), jnp.bool_),
        )

        def plane(st):
            n = st["n"]
            base_val = jnp.where(
                n == 0,
                jnp.ones((), _I32),
                jnp.asarray(3, _I32) << jnp.maximum(n - 1, 0),
            ).astype(_I32)
            other_lip = 1 - st["lipcur"]
            other_lis = 1 - st["liscur"]

            # ================= LIP section (parallel) =================
            nbits_rel = nbits - st["cur"]
            sect = window(st["cur"], WW, W)
            iota = jnp.arange(W, dtype=_I32)
            zpos = jnp.where(~sect, iota, -1)
            lz = lax.associative_scan(jnp.maximum, zpos)
            lzs = jnp.concatenate([jnp.full((1,), -1, _I32), lz[:-1]])
            is_sign = ((iota - 1 - lzs) & 1) == 1
            is_test = ~is_sign
            eidx = jnp.cumsum(is_test.astype(_I32)) - 1
            pos_ok = iota < nbits_rel
            valid = is_test & (eidx < st["lip_cnt"]) & pos_ok
            fired = valid & sect
            sgn = jnp.concatenate([sect[1:], jnp.zeros((1,), jnp.bool_)])
            sign_ok = (iota + 1) < nbits_rel
            commit = fired & sign_ok
            retain = valid & ~sect

            lipbuf = lax.dynamic_index_in_dim(
                st["lip2"], st["lipcur"], 0, keepdims=False
            )
            ent = lipbuf[jnp.clip(eidx, 0, LIP_CAP - 1)]
            r_rank = jnp.cumsum(retain.astype(_I32)) - 1
            lip2 = st["lip2"].at[
                other_lip, jnp.where(retain, r_rank, LIP_CAP - 1)
            ].set(ent)
            f_rank = jnp.cumsum(commit.astype(_I32)) - 1
            lidx = st["lsp_cnt"] + f_rank
            lsp_ent = st["lsp_ent"].at[
                jnp.where(commit, lidx, ENT_CAP - 1)
            ].set(ent)
            rec = st["rec"].at[
                jnp.where(commit, jnp.clip(ent, 0, N - 1), N)
            ].set(jnp.where(sgn, base_val, -base_val))
            n_valid = jnp.sum(valid, dtype=_I32)
            n_commit = jnp.sum(commit, dtype=_I32)
            n_retain = jnp.sum(retain, dtype=_I32)
            dead = (n_valid < st["lip_cnt"]) | jnp.any(fired & ~sign_ok)

            # ============ LIS worklist (run-skipping machine) =========
            # A non-fired LIS entry consumes exactly one 0-bit, so the
            # prefix of the worklist up to the next 1-bit is a
            # fixed-stride grammar: classify a KB-wide block in one
            # vector read and bulk-retain it (two dynamic slices + one
            # update). The sequential body only ever runs on FIRED
            # entries (whose child cascades splice same-pass bits) —
            # iterations scale with fires, not worklist length.
            liscur = st["liscur"]

            def lis_cond(s):
                return (~s["dead"]) & (s["lis_i"] < s["lis_cnt"])

            def lis_step(s):
                cur0 = s["cur"]
                kio = jnp.arange(KB, dtype=_I32)
                pos = cur0 + kio
                wk = words[jnp.clip(pos >> 5, 0, cap_words - 1)]
                bitsk = ((wk >> (pos & 31).astype(jnp.uint32)) & 1) == 1
                validk = kio < (s["lis_cnt"] - s["lis_i"])
                okk = pos < nbits
                stop = bitsk | ~okk | ~validk
                f = jnp.min(jnp.where(stop, kio, KB))
                src = lax.dynamic_slice(
                    s["lis2"], (liscur, s["lis_i"]), (1, KB)
                )[0]
                dst = lax.dynamic_slice(
                    s["lis2"], (other_lis, s["lis_w"]), (1, KB)
                )[0]
                lis2_2 = lax.dynamic_update_slice(
                    s["lis2"],
                    jnp.where(kio < f, src, dst)[None, :],
                    (other_lis, s["lis_w"]),
                )
                lis_i1 = s["lis_i"] + f
                lis_w = s["lis_w"] + f
                cur1 = cur0 + f
                has_e = lis_i1 < s["lis_cnt"]
                ok0 = cur1 < nbits
                blocked = f < KB
                # stop[f] with a live entry and a live bit => the bit is
                # set: the blocker FIRED (retention is bulk-only)
                proc = blocked & has_e & ok0
                dead0 = blocked & has_e & ~ok0

                # the blocker entry is lane f of the already-read block
                e = jnp.take(src, jnp.clip(f, 0, KB - 1))
                node = jnp.clip(e >> 1, 0, N - 1)
                is_a = (e & 1) == 1
                # one packed-geometry gather instead of three
                gp = geo_pack[node]
                hc = (gp & (1 << 24)) != 0
                hg_n = (gp & (1 << 25)) != 0
                c0 = gp & 0xFFFFFF
                children = jnp.clip(
                    jnp.stack([c0, c0 + 1, c0 + w, c0 + w + 1]), 0, N - 1
                )

                # the whole fired cascade (<= 9 bits) sits in a 2-word
                # funnel-shifted window: bit reads become scalar
                # shift/and ops instead of 9 sequential gathers
                s_sh = (cur1 & 31).astype(jnp.uint32)
                wi = jnp.clip(cur1 >> 5, 0, cap_words - 1)
                w0 = words[wi]
                w1 = words[jnp.clip(wi + 1, 0, cap_words - 1)]
                win = (w0 >> s_sh) | jnp.where(
                    s_sh == 0, jnp.uint32(0), w1 << (32 - s_sh)
                )

                def wbit(p):
                    return ((win >> (p - cur1).astype(jnp.uint32)) & 1) == 1

                a_fired = is_a & proc
                run_children = a_fired & hc
                consumed = cur1 + proc.astype(_I32)
                ch_test = []
                ch_sign = []
                dead_c = dead0
                for k in range(4):
                    uset = run_children & ~dead_c
                    okt = uset & (consumed < nbits)
                    bt = wbit(consumed) & okt
                    dt = uset & ~okt
                    consumed = consumed + okt.astype(_I32)
                    oks = bt & (consumed < nbits) & ~dt
                    bs = wbit(consumed) & oks
                    ds = bt & ~oks & ~dt
                    consumed = consumed + oks.astype(_I32)
                    ch_test.append((bt, okt))
                    ch_sign.append((bs, oks))
                    dead_c = dead_c | dt | ds

                lsp_ent2 = s["lsp_ent"]
                rec2 = s["rec"]
                lip2_2 = s["lip2"]
                lsp_w = s["lsp_cnt"]
                lip_add = s["lip_add"]
                for k in range(4):
                    bt, okt = ch_test[k]
                    bs, oks = ch_sign[k]
                    commit_k = bt & oks
                    lsp_ent2 = lsp_ent2.at[
                        jnp.where(commit_k, lsp_w, ENT_CAP - 1)
                    ].set(children[k])
                    # re-significance of a duplicated cell overwrites
                    # its refined value with +-base (oracle semantics)
                    rec2 = rec2.at[
                        jnp.where(commit_k, children[k], N)
                    ].set(jnp.where(bs, base_val, -base_val))
                    lsp_w = lsp_w + commit_k.astype(_I32)
                    insig = okt & ~bt
                    lip2_2 = lip2_2.at[
                        other_lip,
                        jnp.where(insig, s["lip_w"] + lip_add, LIP_CAP - 1),
                    ].set(children[k])
                    lip_add = lip_add + insig.astype(_I32)

                # A fire -> B re-entry at live tail (after children fully
                # consumed, matching reference order under truncation)
                lis_tail = s["lis_cnt"]
                reapp = a_fired & hg_n & ~dead_c
                lis2_2 = lis2_2.at[
                    liscur, jnp.where(reapp, lis_tail, LIS_BUF - 1)
                ].set(node << 1)
                lis_tail = lis_tail + reapp.astype(_I32)
                # B fire -> 4 A-children at live tail
                b_fired = (~is_a) & proc & hc
                for k in range(4):
                    lis2_2 = lis2_2.at[
                        liscur, jnp.where(b_fired, lis_tail, LIS_BUF - 1)
                    ].set((children[k] << 1) | 1)
                    lis_tail = lis_tail + b_fired.astype(_I32)

                return dict(
                    lip2=lip2_2, lis2=lis2_2, lsp_ent=lsp_ent2,
                    rec=rec2, lsp_cnt=lsp_w,
                    lip_w=s["lip_w"], lip_add=lip_add,
                    lis_i=lis_i1 + proc.astype(_I32),
                    lis_w=lis_w, lis_cnt=lis_tail,
                    cur=consumed, dead=s["dead"] | dead_c,
                )

            s2 = lax.while_loop(
                lis_cond, lis_step,
                dict(
                    lip2=lip2, lis2=st["lis2"], lsp_ent=lsp_ent,
                    rec=rec, lsp_cnt=st["lsp_cnt"] + n_commit,
                    lip_w=n_retain, lip_add=jnp.zeros((), _I32),
                    lis_i=jnp.zeros((), _I32), lis_w=jnp.zeros((), _I32),
                    lis_cnt=st["lis_cnt"],
                    cur=st["cur"] + n_valid + n_commit,
                    dead=dead,
                ),
            )

            # ================= refinement (parallel) ==================
            # snapshot: only cells significant BEFORE this plane refine.
            # Gather old values from the shared rec, set/clear bit n
            # keeping the sign, scatter back: duplicate LSP instances of
            # one cell gather the same old value and the same stream bit
            # (the encoder emits the actual coefficient bit for every
            # instance), so the scatter is value-unique.
            ref_len = st["lsp_cnt"]
            alive = ~s2["dead"]
            nbits_rel2 = nbits - s2["cur"]
            rsect = window(s2["cur"], RWW, RW)
            rbits = jnp.zeros(ENT_CAP, jnp.bool_).at[:RW].set(
                rsect[:ENT_CAP]
            )
            tiota = jnp.arange(ENT_CAP, dtype=_I32)
            valid_t = alive & (tiota < ref_len) & (tiota < nbits_rel2)
            nodes = jnp.clip(s2["lsp_ent"], 0, N - 1)
            old = s2["rec"][nodes]
            bitmask = jnp.asarray(1, _I32) << n
            nmag = (jnp.abs(old) & ~bitmask) | (rbits.astype(_I32) << n)
            nval = jnp.where(old >= 0, nmag, -nmag)
            rec3 = s2["rec"].at[jnp.where(valid_t, nodes, N)].set(nval)
            dead_ref = alive & (ref_len > nbits_rel2)
            dead3 = s2["dead"] | dead_ref
            cur3 = s2["cur"] + jnp.minimum(
                ref_len, jnp.maximum(nbits_rel2, 0)
            )

            return dict(
                lip2=s2["lip2"], lis2=s2["lis2"],
                lsp_ent=s2["lsp_ent"], rec=rec3,
                lip_cnt=s2["lip_w"] + s2["lip_add"],
                lis_cnt=s2["lis_w"],
                lsp_cnt=s2["lsp_cnt"],
                lipcur=other_lip, liscur=other_lis,
                cur=cur3, n=jnp.maximum(n - 1, 0),
                dead=dead3,
                done=st["done"] | ((~dead3) & (n == 0)),
            )

        out = lax.while_loop(
            lambda s: ~(s["dead"] | s["done"]), plane, st
        )
        return out["rec"][:N].reshape(c, h, w)

    return decode


@lru_cache(maxsize=None)
def decode_device_fn(
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    cap_words: int,
    level: int = 0,
    rect_tab: Optional[Tuple] = None,
    meta_rows: int = 0,
):
    if meta_rows == 0:
        return jax.jit(_build_hybrid(c, h, w, ll_h, ll_w, cap_words))
    return jax.jit(
        _build_decoder(
            c, h, w, ll_h, ll_w, level, rect_tab, cap_words, meta_rows
        )
    )


def _words_of(data: bytes, cap_words: int) -> jnp.ndarray:
    raw = np.frombuffer(data, dtype=np.uint8)
    pad = cap_words * 4 - raw.size
    raw = np.pad(raw, (0, pad))
    return jnp.asarray(raw.view(np.uint32))


def decode_device(
    data: bytes, n: int, c: int, h: int, w: int, ll_h: int, ll_w: int
) -> np.ndarray:
    """Decode bytes -> (C,H,W) i32 array, fully on device.

    Prefix-tolerant: any byte prefix decodes (the machine stops mid-entry
    exactly like the reference). The decoder consumes the byte-padded bit
    length, matching the wire format's pad-zero tolerance.
    """
    nbits = len(data) * 8
    cap_words = max((nbits + 31) // 32, 1)
    if _use_pallas_machine(c, h, w):
        from .pallas_decoder import machine_fits, pallas_decode_fn

        # routing tiers: all-VMEM hybrid; else the HBM-geometry-table
        # hybrid (4096^2-class admission, round 5;
        # SPIHT_TPU_DISABLE_HBM_MACHINES=1 opts out); else XLA fallback
        machine = None
        if not machine_fits(c, h, w, ll_h, ll_w, cap_words):
            machine = (
                "hybrid_hbm"
                if os.environ.get("SPIHT_TPU_DISABLE_HBM_MACHINES") != "1"
                and machine_fits(c, h, w, ll_h, ll_w, cap_words,
                                 geo_hbm=True)
                else ""
            )
        if machine != "":
            # max_n <= 13 bounds |rec| < 2^14: ship int16 over the wire
            # (halves d2h, value-identical) and upcast host-side
            od = "int16" if int(n) <= 13 else "int32"
            fn = pallas_decode_fn(c, h, w, ll_h, ll_w, cap_words,
                                  machine=machine, out_dtype=od)
            rec = np.asarray(
                fn(_words_of(data, cap_words), nbits, int(n))
            )
            return (
                rec.astype(np.int32, copy=False) if od == "int16" else rec
            )
    fn = decode_device_fn(c, h, w, ll_h, ll_w, cap_words)
    rec = fn(_words_of(data, cap_words), nbits, int(n))
    return np.asarray(rec)


def _use_pallas_machine(c: int, h: int, w: int) -> bool:
    """Plain decode routes to the Pallas bit machine on real TPU
    backends (12-16x the hybrid XLA machine at the headline geometry,
    BASELINE.md); CPU keeps the hybrid (Mosaic interpret mode is for
    tests). SPIHT_TPU_PALLAS_DECODER=0/1 overrides."""
    flag = os.environ.get("SPIHT_TPU_PALLAS_DECODER")
    if flag is not None:
        return flag == "1"
    if c * h * w >= 1 << 26:  # hybrid lspn packing bound (round 5)
        return False
    try:
        import jax

        # 'tpu' exactly, not merely != 'cpu': a Mosaic lowering failure
        # on another accelerator is not in the caught fallback set.
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def decode_device_with_metadata(
    data: bytes,
    n: int,
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    top_slice,
    other_slices,
) -> Tuple[np.ndarray, np.ndarray]:
    """Device decode + the per-bit decoder-state trace array.

    Routes to the fast hybrid Pallas machine + event-log expansion
    (codec/meta_expand.py) on TPU backends when the geometry is
    duplicate-parent free — the trace itself rides a compact 1-i32/bit
    log out of the kernel instead of forcing the fully sequential XLA
    machine (SPIHT_TPU_PALLAS_META=0/1 overrides)."""
    nbits = len(data) * 8
    cap_words = max((nbits + 31) // 32, 1)
    level = len(other_slices)
    flag = os.environ.get("SPIHT_TPU_PALLAS_META")
    use_fast = flag == "1" or (flag is None and _use_pallas_machine(c, h, w))
    if use_fast:
        from .meta_expand import pallas_decode_with_metadata
        from .pallas_decoder import MachineResourceLimit

        try:
            return pallas_decode_with_metadata(
                data, int(n), c, h, w, ll_h, ll_w, top_slice,
                other_slices,
            )
        except MachineResourceLimit:
            pass  # sequential XLA machine handles every geometry
    # freeze rect geometry into a hashable static arg
    rect = tuple(
        map(
            tuple,
            _rect_table(
                level, ll_h, ll_w, (top_slice, other_slices)
            ).reshape(-1, 4),
        )
    )
    fn = decode_device_fn(
        c, h, w, ll_h, ll_w, cap_words, level=level,
        rect_tab=rect, meta_rows=nbits + 1,
    )
    rec, meta = fn(_words_of(data, cap_words), nbits, int(n))
    return np.asarray(rec), np.asarray(meta)


@lru_cache(maxsize=None)
def _decode_batch_fn(c, h, w, ll_h, ll_w, cap_words):
    fn = _build_hybrid(c, h, w, ll_h, ll_w, cap_words)
    return jax.jit(jax.vmap(fn, in_axes=(0, 0, 0)))


def decode_device_batch(datas, ns, c, h, w, ll_h, ll_w):
    """Decode a batch of streams as B lockstep machines (one vmapped
    while_loop: every per-entry scalar op becomes a B-wide vector op, so
    batch throughput amortizes the TPU scalar-access latency that bounds
    a single stream).

    datas: list of bytes; ns: per-stream max_n (int or list).
    """
    B = len(datas)
    if np.isscalar(ns):
        ns = [ns] * B
    if _use_pallas_machine(c, h, w):
        # lax.map of the Pallas bit machine: far cheaper per stream
        # than the vmapped lockstep XLA machines (BASELINE.md)
        from .pallas_decoder import machine_fits, pallas_decode_batch

        cw = max(max((len(d) * 8 + 31) // 32 for d in datas), 1)
        if machine_fits(c, h, w, ll_h, ll_w, cw):
            return pallas_decode_batch(datas, ns, c, h, w, ll_h, ll_w)
        if os.environ.get(
            "SPIHT_TPU_DISABLE_HBM_MACHINES"
        ) != "1" and machine_fits(c, h, w, ll_h, ll_w, cw,
                                  geo_hbm=True):
            # 4096^2-class tier (round 5): lax.map of hybrid_hbm
            # machines (geometry table HBM-resident)
            return pallas_decode_batch(datas, ns, c, h, w, ll_h, ll_w,
                                       machine="hybrid_hbm")
    cap_words = max(
        (max((len(d) for d in datas), default=1) + 3) // 4, 1
    )
    words = np.zeros((B, cap_words), np.uint32)
    nbits = np.zeros(B, np.int32)
    for i, d in enumerate(datas):
        raw = np.frombuffer(d, dtype=np.uint8)
        words[i, : (raw.size + 3) // 4] = np.pad(
            raw, (0, -raw.size % 4)
        ).view(np.uint32)
        nbits[i] = len(d) * 8
    fn = _decode_batch_fn(c, h, w, ll_h, ll_w, cap_words)
    rec = fn(
        jnp.asarray(words), jnp.asarray(nbits),
        jnp.asarray(np.asarray(ns, np.int32)),
    )
    return np.asarray(rec)
