"""Fully device-side SPIHT bit emission (jit; no host scheduler).

Implements DESIGN_DEVICE_SCHEDULER.md end-to-end in JAX: the entire
bitstream — values AND exact emission order — is computed under one jit
from the coefficient array, using the validated closed forms:

  * event planes from the significance pyramids (M/D/G) and the
    top-down (ES, EC) entry propagation;
  * CLOSED-FORM worklist membership: an entity is in plane n's worklist
    iff its presence window [fire plane, append plane] contains n — the
    chain conditions round 1 verified per plane are already encoded in
    the propagated entry planes, so no per-plane cascade loop exists;
  * cascade roots precomputed ONCE per image: join planes are
    non-decreasing up the ancestor chain, so the plane-n root of an
    entity is the plane-independent "first ancestor with a later join
    plane", found by top-down propagation alongside ES/EC;
  * within-plane LIS order from one packed-key sort per plane over
    (worklist depth, root join keys, STATIC quadtree path) — the branch
    path is static per entity (2 bits per level), not built per plane
    (`order_prototype.predict_events_pathkey` proved the ordering
    closed form == the reference worklist order);
  * LIP / refinement orders from carried (append plane, append seq)
    keys, updated as parents fire;
  * SORTED-SPACE EMISSION: each entity's contiguous bits (LIP
    test+sign, LIS desc-test+child-tests+signs, refinement bit) are
    packed into one LSB-first bit group and embedded as payload bits
    BELOW the rank keys in the packed sort lanes (every rank key
    totally orders the present entities, so trailing payload bits
    cannot perturb the order and ride the sort for free). After the
    sort, bit offsets are exclusive cumsums of the group lengths in
    sorted order, and the whole plane is emitted by ONE fused
    scatter-add of (word, contribution) pairs into uint32 words. The
    LIP and refinement passes need no rank inversion at all — the
    carried LIP key pair (append plane, append seq) is
    order-isomorphic to the fired cell's LIP rank, so the refinement
    comparator uses it directly; only the LIS pass keeps a single
    inversion scatter to recover entity-space positions for the
    append-sequence carries.

The plane loop is a `lax.while_loop` that visits only planes
max_n..0 and exits early once the bit budget is exhausted (low-bpp
encodes touch only the top few planes).

Single image (C, H, W) with even LL dims; bit-exact against the native
kernel/oracle under jit (CPU, with and without x64 — all state int32)
and on real TPU hardware, where the 3x512x512/level-6 headline
geometry compiles and encodes bit-exactly (see BASELINE.md for
measured wall-times). The residual cost is TPU irregular-access ops
(sorts ~8ms, random gathers ~13ms per 1.7M elements on v5e): ~4 such
ops per plane remain — further reduction means moving the remaining
per-entity work into sort-carried payloads (sorted-space emission).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .maps import significance_maps, tree_height
from .planning import _static_geometry

__all__ = [
    "encode_device",
    "encode_device_fn",
    "encode_device_batch",
    "CapacityOverflow",
]

_PLANES = 32
_I32 = jnp.int32
BIG = jnp.int32(2**30)

# Default output capacity in bits per coefficient. NOT a proven worst-case
# bound (adversarial inputs — e.g. one huge magnitude per 2x2 sibling group
# at max_n=31 — can push past ~40 bits/cell), so every emit is guarded by
# `pos < cap_bits` and the jitted program returns the TRUE required length;
# the host wrapper raises CapacityOverflow instead of silently truncating.
_CAP_BITS_PER_CELL = 48


class CapacityOverflow(RuntimeError):
    """The stream needs more bits than the device buffer holds.

    Raised by the host wrappers; callers (codec/api.py) fall back to the
    host scheduler, which has no capacity limit.
    """

    def __init__(self, needed: int, cap: int):
        super().__init__(
            f"device encoder capacity exceeded: stream needs {needed} bits,"
            f" buffer holds {cap}"
        )
        self.needed = needed
        self.cap = cap


@lru_cache(maxsize=None)
def _geom(c: int, h: int, w: int, ll_h: int, ll_w: int):
    """Trace-time constants: flattened entity geometry.

    Requires even LL dims: with odd LL dims the parity child map is
    non-injective (one cell can have two tree parents — a reference-tree
    quirk; see planning.plan_supported), so the parent-gather formulation
    does not apply.
    """
    if ll_h % 2 != 0 or ll_w % 2 != 0:
        raise ValueError("device encoder requires even ll dims")
    (in_ll, initial_set, par_i, par_j, has_parent, hg_raw, _) = (
        _static_geometry(h, w, ll_h, ll_w)
    )
    K, I, J = np.meshgrid(
        np.arange(c), np.arange(h), np.arange(w), indexing="ij"
    )
    Kf = K.reshape(-1).astype(np.int32)
    If = I.reshape(-1).astype(np.int32)
    Jf = J.reshape(-1).astype(np.int32)
    flat = lambda x: np.broadcast_to(x, (c, h, w)).reshape(-1)
    in_ll_f = flat(in_ll[None])
    init_set_f = flat(initial_set[None])
    hg_f = flat(hg_raw[None])
    hp_f = flat(has_parent[None])

    ii = np.arange(h)[:, None]
    jj = np.arange(w)[None, :]
    o_i = np.where(in_ll, (ii % 2) * ll_h + (ii // 2) * 2, 2 * ii)
    o_j = np.where(in_ll, (jj % 2) * ll_w + (jj // 2) * 2, 2 * jj)
    o_i = np.broadcast_to(o_i, (h, w))
    o_j = np.broadcast_to(o_j, (h, w))
    oif, ojf = flat(o_i[None]).astype(np.int64), flat(o_j[None]).astype(np.int64)
    # flat indices of the 4 offspring (garbage where out of range; callers
    # mask by fire conditions which imply validity)
    oi_c = np.clip(oif, 0, h - 2)
    oj_c = np.clip(ojf, 0, w - 2)
    base = Kf.astype(np.int64) * h * w
    child = np.stack(
        [
            base + oi_c * w + oj_c,
            base + oi_c * w + oj_c + 1,
            base + (oi_c + 1) * w + oj_c,
            base + (oi_c + 1) * w + oj_c + 1,
        ],
        axis=1,
    ).astype(np.int32)

    pidx = (
        Kf.astype(np.int64) * h * w
        + flat(par_i[None]).astype(np.int64) * w
        + flat(par_j[None]).astype(np.int64)
    ).astype(np.int32)
    # slot of each cell within its parent's offspring block
    poif = oif[pidx]
    pojf = ojf[pidx]
    slot = ((If - poif) * 2 + (Jf - pojf)).astype(np.int32)
    slot = np.clip(slot, 0, 3)

    def raster_rank(mask):
        order = np.lexsort((Kf, Jf, If))
        sel = order[mask[order]]
        r = np.full(mask.shape, -1, np.int64)
        r[sel] = np.arange(sel.size)
        return r.astype(np.int32)

    lip_init_rank = raster_rank(in_ll_f)
    a_init_rank = raster_rank(init_set_f)
    th = tree_height(h, w, ll_h, ll_w)
    # static tree depth + packed root-relative path (2 bits per level).
    # Within one plane's cascade, the worklist (BFS) order of two
    # entities under the same root is decided by their first differing
    # child slot — i.e. by comparing these static path keys (the shared
    # prefix above the root compares equal and the suffixes have equal
    # length at equal cascade depth).
    tdepth = np.zeros(c * h * w, np.int32)
    path_abs = np.zeros(c * h * w, np.int64)
    for _ in range(th + 1):
        tdepth = np.where(hp_f, tdepth[pidx] + 1, 0).astype(np.int32)
        path_abs = np.where(hp_f, path_abs[pidx] * 4 + slot, 0)
    if int(tdepth.max(initial=0)) * 2 > 31:
        raise ValueError("tree too deep for packed int32 path keys")
    depth_max = 2 * th + 2
    return dict(
        in_ll=jnp.asarray(in_ll_f),
        init_set=jnp.asarray(init_set_f),
        hg=jnp.asarray(hg_f),
        hp=jnp.asarray(hp_f),
        child=jnp.asarray(child),
        pidx=jnp.asarray(pidx),
        slot=jnp.asarray(slot),
        lip_init_rank=jnp.asarray(lip_init_rank),
        a_init_rank=jnp.asarray(a_init_rank),
        tdepth=jnp.asarray(tdepth),
        path=jnp.asarray(path_abs.astype(np.int32)),
        bits_path=max(1, 2 * int(tdepth.max(initial=0))),
        tree_height=th,
        depth_max=depth_max,
    )


def _pack_lanes(fields, n):
    """Bit-concatenate (arr, nbits, tag) fields into minimal 31-bit int32
    sort lanes, SPLITTING fields across lane boundaries (the high
    fragment lands in the earlier lane, so lexicographic lane comparison
    equals comparison of the full concatenated bit string). Returns
    (lanes, placements, widths): placements[tag] is a list of
    (lane_idx, bits_above_in_lane, take, src_lo) fragments from which
    the field can be re-extracted after sorting.
    """
    lane_parts, widths = [], []
    cur_parts, curbits = [], 0
    placements = {}
    for arr, nb, tag in fields:
        rem = nb
        while rem > 0:
            take = min(31 - curbits, rem)
            src_lo = rem - take
            cur_parts.append((arr, take, src_lo))
            placements.setdefault(tag, []).append(
                (len(lane_parts), curbits, take, src_lo)
            )
            curbits += take
            rem -= take
            if curbits == 31:
                lane_parts.append(cur_parts)
                widths.append(curbits)
                cur_parts, curbits = [], 0
    if curbits:
        lane_parts.append(cur_parts)
        widths.append(curbits)
    lanes = []
    for parts in lane_parts:
        cur = jnp.zeros(n, _I32)
        for arr, take, src_lo in parts:
            part = (arr >> src_lo) & ((1 << take) - 1)
            cur = (cur << take) | part
        lanes.append(cur)
    return lanes, placements, widths


def _sort_payload(keys_bits, payload_bits, present):
    """Sorted-space rank: sort present entities by packed keys and return
    the payload fields IN SORTED ORDER (plus the present count).

    keys_bits / payload_bits: lists of (int32 array, bit width) pairs,
    most significant first; values are clipped to the stated width.
    REQUIREMENT: the key tuple must totally order the present entities
    (no ties) — payload bits are packed BELOW the key bits in the same
    sort lanes, so a key tie would let payload values leak into the
    order. Every caller's key ends in a distinct per-entity sequence
    field, so ties cannot occur. Absent entities sort after all present
    ones; their payload values are whatever the caller packed (callers
    mask by slot < cnt).

    TPU variadic sorts cost per operand, so embedding the payloads in
    the key lanes makes them ride the sort for free: the lane count
    (and thus the sort cost) matches what a bare argsort of the same
    keys would need once its implicit iota operand is counted.
    """
    n = keys_bits[0][0].shape[0]
    fields = [((~present).astype(_I32), 1, "_p")]
    for k, (a, nb) in enumerate(keys_bits):
        fields.append(
            (jnp.clip(a.astype(_I32), 0, (1 << nb) - 1), nb, f"_k{k}")
        )
    tags = []
    for k, (a, nb) in enumerate(payload_bits):
        t = f"v{k}"
        tags.append(t)
        fields.append(
            (jnp.clip(a.astype(_I32), 0, (1 << nb) - 1), nb, t)
        )
    lanes, plc, widths = _pack_lanes(fields, n)
    s = lax.sort(tuple(lanes), num_keys=len(lanes))
    if not isinstance(s, (tuple, list)):
        s = (s,)
    outs = []
    for t in tags:
        v = jnp.zeros(n, _I32)
        for lane, above, take, src_lo in plc[t]:
            shift = widths[lane] - above - take
            frag = (s[lane] >> shift) & ((1 << take) - 1)
            v = v | (frag << src_lo)
        outs.append(v)
    return outs, present.astype(_I32).sum()


def _build(c: int, h: int, w: int, ll_h: int, ll_w: int, cap_words: int):
    g = _geom(c, h, w, ll_h, ll_w)
    N = c * h * w
    cap_bits = cap_words * 32
    # bit-offset saturation point: beyond capacity the exact count no
    # longer matters (the stream is already invalid), so saturate the
    # accumulator to keep int32 arithmetic overflow-free. Per-plane bit
    # counts are bounded by 14*N (LIP<=2, LIS A<=9 + B<=1, refinement<=1
    # per cell, margin), so sat + 14*N must stay below 2^31.
    sat = cap_bits + (1 << 20)
    if sat + 14 * N >= 2**31:
        raise ValueError(
            "device encoder geometry too large for int32 bit offsets"
        )

    def encode(arr, max_n, max_bits):
        arr = arr.astype(_I32)
        af = arr.reshape(-1)
        m, d, gg = significance_maps(arr, ll_h, ll_w)
        M = m.reshape(-1).astype(_I32)
        D = d.reshape(-1).astype(_I32)
        G = gg.reshape(-1).astype(_I32)
        max_n = jnp.asarray(max_n, _I32)
        max_bits = jnp.asarray(max_bits, _I32)

        INF = max_n + 1
        idxN = jnp.arange(N, dtype=_I32)

        # ---- ES / EC propagation -----------------------------------------
        es = jnp.where(g["init_set"], max_n, -1)
        for _ in range(tree_height(h, w, ll_h, ll_w)):
            pes = es[g["pidx"]]
            pg = G[g["pidx"]]
            child_es = jnp.where(
                g["hp"] & (pes >= 0) & g["hg"][g["pidx"]] & (pg >= 0), pg, -1
            )
            es = jnp.where(g["init_set"], max_n, child_es)
        pes = es[g["pidx"]]
        pd = D[g["pidx"]]
        ec = jnp.where(g["hp"] & (pes >= 0) & (pd >= 0), pd, -1)

        a_exists = g["init_set"] | (es >= 0)
        a_appendP = jnp.where(g["init_set"], INF, es)
        a_fire = jnp.where(a_exists, D, -2)
        b_exists = a_exists & (D >= 0) & g["hg"]
        b_appendP = jnp.where(b_exists, D, BIG * 0 - 2)
        b_fire = jnp.where(b_exists, G, -2)

        lip_added = (ec >= 0) & (M < ec)
        lip_exists = g["in_ll"] | lip_added
        lip_appendP = jnp.where(
            g["in_ll"], INF, jnp.where(lip_added, ec, -2)
        )
        lip_hi = jnp.where(g["in_ll"], max_n, ec - 1)
        sig = (g["in_ll"] | (ec >= 0)) & (M >= 0)

        # number of sign bits among the 4 offspring when a set fires at D
        child_M = M[g["child"]]  # (N, 4)
        child_neg = af[g["child"]] >= 0  # (N, 4) static per image

        # ---- cascade roots, precomputed once per image -------------------
        # Join planes are non-decreasing up the worklist-ancestor chain
        # (an entity enters LIS no later than the entry that appends it),
        # so the plane-n cascade root of entity e — the first ancestor
        # instance appended at a plane > n — equals the first ancestor
        # with appendP > appendP(e), a PLANE-INDEPENDENT instance R(e).
        # Propagate (R, its appendP, its tdepth, its type) top-down once;
        # the per-plane cascade loop (the round-1 hot spot: ~3 random
        # gathers x tree_height per plane) disappears entirely.
        th = g["tree_height"]
        aPb_p = b_appendP[g["pidx"]]
        td_p = g["tdepth"][g["pidx"]]
        pidxN = g["pidx"] + N

        def root_prop(_, st):
            R_a, PR_a, tdR_a, TR_a = st
            cond_b = a_appendP > b_appendP  # A-inst of same node is root
            R_b = jnp.where(cond_b, idxN, R_a)
            PR_b = jnp.where(cond_b, a_appendP, PR_a)
            tdR_b = jnp.where(cond_b, g["tdepth"], tdR_a)
            TR_b = jnp.where(cond_b, 0, TR_a)
            cond_a = aPb_p > a_appendP  # parent B-inst is root
            R_a = jnp.where(cond_a, pidxN, R_b[g["pidx"]])
            PR_a = jnp.where(cond_a, aPb_p, PR_b[g["pidx"]])
            tdR_a = jnp.where(cond_a, td_p, tdR_b[g["pidx"]])
            TR_a = jnp.where(cond_a, 1, TR_b[g["pidx"]])
            return R_a, PR_a, tdR_a, TR_a, R_b, PR_b, tdR_b, TR_b

        z = jnp.zeros(N, _I32)
        st = (z, z, z, z)
        for _ in range(th + 1):
            out8 = root_prop(None, st)
            st = out8[:4]
        R_a, PR_a, tdR_a, TR_a, R_b, PR_b, tdR_b, TR_b = out8
        R2 = jnp.concatenate([R_a, R_b])
        PR2 = jnp.concatenate([PR_a, PR_b])
        tdR2 = jnp.concatenate([tdR_a, tdR_b])
        TR2 = jnp.concatenate([TR_a, TR_b])
        aP2 = jnp.concatenate([a_appendP, b_appendP])
        td2 = jnp.concatenate([g["tdepth"], g["tdepth"]])
        typ2 = jnp.concatenate([jnp.zeros(N, _I32), jnp.ones(N, _I32)])
        inst2 = jnp.arange(2 * N, dtype=_I32)
        path2 = jnp.concatenate([g["path"], g["path"]])
        # hoisted parent data for the LIP/LSP append-key updates
        aFIRE_p = a_fire[g["pidx"]]
        aEX_p = a_exists[g["pidx"]]
        aES_p = jnp.where(
            g["init_set"][g["pidx"]], max_n, es[g["pidx"]]
        )

        # ---- plane loop ---------------------------------------------------
        # carries: append sequences (set when appended), LSP keys, output
        words0 = jnp.zeros(cap_words, jnp.uint32)
        carry0 = dict(
            i=jnp.zeros((), _I32),
            a_S=jnp.where(g["init_set"], g["a_init_rank"], -1).astype(_I32),
            b_S=jnp.full(N, -1, _I32),
            lip_S=jnp.where(g["in_ll"], g["lip_init_rank"], -1).astype(_I32),
            lsp_phase=jnp.full(N, 0, _I32),
            lsp_S=jnp.full(N, 0, _I32),
            off=jnp.zeros((), _I32),
            words=words0,
        )
        # packed sort-key widths (trace-time python ints)
        bits_S = max((2 * N - 1).bit_length(), 1)  # worklist positions < 2N
        bits_listS = max((8 * N + 3).bit_length(), 1)  # list keys < 8N+4
        bits_path = g["bits_path"]

        limit = jnp.minimum(max_bits, jnp.asarray(cap_bits, _I32))

        def group_parts(off_s, group_s, lo_only=False):
            """Sorted-space bit-group emission: one (<=9-bit) group per
            sorted slot at monotone bit offsets -> (word idx, uint32
            contrib) scatter operands for the low word and (unless
            lo_only) the high word the group may straddle. Callers mask
            absent slots by zeroing their group; per-bit budget/capacity
            truncation keeps only bits below `limit` (matching the
            per-bit `pos < max_bits & pos < cap_bits` guard of the
            scalar formulation)."""
            keep = jnp.clip(limit - off_s, 0, 16)
            grp = group_s & ((1 << keep) - 1)
            grp = grp.astype(jnp.uint32)
            # offsets are monotone in sorted space, so the word indices
            # are nondecreasing: clip (instead of redirecting masked
            # entries to word 0) keeps them sorted, letting the scatter
            # use XLA's sorted-indices path. Out-of-range bits were
            # already zeroed by the budget mask above.
            w = jnp.clip(off_s >> 5, 0, cap_words - 1)
            sh = (off_s & 31).astype(jnp.uint32)
            lo = grp << sh
            parts = [(w, lo)]
            if not lo_only:
                # groups are <16 bits, so grp >> 31 == 0 covers sh == 0
                hi = grp >> (jnp.uint32(32) - jnp.maximum(sh, 1))
                parts.append((jnp.clip(w + 1, 0, cap_words - 1), hi))
            return parts

        def body(carry):
            i = carry["i"]
            n = max_n - i
            off = carry["off"]
            words = carry["words"]
            parts = []

            # ---------------- LIP pass ----------------
            lp = (
                lip_exists
                & (jnp.maximum(M, 0) <= n)
                & (n <= lip_hi)
                & (carry["lip_S"] >= 0)
            )
            fires_lip = lp & (M == n)
            # bit group per cell: [test, sign-if-firing]; LSB = first
            # stream bit
            lip_group = (lp & (M >= n)).astype(_I32) | jnp.where(
                fires_lip & (af >= 0), 2, 0
            )
            (g_s, f_s), lip_cnt = _sort_payload(
                [(40 - lip_appendP, 6), (carry["lip_S"], bits_listS)],
                [(lip_group, 2), (fires_lip.astype(_I32), 1)],
                lp,
            )
            v_s = jnp.arange(N, dtype=_I32) < lip_cnt
            glen_s = jnp.where(v_s, 1 + f_s, 0)
            off_s = off + jnp.cumsum(glen_s, dtype=_I32) - glen_s
            parts += group_parts(off_s, jnp.where(v_s, g_s, 0))
            lip_bits = lip_cnt + jnp.sum(fires_lip, dtype=_I32)
            off = jnp.minimum(off + lip_bits, sat)
            lsp_phase = carry["lsp_phase"]
            lsp_S = carry["lsp_S"]

            # ---------------- LIS pass ----------------
            a_pres = (
                a_exists
                & (jnp.maximum(a_fire, 0) <= n)
                & (n <= jnp.where(g["init_set"], max_n, es))
            )
            b_pres = (
                b_exists & (jnp.maximum(b_fire, 0) <= n) & (n <= b_appendP)
            )
            a_fireN = a_pres & (a_fire == n)

            # Worklist membership is closed-form: an entity is in this
            # plane's worklist iff it is present (its append plane has
            # arrived and it has not yet fired away) — the chain
            # conditions are already encoded in the propagated ES/EC
            # planes. Roots/depths come from the precomputed per-image
            # arrays; the only dynamic random access left is one gather
            # for the root append-sequence keys.
            in_a, in_b = a_pres, b_pres
            in2 = jnp.concatenate([in_a, in_b])
            selfroot = aP2 > n
            S2all = jnp.concatenate([carry["a_S"], carry["b_S"]])
            SR = S2all[R2]
            rootP = jnp.where(selfroot, aP2, PR2)
            rootS = jnp.where(selfroot, S2all, SR)
            rootT = jnp.where(selfroot, typ2, TR2)
            tdR_eff = jnp.where(selfroot, td2, tdR2)
            # worklist (BFS) depth: A instance of a node k levels below
            # its root sits at 2k - [root is a B entry]; its B instance
            # one deeper; roots are depth 0 (uniform via typ2 - rootT).
            depth2 = 2 * (td2 - tdR_eff) + typ2 - rootT

            # per-entity bit counts and LSB-first bit groups:
            # A: [desc test, per child: test, sign-if-firing]; B: [l-sig]
            signs = jnp.where(
                a_fireN, (child_M == n).sum(axis=1).astype(_I32), 0
            )
            a_bits = jnp.where(in_a, 1 + jnp.where(a_fireN, 4 + signs, 0), 0)
            b_bits = jnp.where(in_b, 1, 0)
            bits2 = jnp.concatenate([a_bits, b_bits])
            child_sign = (child_M == n) & a_fireN[:, None]
            child_sz = 1 + child_sign.astype(_I32)
            intra = jnp.cumsum(child_sz, axis=1, dtype=_I32) - child_sz  # (N, 4)
            a_group = (in_a & (D >= n)).astype(_I32)
            for s in range(4):
                t = (child_M[:, s] >= n) & a_fireN
                a_group = a_group | (t.astype(_I32) << (1 + intra[:, s]))
                sgn = child_sign[:, s] & child_neg[:, s]
                a_group = a_group | (sgn.astype(_I32) << (2 + intra[:, s]))
            b_group = (in_b & (G >= n)).astype(_I32)
            group2 = jnp.concatenate([a_group, b_group])

            (g2_s, gl2_s, idx_s), _ = _sort_payload(
                [
                    (depth2, 6),
                    (40 - rootP, 6),
                    (rootS * 2 + rootT, bits_S + 1),
                    (path2, bits_path),
                ],
                [(group2, 9), (bits2, 4), (inst2, bits_S)],
                in2,
            )
            # entity-space positions (append-sequence carries need them):
            # the one remaining rank-inversion scatter
            pos2 = jnp.zeros(2 * N, _I32).at[idx_s].set(
                jnp.arange(2 * N, dtype=_I32)
            )
            a_pos = pos2[:N]
            b_pos = pos2[N:]
            # absent slots carry bits2 == 0, so the cumsum is unpolluted
            off2_s = off + jnp.cumsum(gl2_s, dtype=_I32) - gl2_s
            parts += group_parts(off2_s, g2_s)
            lis_bits = jnp.sum(bits2, dtype=_I32)

            # carries for appended entities: appendS = processing position
            a_appN = a_exists & (a_appendP == n)
            b_appN = b_exists & (b_appendP == n)
            a_S = jnp.where(a_appN & in_a, a_pos, carry["a_S"])
            b_S = jnp.where(b_appN & in_b, b_pos, carry["b_S"])
            # LIP additions: non-significant offspring of A fires
            parent_fire = aEX_p & (aFIRE_p == n) & (n <= aES_p)
            added_now = lip_added & (ec == n) & parent_fire
            lip_S = jnp.where(
                added_now,
                a_pos[g["pidx"]] * 4 + g["slot"],
                carry["lip_S"],
            )
            # straight-to-LSP offspring (phase 1)
            to_lsp = (ec == n) & (M == n) & parent_fire
            lsp_phase = jnp.where(to_lsp, 1, lsp_phase)
            lsp_S = jnp.where(
                to_lsp, a_pos[g["pidx"]] * 4 + g["slot"], lsp_S
            )
            off = jnp.minimum(off + lis_bits, sat)

            # ---------------- refinement ----------------
            # LSP order key: refinement runs in append order — by fire
            # plane (max_n - M), LIP-fired (phase 0) before LIS-fired
            # (phase 1) within a plane. Phase-0 cells were ordered by
            # their LIP rank at the fire plane; the carried LIP sort key
            # (lip_appendP, lip_S) is stable from append to fire and
            # order-isomorphic to that rank, so no per-plane LIP rank
            # inversion is ever needed. Phase-1 cells use the recorded
            # (parent position * 4 + slot) append key.
            rp = sig & (M > n)
            ref_bit = rp & (((jnp.abs(af) >> n) & 1) == 1)
            k1 = jnp.where(lsp_phase == 0, 40 - lip_appendP, 0)
            k2 = jnp.where(lsp_phase == 0, lip_S, lsp_S)
            (rb_s,), r_cnt = _sort_payload(
                [
                    (max_n - M, 5),
                    (lsp_phase, 1),
                    (k1, 6),
                    (k2, bits_listS),
                ],
                [(ref_bit.astype(_I32), 1)],
                rp,
            )
            # 1-bit groups at dense offsets; absent slots carry bit 0
            off_r = off + jnp.arange(N, dtype=_I32)
            parts += group_parts(off_r, rb_s, lo_only=True)
            off = jnp.minimum(off + r_cnt, sat)

            # 5 sorted scatter-adds (each channel's word indices are
            # nondecreasing — see group_parts)
            for wd, contrib in parts:
                words = words.at[wd].add(contrib, indices_are_sorted=True)

            return dict(
                i=i + 1, a_S=a_S, b_S=b_S, lip_S=lip_S,
                lsp_phase=lsp_phase, lsp_S=lsp_S, off=off.astype(_I32),
                words=words,
            )

        # planes run max_n..0 and stop early once the bit budget is
        # exhausted (low-bpp encodes touch only the top few planes)
        out = lax.while_loop(
            lambda c: (c["i"] <= max_n) & (c["off"] < max_bits),
            body,
            carry0,
        )
        total = jnp.minimum(out["off"], max_bits).astype(_I32)
        # in-budget bits beyond the buffer were dropped by emit's
        # `pos < cap_bits` guard -> the stream is invalid; flag it
        overflow = total > cap_bits
        return out["words"], total, overflow

    return encode


def _cap_words(c: int, h: int, w: int, bits_per_cell: int) -> int:
    cap_bits = c * h * w * bits_per_cell + 1024
    return (cap_bits + 31) // 32


@lru_cache(maxsize=None)
@lru_cache(maxsize=None)
def _max_n_thresholds() -> tuple:
    """Per-exponent mantissa threshold where float32 log2 truncation
    jumps to e+1.

    The reference computes max_n as ``(max as f32).log2() as u8``
    (encoder_decoder.rs:165-167). For mf with unbiased exponent e the
    correctly-rounded f32 log2 lies in [e, e+1] — and at the top of a
    binade it reaches e+1.0 EXACTLY (e.g. the largest f32 below 8
    has log2 == 3.0 in f32), so the truncated result is e+1, not e.
    The jump point is a single mantissa threshold per exponent; binary
    search against numpy's f32 log2 (bit-matching libm) finds it
    exactly, so the device computation needs no transcendental at all.
    """
    th = []
    for e in range(32):
        lo, hi = 0, 1 << 23
        while lo < hi:
            mid = (lo + hi) // 2
            x = np.array([((e + 127) << 23) | mid], np.uint32).view(
                np.float32
            )[0]
            if float(np.log2(x)) >= e + 1:
                hi = mid
            else:
                lo = mid + 1
        th.append(lo)
    return tuple(th)


def device_max_n(arr):
    """max_n on device, bit-exact vs oracle.compute_max_n.

    f32-convert the abs max (round-to-nearest, same as the host cast),
    then read the exponent and compare the mantissa against the
    precomputed log2-truncation threshold — integer ops only.
    """
    m = jnp.abs(arr).max().astype(jnp.int32)
    mf = m.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(mf, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m23 = bits & 0x7FFFFF
    th = jnp.asarray(_max_n_thresholds(), jnp.int32)
    n = e + (m23 >= th[jnp.clip(e, 0, 31)]).astype(jnp.int32)
    return jnp.where(m <= 0, 0, jnp.clip(n, 0, 255)).astype(jnp.int32)


def encode_device_fn(
    c: int,
    h: int,
    w: int,
    ll_h: int,
    ll_w: int,
    bits_per_cell: int = _CAP_BITS_PER_CELL,
):
    """Jitted device encoder for a given geometry.

    Returns fn(arr_i32, max_n, max_bits) -> (uint32 words LSB-first,
    total_bits, overflow). `overflow` true means in-budget bits did not
    fit the buffer and were dropped — the stream is invalid and callers
    must fall back (see CapacityOverflow).
    """
    cw = _cap_words(c, h, w, bits_per_cell)
    return jax.jit(_build(c, h, w, ll_h, ll_w, cw))


def encode_device(
    arr: np.ndarray, ll_h: int, ll_w: int, max_bits: int
) -> Tuple[bytes, int]:
    """Host-facing wrapper: full device-side encode -> (bytes, max_n).

    max_n follows the reference f32 rule (computed on host from the
    array's max magnitude; see oracle.compute_max_n).
    """
    from .oracle import compute_max_n

    arr = np.ascontiguousarray(arr, dtype=np.int32)
    c, h, w = arr.shape
    if _use_pallas_emitter(c, h, w):
        # Pallas sequential emission machine: ~15x the sorted-space
        # formulation at the 1 bpp production point on hardware
        # (BASELINE.md), works at odd-LL geometries, compiles in
        # seconds. Overflow falls through to the sorted/native path.
        from .pallas_encoder import (
            EncCapacityOverflow, MachineResourceLimit, pallas_encode,
        )

        try:
            return pallas_encode(arr, ll_h, ll_w, max_bits)
        except (EncCapacityOverflow, MachineResourceLimit):
            pass
    max_n = compute_max_n(arr)
    fn = encode_device_fn(c, h, w, ll_h, ll_w)
    words, total, overflow = fn(
        jnp.asarray(arr), max_n, min(int(max_bits), 2**31 - 2)
    )
    total = int(total)
    if bool(overflow):
        raise CapacityOverflow(
            total, _cap_words(c, h, w, _CAP_BITS_PER_CELL) * 32
        )
    nbytes = (total + 7) // 8
    data = np.asarray(words).view(np.uint8)[:nbytes].tobytes()
    # zero any pad bits beyond total in the final byte (emit() only wrote
    # in-budget bits, so the tail is already zero)
    return data, max_n


def _use_pallas_emitter(c: int, h: int, w: int) -> bool:
    """Route plain device encode to the Pallas bit machine on real TPU
    backends; CPU keeps the sorted-space XLA formulation (Mosaic
    interpret mode is for tests). SPIHT_TPU_PALLAS_ENCODER=0/1
    overrides."""
    flag = os.environ.get("SPIHT_TPU_PALLAS_ENCODER")
    if flag is not None:
        return flag == "1"
    if c * h * w >= 1 << 24:
        return False
    try:
        # 'tpu' exactly, not merely != 'cpu': on another accelerator a
        # Mosaic lowering failure is not in the caught fallback set and
        # would crash encode_device instead of falling through.
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@lru_cache(maxsize=None)
def _encode_device_batch_fn(c: int, h: int, w: int, ll_h: int, ll_w: int):
    fn = _build(c, h, w, ll_h, ll_w, _cap_words(c, h, w, _CAP_BITS_PER_CELL))
    return jax.jit(jax.vmap(fn, in_axes=(0, 0, 0)))


def encode_device_batch(arrs: np.ndarray, ll_h: int, ll_w: int, max_bits):
    """Batched device-side encode: (B, C, H, W) i32 -> list[(bytes, max_n)].

    One jitted program (vmap over the single-image encoder). max_bits:
    scalar or per-image sequence.
    """
    from .oracle import compute_max_n

    arrs = np.ascontiguousarray(arrs, dtype=np.int32)
    B, c, h, w = arrs.shape
    if _use_pallas_emitter(c, h, w):
        # lax.map of the Pallas bit machine: ~10x the vmapped XLA
        # lockstep machines per stream on hardware (BASELINE.md)
        from .pallas_encoder import (
            EncCapacityOverflow, MachineResourceLimit, pallas_encode_batch,
        )

        try:
            return pallas_encode_batch(arrs, ll_h, ll_w, max_bits)
        except (EncCapacityOverflow, MachineResourceLimit):
            pass
    if np.isscalar(max_bits):
        mbs = np.full(B, min(int(max_bits), 2**31 - 2), np.int32)
    else:
        mbs = np.array(
            [min(int(m), 2**31 - 2) for m in max_bits], np.int32
        )
    mns = np.array([compute_max_n(a) for a in arrs], np.int32)
    fn = _encode_device_batch_fn(c, h, w, ll_h, ll_w)
    words, totals, overflows = fn(
        jnp.asarray(arrs), jnp.asarray(mns), jnp.asarray(mbs)
    )
    words = np.asarray(words)
    totals = np.asarray(totals)
    overflows = np.asarray(overflows)
    if overflows.any():
        b = int(np.argmax(overflows))
        raise CapacityOverflow(
            int(totals[b]), _cap_words(c, h, w, _CAP_BITS_PER_CELL) * 32
        )
    out = []
    for b in range(B):
        t = int(totals[b])
        nbytes = (t + 7) // 8
        out.append((words[b].view(np.uint8)[:nbytes].tobytes(), int(mns[b])))
    return out
