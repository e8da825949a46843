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

Queue capacities are exact, not heuristic: a cell is in LIP at most once
concurrently (<= N), LIS holds at most one A and one B instance per node
(<= 2N), LSP appends each cell once (<= N). Per plane the LIP/LIS queues
use double buffers (process one, write retained entries to the other);
same-pass LIS appends go to the tail of the buffer being processed,
which is exactly the reference's worklist order.
"""

from __future__ import annotations

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
    )


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
    rect_tab: Optional[Tuple],
    cap_words: int,
    meta_rows: int,
):
    """Construct the jitted sequential decode machine.

    Returns fn(words_u32[cap_words], nbits, max_n) ->
    (rec_i32[c*h*w], meta_i32[meta_rows, 8]).
    `meta_rows` 0 disables the trace (plain decode).
    """
    if c * h * w >= 1 << 24:
        raise ValueError("geometry too large for packed queue entries")
    g = _dec_geom(c, h, w, ll_h, ll_w)
    N = c * h * w
    HW = h * w
    with_meta = meta_rows > 0
    if rect_tab is not None:
        rtab = jnp.asarray(np.asarray(rect_tab, np.int32).reshape(
            level + 1, 4, 4
        ))
    else:
        rtab = jnp.asarray(_rect_table(level, ll_h, ll_w, None))
    LIP_CAP = N + 1
    LIS_CAP = 2 * N + 1
    PH_LIP, PH_LIS, PH_REF = 0, 1, 2

    lip_init = _pack(
        jnp.asarray(g["lip_init"]), jnp.int32(0), jnp.int32(_F_LL),
        jnp.int32(level),
    )
    lis_init = _pack(
        jnp.asarray(g["lis_init"]), jnp.int32(1), jnp.int32(_F_LL),
        jnp.int32(level),
    )

    def decode(words, nbits, max_n):
        nbits = jnp.asarray(nbits, _I32)
        max_n = jnp.asarray(max_n, _I32)

        lipA = jnp.zeros(LIP_CAP, _I32).at[: lip_init.shape[0]].set(lip_init)
        lipB = jnp.zeros(LIP_CAP, _I32)
        lisA = jnp.zeros(LIS_CAP, _I32).at[: lis_init.shape[0]].set(lis_init)
        lisB = jnp.zeros(LIS_CAP, _I32)
        lsp = jnp.zeros(N + 1, _I32)

        st = dict(
            rec=jnp.zeros(N, _I32),
            meta=jnp.zeros((max(meta_rows, 1), 8), _I32),
            lipA=lipA, lipB=lipB,
            lip_cnt=jnp.asarray(lip_init.shape[0], _I32),  # in lipA
            lip_i=jnp.zeros((), _I32),      # read head in lipA
            lip_w=jnp.zeros((), _I32),      # write head in lipB (retained)
            lip_add=jnp.zeros((), _I32),    # adds go after retained; count
            lisA=lisA, lisB=lisB,
            lis_cnt=jnp.asarray(lis_init.shape[0], _I32),
            lis_i=jnp.zeros((), _I32),
            lis_w=jnp.zeros((), _I32),
            lsp=lsp,
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

        def note(st, action, node, filt, depth):
            """Write the metadata row for the bit about to be consumed
            (row index == cur; the reference writes the row even when the
            stream then runs out, giving the final partial row)."""
            if not with_meta:
                return st
            cur = st["cur"]
            k = node // HW
            i = (node % HW) // w
            j = node % w
            r = rtab[depth, filt]
            f2 = jnp.float32
            lh = (f2(i) - f2(r[0])) / f2(r[1])
            lw = (f2(j) - f2(r[2])) / f2(r[3])
            # The reference rounds the f32 product BEFORE subtracting.
            # XLA's CPU backend contracts mul+sub into an FMA whose
            # infinitely-precise intermediate flips truncation edges
            # (e.g. -20000 -> -19999); optimization_barrier and bitcast
            # round-trips get simplified away, but an intervening
            # value-preserving `min` op blocks the contraction.
            big = f2(3e38)
            th_ = jnp.minimum(lh * f2(200000.0), big)
            tw_ = jnp.minimum(lw * f2(200000.0), big)
            lh = (th_ - f2(100000.0)).astype(_I32)
            lw = (tw_ - f2(100000.0)).astype(_I32)
            row = jnp.stack(
                [action, lh, lw, k, filt, depth, st["n"],
                 st["rec"][node]]
            ).astype(_I32)
            # the row for the bit whose pop FAILS is still written (the
            # reference's final partial row) — but once the machine is
            # dead, later unrolled note() calls must not overwrite it
            ok = (cur < meta_rows) & ~st["dead"]
            idx = jnp.clip(cur, 0, meta_rows - 1)
            meta = st["meta"].at[idx].set(
                jnp.where(ok, row, st["meta"][idx])
            )
            return {**st, "meta": meta}

        def pop(st):
            """(value, exhausted). Advances cur when in range."""
            cur = st["cur"]
            ok = cur < nbits
            v = bit_at(jnp.clip(cur, 0, jnp.maximum(nbits - 1, 0))) & ok
            st = {**st, "cur": jnp.where(ok, cur + 1, cur),
                  "dead": st["dead"] | ~ok}
            return st, v, ~ok

        def base_val(st, sign_bit):
            n = st["n"]
            mag = jnp.where(n == 0, 1, (1 << jnp.maximum(n - 1, 0)) + (1 << n))
            return jnp.where(sign_bit, mag, -mag).astype(_I32)

        def lip_entry(st):
            e = st["lipA"][st["lip_i"]]
            node, _, filt, depth = unpack(e)
            st = note(st, _A_LIP, node, filt, depth)
            st, sig, out = pop(st)

            def fired(st):
                st = note(st, _A_LIPSIGN, node, filt, depth)
                st, sbit, out2 = pop(st)

                def commit(st):
                    rec = st["rec"].at[node].set(base_val(st, sbit))
                    lsp = st["lsp"].at[st["lsp_cnt"]].set(e)
                    return {**st, "rec": rec, "lsp": lsp,
                            "lsp_cnt": st["lsp_cnt"] + 1}

                return lax.cond(out2, lambda s: s, commit, st)

            def retained(st):
                lipB = st["lipB"].at[st["lip_w"]].set(e)
                return {**st, "lipB": lipB, "lip_w": st["lip_w"] + 1}

            st = lax.cond(
                out, lambda s: s,
                lambda s: lax.cond(sig, fired, retained, s), st,
            )
            return {**st, "lip_i": st["lip_i"] + 1}

        def lis_a_entry(st, e, node, filt, depth):
            st = note(st, _A_DESC, node, filt, depth)
            st, dsig, out = pop(st)

            def fired(st):
                cfilt = jnp.where(
                    filt == _F_LL, g["llcf"][node], filt
                ).astype(_I32)
                c0 = g["child0"][node]
                hc = g["has_child"][node]

                def child(st, cn):
                    st = note(st, _A_OFF, cn, cfilt, jnp.maximum(depth - 1, 0))
                    st, sig, out2 = pop(st)

                    def csig(st):
                        st = note(st, _A_OFFSIGN, cn, cfilt, jnp.maximum(depth - 1, 0))
                        st, sbit, out3 = pop(st)

                        def commit(st):
                            rec = st["rec"].at[cn].set(base_val(st, sbit))
                            ce = _pack(cn, jnp.int32(0), cfilt, jnp.maximum(depth - 1, 0))
                            lsp = st["lsp"].at[st["lsp_cnt"]].set(ce)
                            return {**st, "rec": rec, "lsp": lsp,
                                    "lsp_cnt": st["lsp_cnt"] + 1}

                        return lax.cond(out3, lambda s: s, commit, st)

                    def cinsig(st):
                        ce = _pack(cn, jnp.int32(0), cfilt, jnp.maximum(depth - 1, 0))
                        # new LIP entries go after this plane's retained
                        pos = st["lip_w"] + st["lip_add"]
                        lipB = st["lipB"].at[pos].set(ce)
                        return {**st, "lipB": lipB,
                                "lip_add": st["lip_add"] + 1}

                    return lax.cond(
                        out2, lambda s: s,
                        lambda s: lax.cond(sig, csig, cinsig, s), st,
                    )

                def run_children(st):
                    st = child(st, c0)
                    st = child(st, c0 + 1)
                    st = child(st, c0 + w)
                    st = child(st, c0 + w + 1)
                    return st

                st = lax.cond(hc, run_children, lambda s: s, st)

                def reappend(st):
                    # type-B re-entry at the tail of the live buffer:
                    # processed in this same pass (reference worklist)
                    be = _pack(node, jnp.int32(0), filt, depth)
                    lisA = st["lisA"].at[st["lis_cnt"]].set(be)
                    return {**st, "lisA": lisA,
                            "lis_cnt": st["lis_cnt"] + 1}

                return lax.cond(
                    g["hg"][node] & ~st["dead"], reappend, lambda s: s, st
                )

            def retained(st):
                lisB = st["lisB"].at[st["lis_w"]].set(e)
                return {**st, "lisB": lisB, "lis_w": st["lis_w"] + 1}

            return lax.cond(
                out, lambda s: s,
                lambda s: lax.cond(dsig, fired, retained, s), st,
            )

        def lis_b_entry(st, e, node, filt, depth):
            st = note(st, _A_LSIG, node, filt, depth)
            st, lsig, out = pop(st)

            def fired(st):
                cfilt = jnp.where(
                    filt == _F_LL, g["llcf"][node], filt
                ).astype(_I32)
                c0 = g["child0"][node]
                hc = g["has_child"][node]

                def app(st):
                    cnt = st["lis_cnt"]
                    lisA = st["lisA"]
                    for dch in (0, 1, w, w + 1):
                        ce = _pack(
                            c0 + dch, jnp.int32(1), cfilt,
                            jnp.maximum(depth - 1, 0),
                        )
                        lisA = lisA.at[cnt].set(ce)
                        cnt = cnt + 1
                    return {**st, "lisA": lisA, "lis_cnt": cnt}

                return lax.cond(hc, app, lambda s: s, st)

            def retained(st):
                lisB = st["lisB"].at[st["lis_w"]].set(e)
                return {**st, "lisB": lisB, "lis_w": st["lis_w"] + 1}

            return lax.cond(
                out, lambda s: s,
                lambda s: lax.cond(lsig, fired, retained, s), st,
            )

        def lis_entry(st):
            e = st["lisA"][st["lis_i"]]
            node, typ, filt, depth = unpack(e)
            st = lax.cond(
                typ == 1,
                lambda s: lis_a_entry(s, e, node, filt, depth),
                lambda s: lis_b_entry(s, e, node, filt, depth),
                st,
            )
            return {**st, "lis_i": st["lis_i"] + 1}

        def ref_entry(st):
            e = st["lsp"][st["ref_i"]]
            node, _, filt, depth = unpack(e)
            st = note(st, _A_REF, node, filt, depth)
            st, b, out = pop(st)

            def commit(st):
                x = st["rec"][node]
                mag = jnp.abs(x)
                n = st["n"]
                mag = jnp.where(
                    b, mag | (1 << n), mag & ~(1 << n)
                )
                v = jnp.where(x >= 0, mag, -mag).astype(_I32)
                return {**st, "rec": st["rec"].at[node].set(v)}

            st = lax.cond(out, lambda s: s, commit, st)
            return {**st, "ref_i": st["ref_i"] + 1}

        def step(st):
            ph = st["phase"]

            def do_lip(st):
                def adv(st):
                    return {**st, "phase": jnp.asarray(PH_LIS, _I32)}

                return lax.cond(
                    st["lip_i"] >= st["lip_cnt"], adv, lip_entry, st
                )

            def do_lis(st):
                def adv(st):
                    return {**st, "phase": jnp.asarray(PH_REF, _I32)}

                return lax.cond(
                    st["lis_i"] >= st["lis_cnt"], adv, lis_entry, st
                )

            def do_ref(st):
                def plane_done(st):
                    done = st["n"] == 0
                    # swap buffers: retained(+adds) become next plane's
                    # queues; reset heads, snapshot LSP
                    return {
                        **st,
                        "lipA": st["lipB"], "lipB": st["lipA"],
                        "lip_cnt": st["lip_w"] + st["lip_add"],
                        "lip_i": jnp.zeros((), _I32),
                        "lip_w": jnp.zeros((), _I32),
                        "lip_add": jnp.zeros((), _I32),
                        "lisA": st["lisB"], "lisB": st["lisA"],
                        "lis_cnt": st["lis_w"],
                        "lis_i": jnp.zeros((), _I32),
                        "lis_w": jnp.zeros((), _I32),
                        "ref_i": jnp.zeros((), _I32),
                        "lsp_snap": st["lsp_cnt"],
                        "n": jnp.maximum(st["n"] - 1, 0),
                        "phase": jnp.asarray(PH_LIP, _I32),
                        "done": done,
                    }

                return lax.cond(
                    st["ref_i"] >= st["lsp_snap"], plane_done, ref_entry, st
                )

            return lax.switch(ph, [do_lip, do_lis, do_ref], st)

        st = {**st, "lsp_snap": jnp.zeros((), _I32)}
        out = lax.while_loop(
            lambda s: ~(s["dead"] | s["done"]), step, st
        )
        return out["rec"].reshape(c, h, w), out["meta"]

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
    fn = decode_device_fn(c, h, w, ll_h, ll_w, cap_words)
    rec, _ = fn(_words_of(data, cap_words), nbits, int(n))
    return np.asarray(rec)


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
    """Device decode + the per-bit decoder-state trace array."""
    nbits = len(data) * 8
    cap_words = max((nbits + 31) // 32, 1)
    level = len(other_slices)
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
