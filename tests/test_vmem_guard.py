"""VMEM-budget routing guard for the Pallas bit machines.

The machines keep all queue/table state VMEM-resident; geometries whose
state exceeds the budget (or the 1<<24 packed-entry bound) must fall
back to the XLA formulations instead of failing Mosaic compilation
minutes into a remote compile.

Guard intent (round 3/4): the DECODER's hybrid machine has no N-sized
value tables (rec materializes outside the kernel), so with budget-
narrowed queue capacities it admits 2048^2-class geometries at bounded
bit budgets.  The ENCODER carries 3 N-sized tables and does not.
Hardware anchors in BASELINE.md.

The guards are CLOSED-FORM (tree_bounds.queue_bounds): they must answer
in microseconds at any geometry and agree exactly with the table-built
bounds the kernel builders use (round-3 verdict item 5: the old guards
materialized full geometry tables and took >100 s at 2048^2).
"""

import time

import numpy as np
import pytest

from spiht_tpu.codec import pallas_decoder, pallas_encoder
from spiht_tpu.codec.tree_bounds import queue_bounds
from spiht_tpu.native import runtime

pytestmark = pytest.mark.skipif(
    runtime.load() is None, reason="native kernel unavailable"
)


def test_vmem_estimates_gate_by_geometry():
    # headline geometry (3x537x537/L6) fits comfortably
    assert pallas_encoder.machine_fits(3, 537, 537, 9, 9, 8192)
    assert pallas_decoder.machine_fits(3, 537, 537, 9, 9, 8192)
    # hardware-verified upper end: 3x1024x1024/L7 still fits
    assert pallas_encoder.machine_fits(3, 1025, 1025, 9, 9, 32768)
    # 2048-class: the standard encoder's three N-sized tables (~151 MB)
    # exceed the budget at any bit budget ...
    assert not pallas_encoder.machine_fits(3, 2048, 2048, 16, 16, 8192)
    assert not pallas_encoder.machine_fits(3, 2048, 2048, 16, 16, 131072)
    # ... but the COMPACT machine (one combo table, max_n <= 15) admits
    # 2048^2 at bounded budgets and 1024^2 full streams, while unbounded
    # 2048^2 budgets still fall back
    assert pallas_encoder.machine_fits(
        3, 2048, 2048, 16, 16, 131072, compact=True
    )
    assert not pallas_encoder.machine_fits(
        3, 2048, 2048, 16, 16, (3 * 2048 * 2048 * 40) // 32, compact=True
    )
    assert pallas_encoder.machine_fits(
        3, 1053, 1053, 9, 9, (3 * 1053 * 1053 * 40) // 32, compact=True
    )
    # ... but the decoder's budget-narrowed state admits 2048^2 at
    # bounded budgets (deliberate round-3 change; hardware-validated —
    # BASELINE.md round-4 section), while unbounded budgets still fall
    # back.
    assert pallas_decoder.machine_fits(3, 2048, 2048, 16, 16, 131072)
    assert not pallas_decoder.machine_fits(
        3, 2048, 2048, 16, 16, (3 * 2048 * 2048 * 40) // 32
    )
    # packed-entry representation bounds (round 5: hybrid families
    # lifted to 2^28 encode / 2^26 decode; 1x4096x4096 = 2^24 is now
    # legitimately admitted at tiny budgets — hardware-validated past
    # 2^24, BASELINE.md round 5)
    assert pallas_encoder.machine_fits(1, 4096, 4096, 16, 16, 64,
                                       compact=True)
    assert pallas_decoder.machine_fits(1, 4096, 4096, 16, 16, 64)
    assert not pallas_encoder.machine_fits(1, 16500, 16500, 16, 16, 64)
    assert not pallas_decoder.machine_fits(
        1, 8500, 8500, 16, 16, 64, geo_hbm=True
    )


def test_closed_form_bounds_match_table_dp():
    """tree_bounds.queue_bounds must equal the diagonal-sweep table DP
    (_bound_dp — the ground truth _dec_geom's bounds now come from the
    closed form, so the comparison is against the standalone DP)
    field-for-field, including odd-LL duplicate-parent geometries."""
    from spiht_tpu.codec.device_decoder import _bound_dp, _dec_geom

    geoms = [(1, h, w, lh, lw)
             for lh in (2, 3, 4, 5)
             for lw in (2, 3, 5)
             for h in (lh, lh + 1, 2 * lh, 2 * lh + 1, 4 * lh + 3, 8 * lh + 1)
             for w in (lw, 2 * lw, 2 * lw + 1, 4 * lw + 2, 8 * lw)]
    geoms += [(3, 537, 537, 9, 9), (3, 277, 277, 9, 9), (2, 64, 48, 4, 3),
              (3, 109, 109, 14, 14), (1, 33, 33, 3, 3), (3, 67, 95, 5, 6)]
    for (c, h, w, lh, lw) in geoms:
        d = _dec_geom(c, h, w, lh, lw)
        q = queue_bounds(c, h, w, lh, lw)
        ent_dp, lis_dp = _bound_dp(c, h, w, lh, lw)
        assert q.n_lip0 == int(d["lip_init"].size), (c, h, w, lh, lw)
        assert q.n_lis0 == int(d["lis_init"].size), (c, h, w, lh, lw)
        assert q.ent_bound == ent_dp == int(d["ent_bound"]), (c, h, w, lh, lw)
        assert q.lis_bound == lis_dp == int(d["lis_bound"]), (c, h, w, lh, lw)
        # duplicate-parent detection vs table-built coverage counts
        hc = np.asarray(d["has_child"], bool)[: h * w]
        c0 = np.asarray(d["child0"], np.int64)[: h * w][hc]
        counts = np.zeros(h * w, np.int64)
        for off in (0, 1, w, w + 1):
            np.add.at(counts, c0 + off, 1)
        assert q.has_duplicate_parents == bool(counts.max(initial=0) > 1)


def test_guards_answer_fast_at_any_geometry():
    """Routing must never cost more than the fallback it protects
    (round-3 verdict: the old guard took >100 s at 2048^2)."""
    big = [(3, 2048, 2048, 16, 16, 131072), (1, 4095, 4095, 16, 16, 8192),
           (3, 8191, 8191, 12, 12, 65536), (3, 1053, 1053, 9, 9, 32768)]
    t0 = time.perf_counter()
    for g in big:
        pallas_encoder.machine_fits(*g)
        pallas_decoder.machine_fits(*g)
        pallas_encoder.interleaved_fits(4, *g)
        pallas_decoder.interleaved_fits(4, *g)
    dt = time.perf_counter() - t0
    assert dt < 0.05, f"guard evaluation took {dt * 1e3:.1f} ms"


def test_encode_routes_compact_between_budgets(rng, monkeypatch):
    """With the budget squeezed between the compact and standard state
    sizes, pallas_encode must auto-route to the compact machine and
    stay bit-exact (the production path for 2048^2-class geometries)."""
    c, h, w, lh, lw = 1, 19, 19, 5, 5  # odd LL: duplicate parents
    cap_words = pallas_encoder._cap_words_for(c, h, w, 2**31 - 2)
    small = pallas_encoder.machine_vmem_bytes(
        c, h, w, lh, lw, cap_words, compact=True
    )
    big = pallas_encoder.machine_vmem_bytes(c, h, w, lh, lw, cap_words)
    assert small < big
    monkeypatch.setattr(pallas_encoder, "_VMEM_BUDGET_BYTES", small)
    monkeypatch.setattr(
        pallas_encoder, "_hybrid_fn", pallas_encoder._hybrid_fn.__wrapped__
    )  # shed the lru_cache so the budget monkeypatch can't cross-talk
    nat = runtime.load()
    arr = (rng.standard_normal((c, h, w)) * 900).astype(np.int32)
    want, wmn = nat.encode(arr, lh, lw, 2**31 - 2)
    got, gmn = pallas_encoder.pallas_encode(arr, lh, lw, interpret=True)
    assert gmn == wmn and got == want
    # data outside the compact domain (max_n > 15) must fall back
    arr_big = arr.copy()
    arr_big[0, 0, 0] = 1 << 17
    with pytest.raises(pallas_encoder.MachineResourceLimit):
        pallas_encoder.pallas_encode(arr_big, lh, lw, interpret=True)


def test_encode_routes_t1_hbm_below_compact_budget(rng, monkeypatch):
    """With the budget squeezed below even the compact machine's state,
    pallas_encode must route to the HBM-combo-table machine (round-5
    4096^2-class admission) and stay bit-exact — incl. odd LL.
    (Geometry large enough that the table exceeds the 4-row DMA
    scratch, else t1_hbm saves nothing.)"""
    c, h, w, lh, lw = 1, 39, 39, 5, 5
    cap_words = pallas_encoder._cap_words_for(c, h, w, 2**31 - 2)
    hbm_state = pallas_encoder.machine_vmem_bytes(
        c, h, w, lh, lw, cap_words, compact=True, t1_hbm=True
    )
    compact_state = pallas_encoder.machine_vmem_bytes(
        c, h, w, lh, lw, cap_words, compact=True
    )
    assert hbm_state < compact_state
    monkeypatch.setattr(pallas_encoder, "_VMEM_BUDGET_BYTES", hbm_state)
    monkeypatch.setattr(
        pallas_encoder, "_hybrid_fn", pallas_encoder._hybrid_fn.__wrapped__
    )
    assert pallas_encoder.preferred_machine(
        c, h, w, lh, lw, cap_words, 9
    ) == "compact_hbm"
    nat = runtime.load()
    arr = (rng.standard_normal((c, h, w)) * 900).astype(np.int32)
    want, wmn = nat.encode(arr, lh, lw, 2**31 - 2)
    got, gmn = pallas_encoder.pallas_encode(arr, lh, lw, interpret=True)
    assert gmn == wmn and got == want
    # outside the compact domain (max_n > 15) nothing fits: loud refuse
    arr_big = arr.copy()
    arr_big[0, 0, 0] = 1 << 17
    with pytest.raises(pallas_encoder.MachineResourceLimit):
        pallas_encoder.pallas_encode(arr_big, lh, lw, interpret=True)


def test_t1_hbm_admits_4096_class_budgeted():
    """The closed-form guard admits 4096^2-class coefficients on the
    HBM-table machine at production budgets and still answers fast.
    (3x4121x4121 / ll 68x68 is the real 4096^2 L6 RGB geometry —
    hardware-validated bit-exact at 0.25 bpp, BASELINE.md round 5.)"""
    c, h, w, lh, lw = 3, 4121, 4121, 68, 68
    mb = int(0.25 * 4096 * 4096)
    cw = pallas_encoder._cap_words_for(c, h, w, mb)
    assert not pallas_encoder.machine_fits(c, h, w, lh, lw, cw,
                                           compact=True)
    assert pallas_encoder.machine_fits(c, h, w, lh, lw, cw,
                                       compact=True, t1_hbm=True)
    assert pallas_encoder.preferred_machine(
        c, h, w, lh, lw, cw, 12
    ) == "compact_hbm"
    # t1_hbm is a compact-only mode
    assert not pallas_encoder.machine_fits(c, h, w, lh, lw, cw,
                                           t1_hbm=True)


def test_hbm_machines_env_opt_out(rng, monkeypatch):
    """SPIHT_TPU_DISABLE_HBM_MACHINES=1 drops the hbm tier from the
    encode router (escape hatch for the recorded geometry anomaly,
    BASELINE.md round 5): geometries only the hbm machine admits then
    refuse loudly instead."""
    c, h, w, lh, lw = 1, 39, 39, 5, 5
    cap_words = pallas_encoder._cap_words_for(c, h, w, 2**31 - 2)
    hbm_state = pallas_encoder.machine_vmem_bytes(
        c, h, w, lh, lw, cap_words, compact=True, t1_hbm=True
    )
    monkeypatch.setattr(pallas_encoder, "_VMEM_BUDGET_BYTES", hbm_state)
    assert pallas_encoder.preferred_machine(
        c, h, w, lh, lw, cap_words, 9
    ) == "compact_hbm"
    monkeypatch.setenv("SPIHT_TPU_DISABLE_HBM_MACHINES", "1")
    with pytest.raises(pallas_encoder.MachineResourceLimit):
        pallas_encoder.preferred_machine(c, h, w, lh, lw, cap_words, 9)


def test_encode_batch_routes_hbm_host_loop(rng, monkeypatch):
    """When only the HBM-table machine admits the geometry, the BATCH
    route runs the host loop of single compact_hbm dispatches
    (round 5) and stays bit-exact per stream."""
    c, h, w, lh, lw = 1, 39, 39, 5, 5
    arrs = np.stack([
        (rng.standard_normal((c, h, w)) * 700).astype(np.int32)
        for _ in range(3)
    ])
    mbs = [97, 2**31 - 2, 512]
    cap_words = pallas_encoder._cap_words_for(c, h, w, 2**31 - 2)
    hbm_state = pallas_encoder.machine_vmem_bytes(
        c, h, w, lh, lw, cap_words, compact=True, t1_hbm=True
    )
    monkeypatch.setattr(pallas_encoder, "_VMEM_BUDGET_BYTES", hbm_state)
    monkeypatch.setattr(
        pallas_encoder, "_hybrid_fn", pallas_encoder._hybrid_fn.__wrapped__
    )
    nat = runtime.load()
    got = pallas_encoder.pallas_encode_batch(
        arrs, lh, lw, mbs, interpret=True
    )
    for b in range(3):
        want, wmn = nat.encode(arrs[b], lh, lw, min(mbs[b], 2**31 - 2))
        assert got[b][1] == wmn and got[b][0] == want, b
    # opt-out: with the hbm tier disabled nothing admits the geometry
    monkeypatch.setenv("SPIHT_TPU_DISABLE_HBM_MACHINES", "1")
    with pytest.raises(pallas_encoder.MachineResourceLimit):
        pallas_encoder.pallas_encode_batch(
            arrs, lh, lw, mbs, interpret=True
        )


def test_decode_geo_hbm_admits_4096_class_budgeted():
    """Decode twin of the t1_hbm admission: the HBM-geometry-table
    hybrid admits the real 4096^2/L6 RGB geometry at bounded budgets;
    duplicate-parent geometries never take the hbm route."""
    c, h, w, lh, lw = 3, 4121, 4121, 68, 68
    cw = (int(0.25 * 4096 * 4096) + 31) // 32
    assert not pallas_decoder.machine_fits(c, h, w, lh, lw, cw)
    assert pallas_decoder.machine_fits(c, h, w, lh, lw, cw,
                                       geo_hbm=True)
    # duplicate-parent geometry: stays off the hbm route entirely
    assert not pallas_decoder.machine_fits(1, 19, 19, 5, 5, 64,
                                           geo_hbm=True)
    # over the hybrid's 2^26 lspn packing bound: refused either way
    big = 8500
    assert not pallas_decoder.machine_fits(3, big, big, 68, 68, cw,
                                           geo_hbm=True)


def test_routers_fall_back_when_over_budget(rng, monkeypatch):
    """With the budget forced to zero the device routers must produce
    bit-exact results through the XLA fallbacks even with the Pallas
    routing env-forced on (as on a TPU backend)."""
    from spiht_tpu.codec import device_decoder, device_encoder

    monkeypatch.setenv("SPIHT_TPU_PALLAS_ENCODER", "1")
    monkeypatch.setenv("SPIHT_TPU_PALLAS_DECODER", "1")
    monkeypatch.setattr(pallas_encoder, "_VMEM_BUDGET_BYTES", 0)
    monkeypatch.setattr(pallas_decoder, "_VMEM_BUDGET_BYTES", 0)

    nat = runtime.load()
    arr = (rng.standard_normal((1, 16, 16)) * 300).astype(np.int32)
    want, wmn = nat.encode(arr, 4, 4, 2**31 - 2)

    got, gmn = device_encoder.encode_device(arr, 4, 4, 2**31 - 2)
    assert gmn == wmn and got == want

    rec = device_decoder.decode_device(want, wmn, 1, 16, 16, 4, 4)
    np.testing.assert_array_equal(
        rec, nat.decode(want, wmn, 1, 16, 16, 4, 4)
    )

    # batched routers take the same fallback
    arrs = np.stack([arr, -arr])
    outs = device_encoder.encode_device_batch(arrs, 4, 4, 2**31 - 2)
    for a, (d, mn) in zip(arrs, outs):
        wd, wn = nat.encode(a, 4, 4, 2**31 - 2)
        assert d == wd and mn == wn
    recs = device_decoder.decode_device_batch(
        [d for d, _ in outs], [mn for _, mn in outs], 1, 16, 16, 4, 4
    )
    for (d, mn), r in zip(outs, np.asarray(recs)):
        np.testing.assert_array_equal(
            r, nat.decode(d, mn, 1, 16, 16, 4, 4)
        )
