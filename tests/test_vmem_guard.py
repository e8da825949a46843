"""VMEM-budget routing guard for the Pallas bit machines.

The machines keep all queue/table state VMEM-resident; geometries whose
state exceeds the budget (or the 1<<24 packed-entry bound) must fall
back to the XLA formulations instead of failing Mosaic compilation.
Hardware anchor: 3x1024x1024/L7 (~93 MB) compiles and runs bit-exact
(BASELINE.md); 2048-class geometries (~350 MB) cannot.
"""

import numpy as np
import pytest

from spiht_tpu.codec import pallas_decoder, pallas_encoder
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
    # 2048-class state (~350 MB) exceeds any chip's VMEM
    assert not pallas_encoder.machine_fits(3, 2048, 2048, 16, 16, 8192)
    assert not pallas_decoder.machine_fits(3, 2048, 2048, 16, 16, 8192)
    # the packed-entry representation bound short-circuits first
    assert not pallas_encoder.machine_fits(1, 4096, 4096, 16, 16, 64)
    assert not pallas_decoder.machine_fits(1, 4096, 4096, 16, 16, 64)


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
