"""Fused device pipelines with the Pallas bit machines swapped in
(machine='pallas' via SPIHT_TPU_PALLAS_{EN,DE}CODER=1; Mosaic interpret
on CPU) must produce byte-identical streams / identical images to the
XLA-machine pipelines.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spiht_tpu import SpihtSettings, jax_transform
from spiht_tpu.codec.device_decoder import _words_of
from spiht_tpu.native import runtime
from spiht_tpu.wavelets.geometry import get_slices_and_h_w

pytestmark = pytest.mark.skipif(
    runtime.load() is None, reason="native kernel unavailable"
)


def _image(h=64, w=64, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w] / 16.0
    im = np.stack([0.5 + 0.3 * np.sin(xx + k) * np.cos(yy) for k in range(3)])
    return np.clip(im + 0.05 * rng.standard_normal(im.shape), 0, 1).astype(
        np.float32
    )


def test_fused_encode_pipeline_pallas_matches_xla(monkeypatch):
    im = _image()
    settings = SpihtSettings()
    mb = 5000

    monkeypatch.setenv("SPIHT_TPU_PALLAS_ENCODER", "0")
    exla = jax_transform.encode_pipeline_fn(
        settings, 64, 64, 3, 3, dtype="float32"
    )
    wx, tx, ox, nx = exla(jnp.asarray(im), mb)

    monkeypatch.setenv("SPIHT_TPU_PALLAS_ENCODER", "1")
    epal = jax_transform.encode_pipeline_fn(
        settings, 64, 64, 3, 3, dtype="float32"
    )
    wp, tp, op, np_ = epal(jnp.asarray(im), mb)

    assert int(tp) == int(tx) and int(np_) == int(nx)
    assert not bool(op) and not bool(ox)
    nbytes = (int(tx) + 7) // 8
    bx = np.asarray(wx).view(np.uint8)[:nbytes].tobytes()
    bp = np.asarray(wp).view(np.uint8)[:nbytes].tobytes()
    assert bp == bx


def test_fused_encode_pipeline_budget_narrowed_cap(monkeypatch):
    """A max_bits hint narrows the static stream buffer without changing
    the emitted bytes; a runtime budget beyond the hint raises the
    overflow flag instead of silently truncating."""
    im = _image(seed=7)
    settings = SpihtSettings()
    mb = 5000

    monkeypatch.setenv("SPIHT_TPU_PALLAS_ENCODER", "1")
    full = jax_transform.encode_pipeline_fn(
        settings, 64, 64, 3, 3, dtype="float32"
    )
    wf, tf, of, nf = full(jnp.asarray(im), mb)

    narrow = jax_transform.encode_pipeline_fn(
        settings, 64, 64, 3, 3, dtype="float32", max_bits=mb
    )
    assert narrow is not full  # distinct cap key
    wn, tn, on, nn = narrow(jnp.asarray(im), mb)
    assert int(tn) == int(tf) and int(nn) == int(nf)
    assert not bool(on) and not bool(of)
    nbytes = (int(tf) + 7) // 8
    assert (
        np.asarray(wn).view(np.uint8)[:nbytes].tobytes()
        == np.asarray(wf).view(np.uint8)[:nbytes].tobytes()
    )
    # the hint rounds up to 8192 bits; a 100k budget overflows it
    _, _, over, _ = narrow(jnp.asarray(im), 100_000)
    assert bool(over)


def test_fused_decode_pipeline_pallas_matches_xla(monkeypatch):
    im = _image(seed=5)
    settings = SpihtSettings()
    nat = runtime.load()
    from spiht_tpu import transform

    arr, llh, llw = transform.forward_numpy(im, settings, 3)
    slices, enc_h, enc_w = get_slices_and_h_w(64, 64, settings, 3)
    data, mn = nat.encode(arr.astype(np.int32), llh, llw, 4096)
    nbits = len(data) * 8
    cap = max((nbits + 31) // 32, 1)
    words = jnp.asarray(_words_of(data, cap))

    monkeypatch.setenv("SPIHT_TPU_PALLAS_DECODER", "0")
    dxla = jax_transform.decode_pipeline_fn(
        settings, 64, 64, 3, 3, enc_h, enc_w, llh, llw, cap,
        dtype="float32", as_uint8=True,
    )
    ix = np.asarray(dxla(words, nbits, mn))

    monkeypatch.setenv("SPIHT_TPU_PALLAS_DECODER", "1")
    dpal = jax_transform.decode_pipeline_fn(
        settings, 64, 64, 3, 3, enc_h, enc_w, llh, llw, cap,
        dtype="float32", as_uint8=True,
    )
    ip = np.asarray(dpal(words, nbits, mn))
    np.testing.assert_array_equal(ip, ix)


@pytest.mark.slow
def test_batched_pallas_machines_and_pipelines_match_singles():
    """The lax.map batch compositions (pallas_encode_batch,
    pallas_decode_batch, encode/decode_pipeline_batch_fn with the
    Pallas machines) match the single-image paths.

    Runs in ONE SUBPROCESS: compiling lax.map-of-interpret-kernel
    programs on CPU leaves the in-process XLA CPU compiler in a state
    where a later unrelated big compile segfaults (reproduced: these
    checks inline + test_device_decoder's pipeline tests crash jax's
    backend_compile; each alone is fine). Isolating the interpret
    lax.map programs keeps the suite immune to the upstream bug.
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, __file__], capture_output=True, text=True,
        timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def _batched_pipeline_check():
    import os

    os.environ["SPIHT_TPU_PALLAS_ENCODER"] = "1"
    os.environ["SPIHT_TPU_PALLAS_DECODER"] = "1"
    im = _image(seed=9)
    ims = np.stack([im, np.roll(im, 7, axis=2)])
    settings = SpihtSettings()
    mb = 4000

    es = jax_transform.encode_pipeline_fn(
        settings, 64, 64, 3, 3, dtype="float32"
    )
    eb = jax_transform.encode_pipeline_batch_fn(
        settings, 64, 64, 3, 3, dtype="float32"
    )
    wb, tb, ob, nb = [np.asarray(x) for x in eb(
        jnp.asarray(ims), jnp.asarray([mb, mb])
    )]
    slices, enc_h, enc_w = get_slices_and_h_w(64, 64, settings, 3)
    llh = slices[0][1].stop
    llw = slices[0][2].stop
    for b in range(2):
        ws, ts, os_, ns = es(jnp.asarray(ims[b]), mb)
        assert int(tb[b]) == int(ts) and int(nb[b]) == int(ns)
        nbytes = (int(ts) + 7) // 8
        assert (
            wb[b].view(np.uint8)[:nbytes].tobytes()
            == np.asarray(ws).view(np.uint8)[:nbytes].tobytes()
        )

    cap = int(wb.shape[1])
    ds = jax_transform.decode_pipeline_fn(
        settings, 64, 64, 3, 3, enc_h, enc_w, llh, llw, cap,
        dtype="float32", as_uint8=True,
    )
    db = jax_transform.decode_pipeline_batch_fn(
        settings, 64, 64, 3, 3, enc_h, enc_w, llh, llw, cap,
        dtype="float32", as_uint8=True,
    )
    imb = np.asarray(db(jnp.asarray(wb), jnp.asarray(tb), jnp.asarray(nb)))
    for b in range(2):
        want = np.asarray(ds(jnp.asarray(wb[b]), int(tb[b]), int(nb[b])))
        np.testing.assert_array_equal(imb[b], want, err_msg=f"lane {b}")


def _batched_machines_check():
    from spiht_tpu.codec.pallas_decoder import pallas_decode_batch
    from spiht_tpu.codec.pallas_encoder import (
        pallas_encode, pallas_encode_batch,
    )

    rng = np.random.default_rng(17)
    arrs = (rng.standard_normal((3, 2, 16, 16)) * 700).astype(np.int32)
    mbs = [64, 10**6, 500]
    got = pallas_encode_batch(arrs, 4, 4, mbs, interpret=True)
    for b in range(3):
        want = pallas_encode(arrs[b], 4, 4, mbs[b], interpret=True)
        assert got[b] == want, f"encode lane {b}"

    nat = runtime.load()
    datas, mns = [], []
    for b in range(3):
        d, mn = nat.encode(arrs[b], 4, 4, [4096, 333, 10**6][b])
        datas.append(d)
        mns.append(mn)
    recs = pallas_decode_batch(
        datas, mns, 2, 16, 16, 4, 4, interpret=True
    )
    for b in range(3):
        want = nat.decode(datas[b], mns[b], 2, 16, 16, 4, 4)
        np.testing.assert_array_equal(
            recs[b], want, err_msg=f"decode lane {b}"
        )


if __name__ == "__main__":
    # subprocess entry for the batched lax.map checks
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    _batched_machines_check()
    print("batched machines ok")
    _batched_pipeline_check()
    print("batched pipelines ok")
