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
