"""torch / JAX / numpy interop: the migration path for reference users.

The reference's tooling feeds decoded frames through torch
(make_gif.py:1-20); these tests pin that torch tensors work end-to-end
as inputs to the high-level API and that the DLPack bridges round-trip.
"""

import numpy as np
import pytest

import spiht_tpu
from spiht_tpu import interop

def _image(c=3, h=40, w=48, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w] / 32.0
    im = np.stack([0.5 + 0.3 * np.sin(xx + c_) * np.cos(yy) for c_ in range(c)])
    return np.clip(im + 0.05 * rng.standard_normal(im.shape), 0, 1)



def test_jax_dlpack_round_trip_no_torch():
    """The DLPack bridge half that needs no torch at all: a jax array
    exported and re-imported via the dlpack protocol is value-identical
    and (on CPU) shares the buffer with its numpy view."""
    import jax.numpy as jnp
    import jax

    a = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4) * 1.5
    b = jax.dlpack.from_dlpack(a)
    assert np.array_equal(np.asarray(b), np.asarray(a))
    # numpy consumes the same capsule protocol (zero-copy on CPU)
    c = np.from_dlpack(a)
    assert np.array_equal(c, np.asarray(a))


def test_as_numpy_image_passthrough_no_torch():
    im = _image()
    out = interop.as_numpy_image(im)
    assert out is im or np.shares_memory(out, im)
    import jax.numpy as jnp

    j = jnp.asarray(im)
    assert np.array_equal(interop.as_numpy_image(j), im)


torch = pytest.importorskip("torch")


def test_encode_image_accepts_torch_tensor():
    im = _image()
    t = torch.from_numpy(im.copy())
    er_t = spiht_tpu.encode_image(t, level=3, max_bits=4000)
    er_n = spiht_tpu.encode_image(im, level=3, max_bits=4000)
    assert er_t.encoded_bytes == er_n.encoded_bytes
    assert er_t.max_n == er_n.max_n


def test_encode_image_accepts_grad_tensor():
    im = _image(seed=1)
    t = torch.from_numpy(im.copy()).requires_grad_(True)
    er = spiht_tpu.encode_image(interop.as_numpy_image(t), level=3,
                                max_bits=4000)
    want = spiht_tpu.encode_image(im, level=3, max_bits=4000)
    assert er.encoded_bytes == want.encoded_bytes


def test_as_numpy_image_zero_copy_cpu():
    t = torch.zeros(3, 8, 8, dtype=torch.float64)
    a = interop.as_numpy_image(t)
    t[0, 0, 0] = 7.0
    assert a[0, 0, 0] == 7.0  # shares memory, no copy


def test_torch_jax_dlpack_round_trip():
    t = torch.arange(24, dtype=torch.float32).reshape(2, 3, 4)
    j = interop.torch_to_jax(t)
    assert np.array_equal(np.asarray(j), t.numpy())
    back = interop.jax_to_torch(j)
    assert torch.equal(back.cpu(), t)


def test_jax_to_torch_on_decode_output():
    import jax.numpy as jnp

    im = _image(seed=2)
    er = spiht_tpu.encode_image(im, level=3, max_bits=6000)
    rec = spiht_tpu.decode_image(er, spiht_tpu.SpihtSettings())
    t = interop.jax_to_torch(jnp.asarray(rec))
    assert t.shape == tuple(rec.shape)
    assert np.allclose(np.asarray(t), np.asarray(rec, dtype=np.float32),
                       atol=1e-6) or np.array_equal(
        np.asarray(t), np.asarray(rec)
    )
