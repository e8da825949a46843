"""Sharded DWT (halo exchange over a virtual 8-device mesh) vs the
single-device transform: must be exactly equal."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spiht_tpu.parallel import (
    make_mesh,
    batch_sharding,
    image_sharding,
    sharded_dwt2_level1,
    sharded_wavedec2_packed,
)
from spiht_tpu.wavelets import dwt


def _mesh(dp, sp):
    if dp * sp > len(jax.devices()):
        pytest.skip("not enough virtual devices")
    return make_mesh((dp, sp))


# NOTE: each (wavelet, sp) pair compiles a fresh 8-way SPMD program on
# CPU (~1 min each) — parameterizations are deliberately minimal
@pytest.mark.parametrize(
    "wavelet,mode,sp", [("bior2.2", "reflect", 2), ("bior6.8", "symmetric", 8)]
)
def test_sharded_level1_exact(rng, wavelet, mode, sp):
    mesh = _mesh(1, sp)
    # shard width must be >= filter length (18 for bior6.8)
    x = rng.standard_normal((3, 40, 64 if sp < 8 else 160))
    ref = dwt.dwt2(jnp.asarray(x), wavelet, mode)

    out = sharded_dwt2_level1(
        jnp.asarray(x), wavelet, mode, mesh, axis_name="tile"
    )
    for k in ("aa", "ad", "da", "dd"):
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))


@pytest.mark.parametrize("level", [3])
def test_sharded_wavedec2_packed_exact(rng, level):
    mesh = _mesh(1, 4)
    x = rng.standard_normal((3, 48, 96))
    ref, llh, llw = dwt.wavedec2_packed(jnp.asarray(x), "bior2.2", "reflect", level)
    out, llh2, llw2 = sharded_wavedec2_packed(
        jnp.asarray(x), "bior2.2", "reflect", level, mesh
    )
    assert (llh, llw) == (llh2, llw2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_batched_leading_dims(rng):
    mesh = _mesh(2, 4)
    x = rng.standard_normal((2, 3, 32, 64))
    ref, _, _ = dwt.wavedec2_packed(jnp.asarray(x), "bior2.2", "reflect", 2)
    xs = jax.device_put(jnp.asarray(x), image_sharding(mesh))
    out, _, _ = sharded_wavedec2_packed(xs, "bior2.2", "reflect", 2, mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_rejects_bad_widths(rng):
    mesh = _mesh(1, 4)
    x = jnp.asarray(rng.standard_normal((1, 16, 36)))  # 36 % 4 == 0, 9 odd
    with pytest.raises(ValueError):
        sharded_dwt2_level1(x, "bior2.2", "reflect", mesh)
    x = jnp.asarray(rng.standard_normal((1, 16, 30)))  # 30 % 4 != 0
    with pytest.raises(ValueError):
        sharded_dwt2_level1(x, "bior2.2", "reflect", mesh)
    x = jnp.asarray(rng.standard_normal((1, 16, 32)))  # shard width 8 < F=10
    with pytest.raises(ValueError):
        sharded_dwt2_level1(x, "bior6.8", "symmetric", mesh)


def test_encode_image_sharded_matches_single_device(rng):
    """Full sharded encode of one image == the single-device jax encode,
    byte for byte."""
    import spiht_tpu
    from spiht_tpu import transform
    from spiht_tpu.parallel import encode_image_sharded
    from spiht_tpu.settings import SpihtSettings

    mesh = _mesh(1, 4)
    settings = SpihtSettings(
        color_model="ipt", per_channel_quant_scales=[100, 20, 20],
        quantization_scale=1.0,
    )
    im = rng.random((3, 48, 96))
    er_sharded = encode_image_sharded(
        im, settings, mesh, level=2, max_bits=8000
    )
    old = transform._BACKEND
    transform._BACKEND = "jax"
    try:
        er_single = spiht_tpu.encode_image(im, settings, level=2, max_bits=8000)
    finally:
        transform._BACKEND = old
    assert er_sharded.encoded_bytes == er_single.encoded_bytes
    assert er_sharded.max_n == er_single.max_n
    # and it decodes
    rec = spiht_tpu.decode_image(er_sharded, settings)
    assert rec.shape[-2] >= 48


def test_sharded_wavedec2_wide_image(rng):
    """Config-5 shape: a wide image over 8 shards, multilevel, exact."""
    mesh = _mesh(1, 8)
    x = rng.standard_normal((1, 32, 1024))
    ref, _, _ = dwt.wavedec2_packed(jnp.asarray(x), "bior2.2", "reflect", 4)
    out, _, _ = sharded_wavedec2_packed(
        jnp.asarray(x), "bior2.2", "reflect", 4, mesh
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_batch_sharded_analysis(rng):
    """Batch-DP through the jitted analysis program on the mesh."""
    from spiht_tpu import jax_transform
    from spiht_tpu.settings import SpihtSettings

    mesh = _mesh(8, 1)
    s = SpihtSettings()
    imgs = rng.random((8, 3, 32, 32))
    fn = jax_transform.analysis_fn(s, level=2, with_maps=True, dtype="float64")
    ref = fn(jnp.asarray(imgs))
    sharded = jax.device_put(jnp.asarray(imgs), batch_sharding(mesh))
    out = fn(sharded)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))
