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
@pytest.mark.slow
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
@pytest.mark.slow
def test_sharded_wavedec2_packed_exact(rng, level):
    mesh = _mesh(1, 4)
    x = rng.standard_normal((3, 48, 96))
    ref, llh, llw = dwt.wavedec2_packed(jnp.asarray(x), "bior2.2", "reflect", level)
    out, llh2, llw2 = sharded_wavedec2_packed(
        jnp.asarray(x), "bior2.2", "reflect", level, mesh
    )
    assert (llh, llw) == (llh2, llw2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# round 2: recursive sharded DWT, arbitrary widths (verdict item 4)
# ---------------------------------------------------------------------------


def test_recursive_sharded_8k_all_levels(rng):
    """8-shard 8K-wide image, no manual padding, every level sharded;
    identical to the single-device jitted transform."""
    from functools import partial

    from spiht_tpu.parallel.spatial import _level_shardable
    from spiht_tpu.wavelets.filters import build_wavelet, dwt_coeff_len

    mesh = _mesh(1, 8)
    level = 5
    x = rng.standard_normal((1, 16, 7900))  # 7900 % 8 != 0
    # verify statically that every level shards
    Wl, F = 7900, build_wavelet("bior2.2").dec_len
    for _ in range(level):
        assert _level_shardable(Wl, 8, F, "reflect"), Wl
        Wl = dwt_coeff_len(Wl, F, "reflect")
    f = jax.jit(
        partial(
            sharded_wavedec2_packed,
            wavelet="bior2.2", mode="reflect", level=level, mesh=mesh,
        )
    )
    g = jax.jit(
        partial(dwt.wavedec2_packed, wavelet="bior2.2", mode="reflect",
                level=level)
    )
    got, lh, lw = f(jnp.asarray(x))
    ref, lh2, lw2 = g(jnp.asarray(x))
    assert (lh, lw) == (lh2, lw2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_recursive_sharded_long_filter_odd_width(rng):
    """18-tap bior6.8, symmetric mode, width 3001: reshard drift + tail
    fixups exercised; deep unshardable levels fall back transparently."""
    from functools import partial

    mesh = _mesh(1, 8)
    x = rng.standard_normal((2, 12, 3001))
    f = jax.jit(
        partial(
            sharded_wavedec2_packed,
            wavelet="bior6.8", mode="symmetric", level=4, mesh=mesh,
        )
    )
    g = jax.jit(
        partial(dwt.wavedec2_packed, wavelet="bior6.8", mode="symmetric",
                level=4)
    )
    got, lh, lw = f(jnp.asarray(x))
    ref, lh2, lw2 = g(jnp.asarray(x))
    assert (lh, lw) == (lh2, lw2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_sharded_plane_stats_psum(rng):
    """Per-shard tallies + psum == unsharded global stats, no gather."""
    from spiht_tpu.parallel.spatial import sharded_plane_stats

    mesh = _mesh(1, 8)
    arr = (rng.standard_normal((3, 40, 64)) * 5000).astype(np.int32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(
        jnp.asarray(arr), NamedSharding(mesh, P(None, None, "tile"))
    )
    gmax, counts = sharded_plane_stats(xs, mesh)
    mag = np.abs(arr)
    assert int(gmax) == mag.max()
    want = [(mag >= (1 << p)).sum() for p in range(32)]
    np.testing.assert_array_equal(np.asarray(counts), want)


def test_encode_image_sharded_odd_width(rng):
    """Sharded encode of a width-not-divisible image == single-device
    encode, byte for byte (round-2 constraint lifting)."""
    import spiht_tpu
    from spiht_tpu import SpihtSettings, transform
    from spiht_tpu.parallel.codec import encode_image_sharded

    mesh = _mesh(1, 8)
    im = rng.random((1, 24, 301))
    settings = SpihtSettings()
    er_sh = encode_image_sharded(im, settings, mesh, level=2, max_bits=4000)
    old = transform._BACKEND
    transform._BACKEND = "jax"
    try:
        er = spiht_tpu.encode_image(im, settings, level=2, max_bits=4000)
    finally:
        transform._BACKEND = old
    assert er_sh.encoded_bytes == er.encoded_bytes
    assert er_sh.max_n == er.max_n


@pytest.mark.slow
def test_replication_discrepancy_and_checkify(rng):
    """Sanitizer utilities (SURVEY §6): replication assert + checkify."""
    import jax.numpy as jnp
    import pytest as _pytest

    from spiht_tpu.parallel.consistency import (
        assert_replicated,
        checked_call,
        replication_discrepancy,
    )

    mesh = _mesh(1, 8)
    x = jnp.asarray(rng.standard_normal((4, 8)))
    # replicated values pass with exactly zero deviation
    assert float(replication_discrepancy(x, mesh, "tile")) == 0.0
    assert_replicated(x, mesh, "tile")

    # the sharded DWT's replicated detail outputs are consistent
    d1 = sharded_dwt2_level1(
        jnp.asarray(rng.standard_normal((1, 16, 64))),
        "bior2.2", "reflect", mesh,
    )
    assert_replicated(d1["dd"], mesh, "tile")

    # checkify catches NaNs produced inside a jitted pipeline
    import jax

    def bad(v):
        return jnp.log(v).sum()

    with _pytest.raises(Exception):
        checked_call(bad, jnp.asarray([-1.0, 2.0]))
    assert float(checked_call(lambda v: v.sum(), x)) == float(x.sum())
