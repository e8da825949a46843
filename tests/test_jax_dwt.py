"""JAX DWT vs the trusted numpy reference (exact in float64)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spiht_tpu.wavelets import dwt as jdwt
from spiht_tpu.wavelets import ref_dwt

WAVELETS = ["bior2.2", "bior4.4", "bior6.8", "db2", "haar"]
MODES = [
    "reflect",
    "symmetric",
    "zero",
    "periodic",
    "constant",
    "smooth",
    "antisymmetric",
    "antireflect",
]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("wavelet", ["bior2.2", "bior6.8"])
def test_dwt1d_idwt1d_matches_reference(rng, wavelet, mode):
    x = rng.standard_normal((2, 3, 57))
    cA_r, cD_r = ref_dwt.dwt1d(x, wavelet, mode)

    @jax.jit
    def f(x):
        return jdwt.dwt1d(x, wavelet, mode)

    cA_j, cD_j = f(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(cA_j), cA_r, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cD_j), cD_r, atol=1e-10)

    y_r = ref_dwt.idwt1d(cA_r, cD_r, wavelet, mode)

    @jax.jit
    def g(a, d):
        return jdwt.idwt1d(a, d, wavelet, mode)

    y_j = g(cA_j, cD_j)
    np.testing.assert_allclose(np.asarray(y_j), y_r, atol=1e-10)


@pytest.mark.parametrize("wavelet", WAVELETS)
def test_dwt1d_all_wavelets_reflect(rng, wavelet):
    x = rng.standard_normal((64,))
    cA_r, cD_r = ref_dwt.dwt1d(x, wavelet, "reflect")
    cA_j, cD_j = jax.jit(lambda v: jdwt.dwt1d(v, wavelet, "reflect"))(
        jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(cA_j), cA_r, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cD_j), cD_r, atol=1e-10)


@pytest.mark.parametrize(
    "shape,wavelet,mode,level",
    [
        ((3, 64, 64), "bior2.2", "reflect", None),
        ((1, 37, 53), "bior2.2", "reflect", 2),
        ((2, 96, 128), "bior4.4", "symmetric", 3),
        ((1, 80, 56), "bior6.8", "symmetric", None),
    ],
)
def test_wavedec2_packed_matches_reference(rng, shape, wavelet, mode, level):
    x = rng.standard_normal(shape)
    cr = ref_dwt.wavedec2(x, wavelet, mode, level)
    ar, _ = ref_dwt.coeffs_to_array(cr)

    @jax.jit
    def f(v):
        return jdwt.wavedec2_packed(v, wavelet, mode, level)

    aj, ll_h, ll_w = f(jnp.asarray(x))
    assert ar.shape == aj.shape
    assert (ll_h, ll_w) == (cr[0].shape[-2], cr[0].shape[-1])
    np.testing.assert_allclose(np.asarray(aj), ar, atol=1e-9)


@pytest.mark.parametrize(
    "shape,wavelet,mode",
    [((3, 64, 64), "bior2.2", "reflect"), ((1, 37, 53), "bior6.8", "symmetric")],
)
def test_waverec2_matches_reference(rng, shape, wavelet, mode):
    x = rng.standard_normal(shape)
    cr = ref_dwt.wavedec2(x, wavelet, mode)
    y_r = ref_dwt.waverec2(cr, wavelet, mode)

    cj = jdwt.wavedec2(jnp.asarray(x), wavelet, mode)

    @jax.jit
    def g(cj):
        return jdwt.waverec2(cj, wavelet, mode)

    y_j = g(cj)
    np.testing.assert_allclose(np.asarray(y_j), y_r, atol=1e-9)
    # perfect reconstruction
    np.testing.assert_allclose(np.asarray(y_j)[..., : shape[-2], : shape[-1]], x, atol=1e-8)


def test_batched_leading_dims(rng):
    x = rng.standard_normal((4, 3, 32, 48))
    aj, ll_h, ll_w = jax.jit(
        lambda v: jdwt.wavedec2_packed(v, "bior2.2", "reflect", 3)
    )(jnp.asarray(x))
    for b in range(4):
        cr = ref_dwt.wavedec2(x[b], "bior2.2", "reflect", 3)
        ar, _ = ref_dwt.coeffs_to_array(cr)
        np.testing.assert_allclose(np.asarray(aj[b]), ar, atol=1e-9)


# ---------------------------------------------------------------------------
# round 2: periodization + new wavelet families, exact vs numpy reference
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("wavelet", ["haar", "sym4", "coif2", "bior5.5"])
@pytest.mark.parametrize("n", [7, 16, 33])
def test_periodization_1d_matches_reference(rng, wavelet, n):
    x = rng.standard_normal((2, n))
    cA_r, cD_r = ref_dwt.dwt1d(x, wavelet, "periodization")

    @jax.jit
    def f(x):
        return jdwt.dwt1d(x, wavelet, "periodization")

    cA_j, cD_j = f(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(cA_j), cA_r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cD_j), cD_r, atol=1e-12)

    y_r = ref_dwt.idwt1d(cA_r, cD_r, wavelet, "periodization")

    @jax.jit
    def g(a, d):
        return jdwt.idwt1d(a, d, wavelet, "periodization")

    np.testing.assert_allclose(np.asarray(g(cA_j, cD_j)), y_r, atol=1e-12)


@pytest.mark.parametrize("wavelet", ["sym4", "sym8", "coif3", "bior5.5"])
def test_new_families_packed_matches_reference(rng, wavelet):
    x = rng.standard_normal((1, 40, 56))
    c_r = ref_dwt.wavedec2(x, wavelet, "reflect", 2)
    arr_r, _ = ref_dwt.coeffs_to_array(c_r)

    @jax.jit
    def f(x):
        return jdwt.wavedec2_packed(x, wavelet, "reflect", 2)

    arr_j, lh, lw = f(jnp.asarray(x))
    assert (lh, lw) == c_r[0].shape[-2:]
    np.testing.assert_allclose(np.asarray(arr_j), arr_r, atol=1e-10)


def test_periodization_wavedec2_packed_matches_reference(rng):
    x = rng.standard_normal((2, 37, 52))
    c_r = ref_dwt.wavedec2(x, "bior2.2", "periodization", 3)
    arr_r, _ = ref_dwt.coeffs_to_array(c_r)

    @jax.jit
    def f(x):
        return jdwt.wavedec2_packed(x, "bior2.2", "periodization", 3)

    arr_j, lh, lw = f(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(arr_j), arr_r, atol=1e-12)
    y_r = ref_dwt.waverec2(c_r, "bior2.2", "periodization")

    @jax.jit
    def g(c):
        sl = [c_r[0].shape] + [
            {k: v.shape for k, v in d.items()} for d in c_r[1:]
        ]
        coeffs = [c[..., : sl[0][-2], : sl[0][-1]]]
        # rebuild coeff pyramid from the packed array via numpy slices
        import numpy as _np

        _, slices = ref_dwt.coeffs_to_array(c_r)
        coeffs = [c[slices[0]]] + [
            {k: c[v] for k, v in d.items()} for d in slices[1:]
        ]
        return jdwt.waverec2(coeffs, "bior2.2", "periodization")

    y_j = g(jnp.asarray(arr_r))
    np.testing.assert_allclose(np.asarray(y_j), y_r, atol=1e-12)
