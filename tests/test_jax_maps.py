"""JAX significance maps vs the oracle's recursive tree walks and the C++
kernel's host-side maps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spiht_tpu.codec import maps as jmaps
from spiht_tpu.codec import oracle


def _oracle_maps(arr, ll_h, ll_w):
    """Brute-force M/D/G from the oracle's tree helpers."""
    c, h, w = arr.shape
    M = np.full((c, h, w), -1, dtype=np.int8)
    D = np.full((c, h, w), -1, dtype=np.int8)
    G = np.full((c, h, w), -1, dtype=np.int8)
    for k in range(c):
        for i in range(h):
            for j in range(w):
                v = abs(int(arr[k, i, j]))
                M[k, i, j] = v.bit_length() - 1

    def desc_max(k, i, j):
        off = oracle._offspring(i, j, h, w, ll_h, ll_w)
        if not off:
            return -1
        best = -1
        for l, m in off:
            best = max(best, M[k, l, m], desc_max(k, l, m))
        return best

    import sys

    sys.setrecursionlimit(100000)
    for k in range(c):
        for i in range(h):
            for j in range(w):
                D[k, i, j] = desc_max(k, i, j)
    for k in range(c):
        for i in range(h):
            for j in range(w):
                off = oracle._offspring(i, j, h, w, ll_h, ll_w)
                G[k, i, j] = max((D[k, l, m] for l, m in off), default=-1) if off else -1
    return M, D, G


@pytest.mark.parametrize(
    "shape,ll", [((1, 16, 16), (4, 4)), ((3, 24, 32), (6, 8)), ((2, 20, 20), (5, 5))]
)
def test_maps_match_bruteforce(rng, shape, ll):
    arr = (rng.standard_normal(shape) * 500).astype(np.int32)
    ll_h, ll_w = ll
    M0, D0, G0 = _oracle_maps(arr, ll_h, ll_w)

    @jax.jit
    def f(a):
        return jmaps.significance_maps(a, ll_h, ll_w)

    M, D, G = (np.asarray(x) for x in f(jnp.asarray(arr)))
    np.testing.assert_array_equal(M, M0)
    np.testing.assert_array_equal(D, D0)
    np.testing.assert_array_equal(G, G0)


def test_maps_match_native_kernel(rng):
    from spiht_tpu.native import runtime

    nat = runtime.load()
    if nat is None:
        pytest.skip("native kernel unavailable")
    arr = (rng.standard_normal((3, 64, 96)) * 3000).astype(np.int32)
    ll_h, ll_w = 8, 12
    Mn, Dn, Gn = nat.compute_maps(arr, ll_h, ll_w)
    M, D, G = (
        np.asarray(x)
        for x in jax.jit(lambda a: jmaps.significance_maps(a, ll_h, ll_w))(
            jnp.asarray(arr)
        )
    )
    np.testing.assert_array_equal(M, Mn)
    np.testing.assert_array_equal(D, Dn)
    np.testing.assert_array_equal(G, Gn)


def test_maps_batched(rng):
    arr = (rng.standard_normal((2, 1, 16, 16)) * 100).astype(np.int32)
    M, D, G = jax.jit(lambda a: jmaps.significance_maps(a, 4, 4))(
        jnp.asarray(arr)
    )
    for b in range(2):
        M0, D0, G0 = _oracle_maps(arr[b], 4, 4)
        np.testing.assert_array_equal(np.asarray(M[b]), M0)
        np.testing.assert_array_equal(np.asarray(D[b]), D0)
        np.testing.assert_array_equal(np.asarray(G[b]), G0)


def test_max_n_from_maps(rng):
    arr = (rng.standard_normal((1, 16, 16)) * 1000).astype(np.int32)
    M, _, _ = jmaps.significance_maps(jnp.asarray(arr), 4, 4)
    n = int(jmaps.max_n_from_maps(M)[0])
    assert n == max(int(np.abs(arr).max()).bit_length() - 1, 0)
