"""Pallas TPU kernels for the codec's device-side hot ops.

The encode analysis pipeline is bandwidth-bound: after the DWT, XLA would
make separate passes for quantization (float -> i32 truncation), the int16
transfer compaction + overflow check, and the element significance map
M = floor(log2 |x|). This kernel fuses all four into ONE pass over VMEM:

    coeffs (f32) -> [q = trunc(x * scale)] -> arr_i32
                                           -> arr_i16 (clipped) + overflow
                                           -> M (31 monotone threshold adds)

Shapes are processed as (N, W) row blocks with the full W per block (the
packed coeff width, a few hundred to a few thousand — comfortably within
VMEM); the wrapper pads N to the block multiple and strips afterwards.

Used by jax_transform when SPIHT_TPU_PALLAS=1 (or on real TPU backends);
falls back to plain XLA ops elsewhere. Verified against the XLA path in
tests (interpret mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quantize_compact_m"]

_ROWS = 256  # rows per grid step


def _kernel(scale_ref, x_ref, arr_ref, a16_ref, m_ref, ofl_ref):
    x = x_ref[:]
    # truncate-toward-zero int cast (hazard #1) — XLA convert semantics
    q = (x * scale_ref[0]).astype(jnp.int32)
    arr_ref[:] = q
    a = jnp.abs(q)
    a16_ref[:] = jnp.clip(q, -32767, 32767).astype(jnp.int16)

    # M = floor(log2 |q|), -1 for 0: exact integer thresholds, no float
    # rounding hazards (see codec/maps.py)
    m = jnp.full(q.shape, -1, dtype=jnp.int32)
    for k in range(31):
        m = m + (a >= jnp.int32(1 << k)).astype(jnp.int32)
    m_ref[:] = m

    block_ofl = jnp.any(a > jnp.int32(32767))

    @pl.when(pl.program_id(0) == 0)
    def _():
        ofl_ref[0] = jnp.zeros((), dtype=jnp.int32)

    ofl_ref[0] = jnp.maximum(ofl_ref[0], block_ofl.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(x2d: jnp.ndarray, scale: jnp.ndarray, interpret: bool = False):
    n, w = x2d.shape
    grid = (pl.cdiv(n, _ROWS),)
    arr, a16, m, ofl = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, w), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, w), lambda i: (i, 0)),
            pl.BlockSpec((_ROWS, w), lambda i: (i, 0)),
            pl.BlockSpec((_ROWS, w), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, w), jnp.int32),
            jax.ShapeDtypeStruct((n, w), jnp.int16),
            jax.ShapeDtypeStruct((n, w), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        interpret=interpret,
    )(scale, x2d)
    return arr, a16, m, ofl


def quantize_compact_m(
    coeffs: jnp.ndarray, q_scale, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused quantize/compact/M over (..., H, W) scaled coefficients.

    Returns (arr_i32, arr_i16, M_i8, overflow_bool) with the input's
    leading shape. ``q_scale`` is the scalar quantization scale (apply
    per-channel multipliers to ``coeffs`` beforehand).
    """
    shape = coeffs.shape
    w = shape[-1]
    x2d = coeffs.reshape(-1, w)
    n = x2d.shape[0]
    pad = (-n) % _ROWS
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    scale = jnp.asarray([q_scale], dtype=coeffs.dtype)
    arr, a16, m, ofl = _run(x2d, scale, interpret=interpret)
    arr = arr[:n].reshape(shape)
    a16 = a16[:n].reshape(shape)
    m = m[:n].reshape(shape).astype(jnp.int8)
    return arr, a16, m, ofl[0] > 0
