"""Shard-consistency and numerical sanitizer utilities (SURVEY §6).

XLA's SPMD execution is race-free by construction, but two failure
classes remain worth asserting in debug runs:

 * replication drift — a value that is SUPPOSED to be identical on every
   device (e.g. the reassembled subbands the sharded DWT returns with
   `out_specs=P()`, or psum-reduced statistics) diverging because of a
   wrong collective or a non-deterministic reduction order;
 * silent NaN/Inf/overflow inside a jitted pipeline.

`replication_discrepancy` measures the first ON DEVICE (one shard_map +
all_gather; returns the max abs deviation from shard 0, exactly 0 for a
truly replicated value). `checked_call` wraps any jittable function
with `jax.experimental.checkify` float checks (NaN/Inf) and raises on
the host. Both are opt-in debug tools: the production paths stay
assert-free (the codec's cheap NaN guard lives in
`codec.api._validate_image` under SPIHT_TPU_VALIDATE=1).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .spatial import shard_map

__all__ = [
    "replication_discrepancy",
    "assert_replicated",
    "checked_call",
]


def replication_discrepancy(
    x: jnp.ndarray, mesh: Mesh, axis_name: str
) -> jnp.ndarray:
    """Max |per-device value - device 0's value| for a replicated array.

    Runs on device: each shard contributes its local copy of the
    (supposedly replicated) value; an all_gather compares every copy to
    the first. Returns a scalar (0.0 iff bit-identically replicated,
    for floats without NaNs).
    """
    n = mesh.shape[axis_name]

    def body(v):
        g = lax.all_gather(v, axis_name)  # (n, ...)
        ref = g[0]
        return jnp.max(jnp.abs(g - ref).astype(jnp.float32))

    # every shard receives the FULL value (replicated in-spec)
    out = shard_map(
        body, mesh=mesh, in_specs=(P(),), out_specs=P()
    )(x)
    del n
    return out


def assert_replicated(
    x: jnp.ndarray, mesh: Mesh, axis_name: str, atol: float = 0.0
) -> None:
    """Host-raising form of `replication_discrepancy`."""
    d = float(replication_discrepancy(x, mesh, axis_name))
    if not (d <= atol):
        raise AssertionError(
            f"value is not replicated across '{axis_name}': "
            f"max deviation {d} > {atol}"
        )


def checked_call(fn, *args, **kwargs):
    """Run a jittable function under checkify float checks (NaN/Inf).

    Raises jax.experimental.checkify.JaxRuntimeError on the host if any
    intermediate produces a NaN/Inf. Use for debugging numerical issues
    inside jitted pipelines (e.g. a color model fed out-of-gamut data):

        out = checked_call(jax_transform.analysis_fn(settings, 4), batch)
    """
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    err, out = jax.jit(checked)(*args, **kwargs)
    err.throw()
    return out
