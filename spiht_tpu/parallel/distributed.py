"""Multi-host scaling glue.

The reference is strictly single-host (SURVEY.md §1); this module carries
the framework's multi-host story:

 * `initialize()` — thin wrapper over `jax.distributed.initialize` with a
   startup barrier, so every host sees the global device set before any
   mesh is built. On a pod slice, `make_mesh` then spans all hosts and the
   halo exchanges in `parallel.spatial` ride ICI within a host group and
   DCN across groups — placement follows the mesh device order, so put
   "tile" on the minor (intra-host) axis.
 * `host_batch_slice()` — which members of a global batch this host feeds
   (per-host data loading for `jax.make_array_from_process_local_data`).
 * `encode_manifest()` / `merge_manifests()` — per-batch checkpoint
   records (image id -> EncodingResult dict) so a long encoding job can
   resume after a host failure; the stream format itself is embedded /
   prefix-decodable, so partially-written streams remain usable.

These paths are exercised in CI on a single process (n_hosts=1); real
multi-host runs only need the documented `initialize()` call first.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..settings import EncodingResult

__all__ = [
    "initialize",
    "host_batch_slice",
    "encode_manifest",
    "merge_manifests",
    "load_manifest",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host runtime and barrier until all hosts join.

    No-op for single-process runs (num_processes in (None, 0, 1) and no
    coordinator configured).
    """
    import jax

    if not coordinator_address and (num_processes or 1) <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    # barrier: a trivial collective over all global devices
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("all",))
    x = jax.device_put(
        np.zeros((devs.size,), np.float32), NamedSharding(mesh, P("all"))
    )
    jax.block_until_ready(jax.jit(lambda v: v.sum())(x))


def host_batch_slice(global_batch: int, process_index=None, process_count=None) -> slice:
    """The contiguous slice of a global batch owned by this host."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-global_batch // pc)  # ceil
    start = min(pi * per, global_batch)
    stop = min(start + per, global_batch)
    return slice(start, stop)


def encode_manifest(ids: Sequence, results: Sequence[EncodingResult]) -> str:
    """Serialize a batch of encodings as a JSON manifest (checkpoint unit).

    Bytes are hex-encoded; the dict layout reuses EncodingResult's
    reference-compatible `encoding_result_` key prefix.
    """
    records = []
    for i, er in zip(ids, results):
        d = er.to_dict()
        d["encoding_result_encoded_bytes"] = d[
            "encoding_result_encoded_bytes"
        ].hex()
        records.append({"id": i, **d})
    return json.dumps(records)


def load_manifest(text: str) -> Dict[object, EncodingResult]:
    out: Dict[object, EncodingResult] = {}
    for rec in json.loads(text):
        rid = rec.pop("id")
        rec["encoding_result_encoded_bytes"] = bytes.fromhex(
            rec["encoding_result_encoded_bytes"]
        )
        out[rid] = EncodingResult.from_dict(rec)
    return out


def merge_manifests(texts: Iterable[str]) -> Dict[object, EncodingResult]:
    """Union of per-host manifests; later entries win on id collision."""
    out: Dict[object, EncodingResult] = {}
    for t in texts:
        out.update(load_manifest(t))
    return out
