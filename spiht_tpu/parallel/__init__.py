"""Parallel/scaling layer: device meshes, batch DP, spatial sharding.

The reference is single-threaded, single-host (SURVEY.md §1: no
parallelism anywhere); this package is where the TPU framework scales:

  * mesh.py    — (batch, tile) mesh construction + canonical shardings
  * spatial.py — halo-exchange sharded DWT (ppermute over ICI)

Batch data-parallel transforms need no special code: the jitted analysis
programs in spiht_tpu.jax_transform accept a batch-sharded input (see
mesh.batch_sharding) and XLA partitions them trivially; __graft_entry__'s
dryrun_multichip exercises exactly that.
"""

from .mesh import batch_sharding, image_sharding, make_mesh
from .spatial import (
    sharded_dwt2_level1,
    sharded_plane_stats,
    sharded_wavedec2_packed,
)
from .consistency import (
    assert_replicated,
    checked_call,
    replication_discrepancy,
)
from .codec import encode_image_sharded
from .distributed import (
    encode_manifest,
    host_batch_slice,
    initialize,
    load_manifest,
    merge_manifests,
)
from .health import (
    DeviceHealth,
    healthy_devices,
    probe_devices,
    robust_encode_images,
    run_with_failover,
)

__all__ = [
    "sharded_plane_stats",
    "assert_replicated",
    "checked_call",
    "replication_discrepancy",
    "make_mesh",
    "batch_sharding",
    "image_sharding",
    "sharded_dwt2_level1",
    "sharded_wavedec2_packed",
    "encode_image_sharded",
    "initialize",
    "host_batch_slice",
    "encode_manifest",
    "load_manifest",
    "merge_manifests",
    "DeviceHealth",
    "probe_devices",
    "healthy_devices",
    "run_with_failover",
    "robust_encode_images",
]
