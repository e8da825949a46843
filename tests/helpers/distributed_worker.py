"""Two-process jax.distributed worker (spawned by test_distributed.py).

Usage: python distributed_worker.py <coordinator> <nprocs> <pid> <outdir>

Verifies true process_count>1 behavior end-to-end: distributed init +
barrier, a cross-process collective, host batch slicing, per-host
encoding, and a manifest written for the parent to merge.
"""

import json
import sys


def main():
    coord, nprocs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    # CPU-only: must be selected before any backend/distributed init
    # (the environment preloads a TPU plugin; two processes must not
    # race for the single tunneled chip)
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import numpy as np

    import spiht_tpu
    from spiht_tpu import SpihtSettings, transform
    from spiht_tpu.parallel import (
        encode_manifest,
        host_batch_slice,
        initialize,
    )

    initialize(coordinator_address=coord, num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.process_index() == pid

    # cross-process collective: every process contributes its local
    # device buffers to one global array; the jitted sum must see all
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())  # global device list
    n_global = devs.size
    mesh = Mesh(devs, ("all",))
    sharding = NamedSharding(mesh, P("all"))
    global_shape = (n_global,)
    local_vals = np.array(
        [float(d.id) + 1.0 for d in jax.local_devices()], np.float32
    )
    arr = jax.make_array_from_process_local_data(
        sharding, local_vals, global_shape
    )
    total = float(jax.jit(lambda v: v.sum())(arr))
    expect = sum(float(d.id) + 1.0 for d in devs)
    assert total == expect, (total, expect)

    # per-host slice of a global batch + encode + manifest
    transform._BACKEND = "numpy"
    global_batch = 5
    sl = host_batch_slice(global_batch)
    rng = np.random.default_rng(7)  # same seed everywhere: shared dataset
    images = [rng.random((1, 16, 16)) for _ in range(global_batch)]
    ids = list(range(global_batch))[sl]
    ers = [
        spiht_tpu.encode_image(images[i], SpihtSettings(), 1, 400)
        for i in ids
    ]
    manifest = encode_manifest(ids, ers)
    with open(f"{outdir}/manifest_{pid}.json", "w") as f:
        f.write(manifest)
    with open(f"{outdir}/ok_{pid}", "w") as f:
        json.dump({"devices": n_global, "slice": [sl.start, sl.stop]}, f)


if __name__ == "__main__":
    main()
