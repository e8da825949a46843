"""Virtual-mesh scaling-efficiency proxy (round-4 verdict item 5).

No multi-chip hardware is attached in this environment (single tunneled
chip), so the >=80%-at-N>=2-hosts target cannot be measured for real.
This tool measures the NEXT BEST thing on the 8-virtual-CPU-device mesh
the test suite already uses: STRONG scaling of the sharded pipelines at
fixed total work.  On shared physical cores, ideal partitioning keeps
wall time flat as the device count grows (same FLOPs, same cores), so
t(1)/t(n) isolates the SPMD partitioning + collective overhead — a
regression canary for the sharding design, NOT a hardware scaling
number (that caveat is recorded with the results in BASELINE.md).

Measures:
  * batch-sharded encode analysis (color+DWT+quantize+M/D/G pyramids)
    over mesh axis "batch", n = 1, 2, 4, 8;
  * the halo-exchange sharded DWT (lax.ppermute in shard_map) of ONE
    image over mesh axis "tile", n = 1, 2, 4, 8.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/scaling_efficiency.py
"""

import time

import numpy as np


def _median_time(fn, *args, reps: int = 5) -> float:
    import jax

    jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def measure(n_devices=(1, 2, 4, 8), reps: int = 5) -> dict:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spiht_tpu import SpihtSettings, jax_transform
    from spiht_tpu.parallel import sharded_wavedec2_packed

    devs = jax.devices()
    n_devices = [n for n in n_devices if n <= len(devs)]
    settings = SpihtSettings()
    out = {"analysis": {}, "halo_dwt": {}}

    # --- batch-sharded analysis: fixed total work (8 x 3x256x256, L4)
    batch, h, w, level = 8, 256, 256, 4
    images = np.linspace(0, 1, batch * 3 * h * w, dtype=np.float32)
    images = images.reshape(batch, 3, h, w)
    analysis = jax_transform.analysis_fn(
        settings, level=level, with_maps=True, dtype="float32"
    )
    for n in n_devices:
        mesh = Mesh(np.asarray(devs[:n]), ("batch",))
        xs = jax.device_put(
            jnp.asarray(images), NamedSharding(mesh, P("batch"))
        )
        out["analysis"][n] = _median_time(analysis, xs, reps=reps)

    # --- halo-exchange sharded DWT: ONE 3x1024x1024 image over "tile"
    # (n=1 baseline = the unsharded jitted packed DWT; the shard_map
    # formulation needs >= 2 shards)
    from spiht_tpu.wavelets.dwt import wavedec2_packed

    h1 = w1 = 1024
    im1 = np.linspace(0, 1, 3 * h1 * w1, dtype=np.float32)
    im1 = im1.reshape(1, 3, h1, w1)
    for n in n_devices:
        if n == 1:
            @jax.jit
            def step1(x):
                o, _, _ = wavedec2_packed(x, "bior2.2", "reflect", 3)
                return o

            out["halo_dwt"][1] = _median_time(step1, jnp.asarray(im1),
                                              reps=reps)
            continue
        mesh = Mesh(np.asarray(devs[:n]).reshape(1, n),
                    ("batch", "tile"))

        @jax.jit
        def step(x, mesh=mesh):
            o, _, _ = sharded_wavedec2_packed(
                x, "bior2.2", "reflect", 3, mesh, "tile"
            )
            return o

        xs = jax.device_put(
            jnp.asarray(im1),
            NamedSharding(mesh, P("batch", None, None, "tile")),
        )
        out["halo_dwt"][n] = _median_time(step, xs, reps=reps)

    for k, times in out.items():
        t1 = times.get(1)
        for n, tn in sorted(times.items()):
            eff = t1 / tn if t1 else float("nan")
            print(
                f"{k} n={n}: {tn * 1e3:7.1f} ms  strong-scaling proxy "
                f"efficiency t1/tn = {eff:.2f}",
                flush=True,
            )
    return out


if __name__ == "__main__":
    measure()
