"""Device-encoder benchmark lane: full on-device bitstream MP/s.

Run as `python -m spiht_tpu.codec.device_bench [HxW [level [bpp]]]
[fast=1] [batch=B] [ebatch=B]`; prints ONE json line with the measured
rates at the headline geometry (3x512x512, level 6 — the config
BASELINE.md tracks). Meant to be invoked by bench.py as a budgeted
subprocess (remote compiles through the dev tunnel take minutes on
first run; the persistent jax compilation cache makes reruns take
seconds).

`fast=1` (what bench.py passes) runs only the production Pallas lanes
and the fused pipelines — the legacy XLA formulations (enc_sorted,
dec_hybrid) compile in minutes and run 10-20x slower, and bench.py
never exports their keys; skipping them makes a HEAD refresh cost
seconds on a warm compile cache instead of blowing the driver budget
(the round-4 staleness failure mode).

Transfer-bound lanes report three keys (VERDICT r4 item 5):
  *_materialized — wall time including d2h over this dev tunnel
                   (~20 MB/s, an environment artifact, NOT a device
                   property),
  *_kernel       — device-only rate (result reduced to a checksum on
                   device, nothing ships),
  *_modeled_host — kernel time + bytes/(2 GB/s), the materialized rate
                   a real TPU host's PCIe d2h would see.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_spiht"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np
    import jax.numpy as jnp

    from spiht_tpu import SpihtSettings, transform
    from spiht_tpu.codec.device_encoder import encode_device_fn
    from spiht_tpu.codec.oracle import compute_max_n

    hw = sys.argv[1] if len(sys.argv) > 1 else "512x512"
    h_in, w_in = (int(v) for v in hw.split("x"))
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    bpp = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    fast = any(a == "fast=1" for a in sys.argv[4:])

    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:h_in, 0:w_in].astype(np.float64)
    im = np.stack(
        [
            0.5
            + 0.25 * np.sin(xx / 37.0 + c) * np.cos(yy / 53.0)
            + 0.15 * (xx / w_in > 0.4)
            for c in range(3)
        ]
    )
    im = np.clip(im + 0.05 * rng.standard_normal(im.shape), 0, 1)

    settings = SpihtSettings()
    arr, llh, llw = transform.forward_numpy(im, settings, level)
    c, h, w = arr.shape
    mn = compute_max_n(arr)
    log(f"device bench: backend={jax.default_backend()} geom={arr.shape} "
        f"ll=({llh},{llw}) max_n={mn}")
    ja = jax.device_put(jnp.asarray(arr))
    out = {"geom": f"{c}x{h}x{w}", "level": level,
           "backend": jax.default_backend()}
    on_tpu = jax.default_backend() != "cpu"
    from spiht_tpu.native import runtime

    nat = runtime.load()
    # encode lanes: the Pallas emission machine (production path on
    # TPU) and the sorted-space XLA formulation. Timing materializes
    # the result (np.asarray): block_until_ready alone can return
    # before execution completes on the tunnel.
    enc_lanes = [("enc_sorted",
                  lambda mb: encode_device_fn(c, h, w, llh, llw))]
    if on_tpu:
        from spiht_tpu.codec.pallas_encoder import (
            _cap_words_for, pallas_encode_fn, preferred_machine,
        )

        enc_lanes.insert(0, ("", lambda mb: pallas_encode_fn(
            c, h, w, llh, llw, _cap_words_for(c, h, w, mb),
            machine=preferred_machine(
                c, h, w, llh, llw, _cap_words_for(c, h, w, mb), mn
            ))))
        if fast:
            enc_lanes = enc_lanes[:1]
    else:
        enc_lanes[0] = ("", enc_lanes[0][1])
    for tag, mb in (
        ("full", 2**31 - 2),
        (f"{bpp}bpp", int(round(bpp * h_in * w_in))),
    ):
        for lane, mkfn in enc_lanes:
            fn = mkfn(mb)
            t0 = time.perf_counter()
            words, total, ovf = fn(ja, mn, mb)
            words_h = np.asarray(words)
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t1 = time.perf_counter()
                words, total, ovf = fn(ja, mn, mb)
                words_h = np.asarray(words)
                ts.append(time.perf_counter() - t1)
            med = sorted(ts)[1]
            mpps = c * h * w / 1e6 / med
            key = f"{lane}_{tag}" if lane else tag
            log(f"encode[{lane or 'enc'}] {tag}: first {compile_s:.1f}s, "
                f"median {med*1e3:.0f} ms = {mpps:.2f} MP/s, "
                f"bits={int(total)}")
            out[f"mpps_{key}"] = round(mpps, 3)
            out[f"ms_{key}"] = round(med * 1e3, 1)
            if nat is not None:
                want, wmn = nat.encode(arr, llh, llw, min(mb, 2**31 - 2))
                t = int(total)
                got = words_h.view(np.uint8)[: (t + 7) // 8].tobytes()
                exact = (wmn == int(mn)) and (got == want)
                out[f"exact_{key}"] = bool(exact)
                log(f"encode[{lane or 'enc'}] {tag}: bit-exact vs "
                    f"native = {exact}")
                if not exact:
                    log(f"  native bits={len(want)*8} device bits={t}")

    # ---- decoder lanes: the Pallas bit machine (production path on
    # TPU backends) and the hybrid XLA machine (CPU fallback / vmap
    # batching), both on the same streams, both exactness-checked.
    # Timing materializes the result (np.asarray): on the tunnel,
    # block_until_ready alone can return before execution completes.
    from spiht_tpu.codec.device_decoder import decode_device_fn, _words_of
    from spiht_tpu.native import runtime

    nat = runtime.load()
    on_tpu = jax.default_backend() != "cpu"
    for tag, mb in (
        ("full", 2**31 - 2),
        (f"{bpp}bpp", int(round(bpp * h_in * w_in))),
    ):
        data, dmn = nat.encode(arr, llh, llw, mb)
        nbits = len(data) * 8
        cap_words = max((nbits + 31) // 32, 1)
        want_rec = nat.decode(data, dmn, c, h, w, llh, llw)
        lanes = [("dec_hybrid",
                  decode_device_fn(c, h, w, llh, llw, cap_words))]
        od = "int32"
        if on_tpu:
            from spiht_tpu.codec.pallas_decoder import pallas_decode_fn

            # production shipping: int16 rec when max_n <= 13 (halves
            # d2h; value-identical — decode_device does the same)
            od = "int16" if int(dmn) <= 13 else "int32"
            lanes.insert(
                0, ("dec", pallas_decode_fn(c, h, w, llh, llw, cap_words,
                                            out_dtype=od))
            )
            if fast:
                lanes = lanes[:1]
        else:
            lanes[0] = ("dec", lanes[0][1])
        jw = jax.device_put(jnp.asarray(_words_of(data, cap_words)))
        for lane, dfn in lanes:
            t0 = time.perf_counter()
            rec = np.asarray(dfn(jw, nbits, dmn))
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t1 = time.perf_counter()
                rec = np.asarray(dfn(jw, nbits, dmn))
                ts.append(time.perf_counter() - t1)
            med = sorted(ts)[1]
            mpps = c * h * w / 1e6 / med
            exact = bool(np.array_equal(rec, want_rec))
            log(f"decode[{lane}] {tag}: first {compile_s:.1f}s, median "
                f"{med*1e3:.0f} ms = {mpps:.2f} MP/s (materialized), "
                f"exact={exact}")
            out[f"mpps_{lane}_{tag}"] = round(mpps, 3)
            out[f"ms_{lane}_{tag}"] = round(med * 1e3, 1)
            out[f"exact_{lane}_{tag}"] = exact
            if lane != "dec" or not on_tpu:
                continue
            # kernel-side + modeled-real-host rates: the materialized
            # figure above is d2h-bound on this ~20 MB/s dev tunnel
            kmed = _kernel_rate(jax, jnp, np, dfn, (jw, nbits, dmn))
            nbytes = c * h * w * (2 if od == "int16" else 4)
            _emit_transfer_keys(
                out, f"{lane}_{tag}", c * h * w, kmed, nbytes, med
            )

    # ---- fused encode pipeline lane: image -> stream, one program;
    # exactness vs native encode of the device-quantized (f32) array
    try:
        from spiht_tpu import jax_transform

        mb = int(round(bpp * h_in * w_in))
        efn = jax_transform.encode_pipeline_fn(
            settings, h_in, w_in, level, 3, dtype="float32"
        )
        jim = jax.device_put(jnp.asarray(im, jnp.float32))
        t0 = time.perf_counter()
        ewords, etotal, eovf, emn = efn(jim, mb)
        ewords_h = np.asarray(ewords)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            ewords, etotal, eovf, emn = efn(jim, mb)
            ewords_h = np.asarray(ewords)
            ts.append(time.perf_counter() - t1)
        med = sorted(ts)[1]
        # ground truth: native encode of the SAME f32-quantized array
        arr32 = np.asarray(
            jax_transform.analysis_fn(
                settings, level=level, with_maps=False, dtype="float32"
            )(jim)
        )
        want, wmn = nat.encode(arr32, llh, llw, mb)
        t = int(etotal)
        got = np.asarray(ewords).view(np.uint8)[: (t + 7) // 8].tobytes()
        exact = (
            not bool(eovf)
            and int(emn) == wmn
            and got == want
        )
        log(f"encode pipeline {bpp}bpp image->stream: first "
            f"{compile_s:.1f}s, median {med*1e3:.0f} ms (materialized), "
            f"exact={exact}")
        out[f"ms_enc_pipeline_{bpp}bpp"] = round(med * 1e3, 1)
        out[f"exact_enc_pipeline_{bpp}bpp"] = exact
        kmed = _kernel_rate(jax, jnp, np, efn, (jim, mb))
        _emit_transfer_keys(
            out, f"enc_pipeline_{bpp}bpp", c * h * w, kmed,
            ewords_h.nbytes, med,
        )
    except Exception as exc:
        log(f"encode pipeline lane failed: {type(exc).__name__}: {exc}")

    # ---- fused pipeline lane: stream words -> uint8 image, one program
    # (bit-parse + dequantize + inverse DWT + inverse color on device)
    try:
        from spiht_tpu import jax_transform

        mb = int(round(bpp * h_in * w_in))
        data, dmn = nat.encode(arr, llh, llw, mb)
        nbits = len(data) * 8
        cap_words = max((nbits + 31) // 32, 1)
        pfn = jax_transform.decode_pipeline_fn(
            settings, h_in, w_in, level, c, h, w, llh, llw, cap_words,
            dtype="float32", as_uint8=True,
        )
        jw = jax.device_put(jnp.asarray(_words_of(data, cap_words)))
        t0 = time.perf_counter()
        img_h = np.asarray(pfn(jw, nbits, dmn))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            img_h = np.asarray(pfn(jw, nbits, dmn))
            ts.append(time.perf_counter() - t1)
        med = sorted(ts)[1]
        log(f"decode pipeline {bpp}bpp -> uint8 image: first "
            f"{compile_s:.1f}s, median {med*1e3:.0f} ms (materialized)")
        out[f"ms_pipeline_{bpp}bpp"] = round(med * 1e3, 1)
        kmed = _kernel_rate(jax, jnp, np, pfn, (jw, nbits, dmn))
        _emit_transfer_keys(
            out, f"dec_pipeline_{bpp}bpp", c * h * w, kmed,
            img_h.nbytes, med,
        )
    except Exception as exc:
        log(f"pipeline lane failed: {type(exc).__name__}: {exc}")

    # ---- batched decode lane (opt-in: pass a 4th arg "batch=B"):
    # B lockstep vmapped hybrid machines over same-geometry streams
    batch = ebatch = 0
    for a in sys.argv[4:]:
        if a.startswith("batch="):
            batch = int(a.split("=")[1])
        if a.startswith("ebatch="):
            ebatch = int(a.split("=")[1])
    if batch:
        try:
            _batch_lane(
                batch, bpp, h_in, w_in, im, settings, level, nat, c, h,
                w, llh, llw, out,
            )
        except Exception as exc:
            log(f"batch decode lane failed: {type(exc).__name__}: {exc}")
    if ebatch:
        try:
            _encode_batch_lane(
                ebatch, bpp, h_in, w_in, im, settings, level, nat, c, h,
                w, llh, llw, out,
            )
        except Exception as exc:
            log(f"batch encode lane failed: {type(exc).__name__}: {exc}")
    # ---- interleaved B-chain machines (production batched lanes):
    # one kernel steps B machines per iteration (BASELINE.md rounds
    # 3-4). Default B=16 on TPU (the compact encode layout fits B=16
    # and hits 30.1 MP/s aggregate); SPIHT_TPU_BENCH_ILV=0 disables.
    if on_tpu and os.environ.get("SPIHT_TPU_BENCH_ILV", "16") not in (
        "0", ""
    ):
        try:
            _ilv_lane(
                int(os.environ.get("SPIHT_TPU_BENCH_ILV", "16")), bpp,
                h_in, w_in, im, settings, level, nat, c, h, w, llh,
                llw, out,
            )
        except Exception as exc:
            log(f"interleaved lane failed: {type(exc).__name__}: {exc}")
    # only the headline config refreshes the bench.py fallback cache
    if (h_in, w_in, level) == (512, 512, 6):
        _persist(out, fast=fast)
    print(json.dumps(out))


def _kernel_rate(jax, jnp, np, fn, args):
    """Median device-only time: reduce fn's (first) output to a scalar
    checksum on device so only 4 bytes ship. Materializing the scalar
    (np.asarray) is required on the tunnel — block_until_ready can
    return before execution completes."""
    import time

    inner = getattr(fn, "__wrapped__", fn)

    @jax.jit
    def ksum(*a):
        r = inner(*a)
        r = r[0] if isinstance(r, tuple) else r
        return jnp.sum(r.astype(jnp.int32))

    np.asarray(ksum(*args))
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        np.asarray(ksum(*args))
        ts.append(time.perf_counter() - t1)
    return sorted(ts)[1]


def _emit_transfer_keys(out, key, px, kernel_s, nbytes, mat_s=None):
    """The three-rate report for transfer-bound lanes (module docstring):
    kernel-only, tunnel-materialized, and modeled real-host (PCIe d2h
    ~2 GB/s on production TPU hosts)."""
    out[f"mpps_{key}_kernel"] = round(px / 1e6 / kernel_s, 3)
    model_s = kernel_s + nbytes / 2e9
    out[f"mpps_{key}_modeled_host"] = round(px / 1e6 / model_s, 3)
    if mat_s is not None:
        out[f"mpps_{key}_materialized"] = round(px / 1e6 / mat_s, 3)
    log(f"  {key}: kernel {kernel_s*1e3:.0f} ms = "
        f"{out[f'mpps_{key}_kernel']:.2f} MP/s; modeled real-host "
        f"(+{nbytes/2e9*1e3:.1f} ms PCIe) = "
        f"{out[f'mpps_{key}_modeled_host']:.2f} MP/s")


def _batch_lane(batch, bpp, h_in, w_in, im, settings, level, nat, c, h,
                w, llh, llw, out):
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spiht_tpu import transform
    from spiht_tpu.codec.device_decoder import _decode_batch_fn

    mb = int(round(bpp * h_in * w_in))
    datas = []
    for b in range(batch):
        im_b = np.clip(
            im + 0.03 * np.random.default_rng(b).standard_normal(
                im.shape
            ),
            0,
            1,
        )
        arr_b, _, _ = transform.forward_numpy(im_b, settings, level)
        d, n_b = nat.encode(arr_b.astype(np.int32), llh, llw, mb)
        datas.append((d, n_b, arr_b))
    cap_words = max((max(len(d) for d, _, _ in datas) + 3) // 4, 1)
    words = np.zeros((batch, cap_words), np.uint32)
    nbits_a = np.zeros(batch, np.int32)
    ns_a = np.zeros(batch, np.int32)
    for b, (d, n_b, _) in enumerate(datas):
        raw = np.frombuffer(d, dtype=np.uint8)
        words[b, : (raw.size + 3) // 4] = np.pad(
            raw, (0, -raw.size % 4)
        ).view(np.uint32)
        nbits_a[b] = len(d) * 8
        ns_a[b] = n_b
    bfn = _decode_batch_fn(c, h, w, llh, llw, cap_words)
    jw = jax.device_put(jnp.asarray(words))
    jn = jax.device_put(jnp.asarray(nbits_a))
    jns = jax.device_put(jnp.asarray(ns_a))
    t0 = time.perf_counter()
    recs = bfn(jw, jn, jns)
    jax.block_until_ready(recs)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        recs = bfn(jw, jn, jns)
        jax.block_until_ready(recs)
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[1]
    mpps = batch * c * h * w / 1e6 / med
    recs_h = np.asarray(recs)
    exact = all(
        np.array_equal(
            recs_h[b],
            nat.decode(d, n_b, c, h, w, llh, llw),
        )
        for b, (d, n_b, _) in enumerate(datas)
    )
    log(f"decode batch={batch} @{bpp}bpp: first {compile_s:.1f}s, "
        f"median {med*1e3:.0f} ms = {mpps:.2f} MP/s aggregate, "
        f"{med*1e3/batch:.0f} ms/stream, exact={exact}")
    out["batch"] = batch
    out[f"mpps_dec_batch{batch}"] = round(mpps, 3)
    out[f"exact_dec_batch{batch}"] = exact


def _encode_batch_lane(batch, bpp, h_in, w_in, im, settings, level, nat,
                       c, h, w, llh, llw, out):
    """B lockstep vmapped device encoders over same-geometry images
    (`encode_device_batch`'s jitted core, timed without host prep)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spiht_tpu import transform
    from spiht_tpu.codec.device_encoder import _encode_device_batch_fn
    from spiht_tpu.codec.oracle import compute_max_n

    mb = int(round(bpp * h_in * w_in))
    arrs, wants, mns = [], [], []
    for b in range(batch):
        im_b = np.clip(
            im + 0.03 * np.random.default_rng(b).standard_normal(im.shape),
            0,
            1,
        )
        arr_b, _, _ = transform.forward_numpy(im_b, settings, level)
        arr_b = arr_b.astype(np.int32)
        arrs.append(arr_b)
        wants.append(nat.encode(arr_b, llh, llw, mb))
        mns.append(compute_max_n(arr_b))
    bfn = _encode_device_batch_fn(c, h, w, llh, llw)
    ja = jax.device_put(jnp.asarray(np.stack(arrs)))
    jmn = jax.device_put(jnp.asarray(np.array(mns, np.int32)))
    jmb = jax.device_put(jnp.full(batch, mb, jnp.int32))
    t0 = time.perf_counter()
    words, totals, ovf = bfn(ja, jmn, jmb)
    jax.block_until_ready(words)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        words, totals, ovf = bfn(ja, jmn, jmb)
        jax.block_until_ready(words)
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[1]
    mpps = batch * c * h * w / 1e6 / med
    words_h = np.asarray(words)
    totals_h = np.asarray(totals)
    exact = not bool(np.asarray(ovf).any())
    for b, (want, wmn) in enumerate(wants):
        t = int(totals_h[b])
        got = words_h[b].view(np.uint8)[: (t + 7) // 8].tobytes()
        exact = exact and wmn == mns[b] and got == want
    log(f"encode batch={batch} @{bpp}bpp: first {compile_s:.1f}s, "
        f"median {med*1e3:.0f} ms = {mpps:.2f} MP/s aggregate, "
        f"{med*1e3/batch:.0f} ms/stream, exact={exact}")
    out["ebatch"] = batch
    out[f"mpps_enc_batch{batch}"] = round(mpps, 3)
    out[f"exact_enc_batch{batch}"] = exact


def _ilv_lane(B, bpp, h_in, w_in, im, settings, level, nat, c, h, w,
              llh, llw, out):
    """Interleaved B-chain encode + decode aggregates, every lane
    bit-exact vs native (pallas_{en,de}coder._interleaved_fn)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spiht_tpu import transform
    from spiht_tpu.codec import pallas_decoder as pd
    from spiht_tpu.codec import pallas_encoder as pe
    from spiht_tpu.codec.device_decoder import _words_of
    from spiht_tpu.codec.oracle import compute_max_n

    mb = int(round(bpp * h_in * w_in))
    arrs, wants, mns = [], [], []
    for b in range(B):
        im_b = np.clip(
            im + 0.03 * np.random.default_rng(b).standard_normal(im.shape),
            0, 1,
        )
        arr_b, _, _ = transform.forward_numpy(im_b, settings, level)
        arr_b = arr_b.astype(np.int32)
        arrs.append(arr_b)
        wants.append(nat.encode(arr_b, llh, llw, mb))
        mns.append(compute_max_n(arr_b))

    # ---- encode ----
    cap_words = pe._cap_words_for(c, h, w, mb)
    # production routing: the compact layout when valid (max_n <= 15),
    # else the standard 2-table layout (see pallas_encode_batch)
    compact = max(mns) <= 15 and pe.interleaved_fits(
        B, c, h, w, llh, llw, cap_words, compact=True
    )
    if compact or pe.interleaved_fits(B, c, h, w, llh, llw, cap_words):
        efn = pe._interleaved_fn(B, c, h, w, llh, llw, cap_words,
                                 compact=compact)
        ja = jax.device_put(jnp.asarray(np.stack(arrs)))
        jmn = jax.device_put(jnp.asarray(np.array(mns, np.int32)))
        jmb = jax.device_put(jnp.full(B, mb, jnp.int32))
        t0 = time.perf_counter()
        words, totals, ovf = efn(ja, jmn, jmb)
        words_h = np.asarray(words)
        first = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            words, totals, ovf = efn(ja, jmn, jmb)
            words_h = np.asarray(words)
            ts.append(time.perf_counter() - t1)
        med = sorted(ts)[1]
        totals_h = np.asarray(totals)
        exact = not bool(np.asarray(ovf).any())
        for b, (want, wmn) in enumerate(wants):
            t = int(totals_h[b])
            got = words_h[b].view(np.uint8)[: (t + 7) // 8].tobytes()
            exact = exact and wmn == mns[b] and got == want
        mpps = B * c * h * w / 1e6 / med
        tag = "compact" if compact else "standard"
        log(f"encode ilv B={B} ({tag}) @{bpp}bpp: first {first:.1f}s, "
            f"median {med*1e3:.0f} ms = {mpps:.2f} MP/s aggregate, "
            f"exact={exact}")
        out[f"mpps_enc_ilv{B}"] = round(mpps, 3)
        out[f"exact_enc_ilv{B}"] = exact
        kmed = _kernel_rate(jax, jnp, np, efn, (ja, jmn, jmb))
        _emit_transfer_keys(
            out, f"enc_ilv{B}", B * c * h * w, kmed,
            B * cap_words * 4, med,
        )

    # ---- decode ----
    datas = [wants[b][0] for b in range(B)]
    cap_words = max(max((len(d) * 8 + 31) // 32 for d in datas), 1)
    if pd.interleaved_fits(B, c, h, w, llh, llw, cap_words):
        od = "int16" if max(mns) <= 13 else "int32"
        dfn = pd._interleaved_fn(B, c, h, w, llh, llw, cap_words,
                                 False, od)
        jw = jax.device_put(jnp.asarray(
            np.stack([_words_of(d, cap_words) for d in datas])
        ))
        jn = jax.device_put(jnp.asarray(
            np.array([len(d) * 8 for d in datas], np.int32)
        ))
        jm = jax.device_put(jnp.asarray(np.array(mns, np.int32)))
        t0 = time.perf_counter()
        rec = np.asarray(dfn(jw, jn, jm))
        first = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            rec = np.asarray(dfn(jw, jn, jm))
            ts.append(time.perf_counter() - t1)
        med = sorted(ts)[1]
        exact = all(
            np.array_equal(
                rec[b].astype(np.int32),
                nat.decode(datas[b], mns[b], c, h, w, llh, llw),
            )
            for b in range(B)
        )
        mpps = B * c * h * w / 1e6 / med
        log(f"decode ilv B={B} @{bpp}bpp: first {first:.1f}s, median "
            f"{med*1e3:.0f} ms = {mpps:.2f} MP/s aggregate "
            f"(materialized), exact={exact}")
        out[f"mpps_dec_ilv{B}"] = round(mpps, 3)
        out[f"exact_dec_ilv{B}"] = exact

        kmed = _kernel_rate(jax, jnp, np, dfn, (jw, jn, jm))
        nbytes = B * c * h * w * (2 if od == "int16" else 4)
        _emit_transfer_keys(
            out, f"dec_ilv{B}", B * c * h * w, kmed, nbytes, med
        )


def _persist(out, fast=False):
    """Record for bench.py: on tunneled dev chips the first remote
    compile (~400 s) rarely fits the driver's benchmark window, so the
    last successful hardware measurement is reported (clearly labeled
    with the commit it was measured at).

    A fast-lane run MERGES into the existing cache: it re-measures every
    key bench.py exports (the production Pallas lanes + fused
    pipelines) and keeps the legacy-lane keys (enc_sorted/dec_hybrid,
    not exported) from the last full run, noting their provenance in
    ``legacy_commit``."""
    import json

    try:
        import subprocess

        here = __file__.rsplit("/spiht_tpu/", 1)[0]
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=here,
            capture_output=True, text=True,
        ).stdout.strip()
        path = f"{here}/.bench_device_cache.json"
        if fast:
            try:
                with open(path) as f:
                    prior = json.load(f)
            except Exception:
                prior = {}
            if prior and prior.get("commit") != commit:
                prior["legacy_commit"] = prior.get("commit")
            prior.pop("commit", None)
            prior.pop("cached", None)
            prior.pop("commit_distance", None)
            prior.update(out)
            out = prior
        out["commit"] = commit
        with open(path, "w") as f:
            json.dump(out, f)
    except Exception as e:
        log(f"cache write failed: {e}")


if __name__ == "__main__":
    main()
