"""Command-line tools: encode/decode one image, progressive-decode GIF.

Feature parity with the reference scripts (encode_decode.py:17-91 CLI and
make_gif.py:43-97 progressive decode), re-built on the TPU pipeline:

  python -m spiht_tpu.cli encode-decode IMAGE [--bpp B] [--level L] ...
  python -m spiht_tpu.cli progressive IMAGE OUT.gif [--frames N] ...
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np

from . import codec
from .settings import SpihtSettings
from .utils import imload, imsave


def _settings_from_args(args) -> SpihtSettings:
    pcs = None
    if args.per_channel_quant_scales:
        pcs = [float(v) for v in args.per_channel_quant_scales.split(",")]
    return SpihtSettings(
        wavelet=args.wavelet,
        quantization_scale=args.quantization_scale,
        mode=args.mode,
        color_model=args.color_model,
        per_channel_quant_scales=pcs,
    )


def _auto_level(h: int, w: int) -> int:
    """Reference auto-level: floor(min(log2(h/8), log2(w/8)))
    (encode_decode.py:33-38)."""
    return int(math.floor(min(math.log2(h / 8), math.log2(w / 8))))


def _add_codec_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--wavelet", default="bior2.2")
    p.add_argument("--quantization-scale", type=float, default=50.0)
    p.add_argument("--mode", default="reflect")
    p.add_argument("--color-model", default=None)
    p.add_argument(
        "--per-channel-quant-scales",
        default=None,
        help="comma-separated, e.g. '100,20,20'",
    )
    p.add_argument("--level", type=int, default=None)
    p.add_argument("--bpp", type=float, default=1.0)
    p.add_argument(
        "--backend",
        choices=["auto", "native", "jax", "numpy", "device"],
        default="native",
        help="transform backend; 'native' (C++ f64, default: fastest for "
        "one-shot CLI use), 'jax' (device/TPU, amortizes its jit compile "
        "over batches), 'numpy' (trusted reference), 'device' (the whole "
        "codec as single fused XLA programs: encode_image_device / "
        "decode_image_device)",
    )
    p.add_argument("--stats", action="store_true",
                   help="print per-stage timings and bit-plane histogram")


def _apply_backend(args) -> None:
    from . import transform

    if args.backend == "device":
        return  # fused-pipeline calls dispatch explicitly
    if args.backend != "auto":
        transform._BACKEND = args.backend


def cmd_encode_decode(args) -> int:
    if args.bpp <= 0:
        print("error: --bpp must be > 0", file=sys.stderr)
        return 2
    _apply_backend(args)
    image = imload(args.image)
    c, h, w = image.shape
    settings = _settings_from_args(args)
    level = args.level if args.level is not None else _auto_level(h, w)
    max_bits = round(args.bpp * h * w)

    t0 = time.perf_counter()
    if args.backend == "device":
        er = codec.api.encode_image_device(
            image, settings, level=level, max_bits=max_bits
        )
    else:
        er = codec.api.encode_image(
            image, settings, level=level, max_bits=max_bits
        )
    t_enc = time.perf_counter() - t0
    nbytes = len(er.encoded_bytes)
    print(f"encoded {c}x{h}x{w} at level={level}: {nbytes} bytes "
          f"({nbytes*8/(h*w):.4f} bpp) in {t_enc*1e3:.1f} ms")

    slices, enc_h, enc_w = codec.api.get_slices_and_h_w(h, w, settings, level)
    print(f"coeff array {enc_h}x{enc_w}, ll "
          f"{slices[0][1].stop}x{slices[0][2].stop}, max_n={er.max_n}")

    t0 = time.perf_counter()
    if args.backend == "device":
        rec = codec.api.decode_image_device(er, settings)
    else:
        rec = codec.api.decode_image(er, settings)
    t_dec = time.perf_counter() - t0
    rec_c = rec[..., :h, :w]
    mean_l2 = float(np.mean((rec_c - image) ** 2))
    mse = np.mean((np.clip(rec_c, 0, 1) - image) ** 2)
    psnr = 10 * math.log10(1.0 / mse) if mse > 0 else float("inf")
    print(f"decoded in {t_dec*1e3:.1f} ms; mean L2 {mean_l2:.3e}; "
          f"PSNR {psnr:.2f} dB")

    if args.stats:
        from . import metrics

        st = metrics.encode_stats(image, er, t_enc, reconstruction=rec_c)
        print(st.to_json())
        hist = metrics.bits_per_plane(er, settings)
        print("bits per plane:",
              {n: hist[n] for n in sorted(hist, reverse=True)})

    if args.out:
        imsave(args.out, rec_c)
        print(f"wrote {args.out}")
    return 0


def _write_stream(path: str, er) -> None:
    """Container file: one JSON header line + raw stream bytes.

    The header carries the out-of-band framing (EncodingResult fields);
    codec settings remain a pre-shared contract, as in the reference.
    """
    import json

    d = er.to_dict()
    data = d.pop("encoding_result_encoded_bytes")
    with open(path, "wb") as f:
        f.write(json.dumps(d).encode() + b"\n")
        f.write(data)


def _read_stream(path: str):
    import json

    from .settings import EncodingResult

    with open(path, "rb") as f:
        header = json.loads(f.readline().decode())
        data = f.read()
    header["encoding_result_encoded_bytes"] = data
    return EncodingResult.from_dict(header)


def cmd_encode(args) -> int:
    if args.bpp <= 0:
        print("error: --bpp must be > 0", file=sys.stderr)
        return 2
    _apply_backend(args)
    image = imload(args.image)
    c, h, w = image.shape
    settings = _settings_from_args(args)
    level = args.level if args.level is not None else _auto_level(h, w)
    t0 = time.perf_counter()
    er = codec.api.encode_image(
        image, settings, level=level, max_bits=round(args.bpp * h * w)
    )
    t_enc = time.perf_counter() - t0
    _write_stream(args.out, er)
    print(f"encoded {c}x{h}x{w} -> {args.out}: {len(er.encoded_bytes)} bytes "
          f"({len(er.encoded_bytes)*8/(h*w):.4f} bpp) in {t_enc*1e3:.1f} ms")
    print("note: decoding requires the same codec settings "
          "(they are a pre-shared contract, not stored in the stream)")
    return 0


def cmd_decode(args) -> int:
    _apply_backend(args)
    settings = _settings_from_args(args)
    try:
        er = _read_stream(args.stream)
    except FileNotFoundError:
        print(f"error: no such stream file: {args.stream}", file=sys.stderr)
        return 2
    except (ValueError, KeyError):
        print(f"error: {args.stream} is not a spiht stream file",
              file=sys.stderr)
        return 2
    t0 = time.perf_counter()
    rec = codec.api.decode_image(er, settings)[..., : er.h, : er.w]
    t_dec = time.perf_counter() - t0
    imsave(args.out, np.clip(rec, 0, 1))
    print(f"decoded {er.c}x{er.h}x{er.w} from {args.stream} "
          f"in {t_dec*1e3:.1f} ms -> {args.out}")
    return 0


def cmd_batch(args) -> int:
    """Batch-encode many images to stream files on the production
    batched lanes: backend 'device' sends same-shape groups through
    `encode_images_device` (one fused XLA program per group; on TPU the
    interleaved B-chain Pallas machines), anything else through
    `encode_images` (the multithreaded native host pipeline). Mixed
    shapes are grouped automatically; per-image bit budgets follow
    --bpp at each image's own geometry."""
    import os
    from collections import defaultdict

    if args.bpp <= 0:
        print("error: --bpp must be > 0", file=sys.stderr)
        return 2
    _apply_backend(args)
    settings = _settings_from_args(args)
    os.makedirs(args.outdir, exist_ok=True)
    loaded = []
    for path in args.images:
        try:
            loaded.append((path, imload(path)))
        except (FileNotFoundError, OSError) as e:
            print(f"error: cannot read {path}: {e}", file=sys.stderr)
            return 2
    groups = defaultdict(list)
    for i, (_, im) in enumerate(loaded):
        groups[im.shape].append(i)
    results = [None] * len(loaded)
    t0 = time.perf_counter()
    for shape, idxs in groups.items():
        _, h, w = shape
        level = args.level if args.level is not None else _auto_level(h, w)
        ims = [loaded[i][1] for i in idxs]
        mb = round(args.bpp * h * w)
        if args.backend == "device":
            ers = codec.api.encode_images_device(
                ims, settings, level=level, max_bits=mb
            )
        else:
            ers = codec.api.encode_images(
                ims, settings, level=level, max_bits=mb
            )
        for i, er in zip(idxs, ers):
            results[i] = er
    t_enc = time.perf_counter() - t0
    total_px = 0
    # inputs from different directories can share a basename stem;
    # disambiguate so nothing is silently overwritten in --outdir
    seen: dict = {}
    for (path, im), er in zip(loaded, results):
        stem = os.path.splitext(os.path.basename(path))[0]
        n_prior = seen.get(stem, 0)
        seen[stem] = n_prior + 1
        if n_prior:
            stem = f"{stem}-{n_prior}"
        out_path = os.path.join(args.outdir, stem + ".spiht")
        _write_stream(out_path, er)
        total_px += im.shape[1] * im.shape[2]
        print(f"{path} -> {out_path}: {len(er.encoded_bytes)} bytes "
              f"({len(er.encoded_bytes)*8/(im.shape[1]*im.shape[2]):.4f} "
              f"bpp)")
    print(f"encoded {len(loaded)} images ({total_px/1e6:.2f} MP) in "
          f"{t_enc*1e3:.1f} ms = {total_px/1e6/t_enc:.2f} MP/s aggregate")
    return 0


def cmd_plan(args) -> int:
    """Rate plan WITHOUT encoding: per-plane bit counts + budget cut."""
    import json

    _apply_backend(args)
    image = imload(args.image)
    c, h, w = image.shape
    settings = _settings_from_args(args)
    level = args.level if args.level is not None else _auto_level(h, w)
    from .codec.planning import plan_image

    plan = plan_image(
        image, settings, level=level, max_bits=round(args.bpp * h * w)
    )
    plan["planned_bpp"] = plan["total_bits"] / (h * w)
    print(json.dumps(plan))
    return 0


def cmd_sweep(args) -> int:
    """Rate-distortion sweep: encode at several bpp points, print one JSON
    line per point (the reference's demonstrate.py bpp-sweep, structured)."""
    _apply_backend(args)
    image = imload(args.image)
    c, h, w = image.shape
    settings = _settings_from_args(args)
    level = args.level if args.level is not None else _auto_level(h, w)
    bpps = [float(v) for v in args.bpps.split(",")]
    from . import metrics

    for bpp in bpps:
        t0 = time.perf_counter()
        er = codec.api.encode_image(
            image, settings, level=level, max_bits=round(bpp * h * w)
        )
        t_enc = time.perf_counter() - t0
        rec = codec.api.decode_image(er, settings)[..., :h, :w]
        st = metrics.encode_stats(image, er, t_enc, reconstruction=rec)
        print(st.to_json())
    return 0


def cmd_progressive(args) -> int:
    """Decode byte-stream PREFIXES at increasing bpp — the embedded-stream
    property (reference make_gif.py:46-55) — and write an animated GIF.

    The input may be an image (encoded once at --bpp first) or a saved
    .spiht stream file (decoded directly, no re-encoding)."""
    from PIL import Image

    if args.bpp <= 0:
        print("error: --bpp must be > 0", file=sys.stderr)
        return 2
    _apply_backend(args)
    settings = _settings_from_args(args)
    if args.image.endswith(".spiht"):
        er = _read_stream(args.image)
        c, h, w = er.c, er.h, er.w
    else:
        image = imload(args.image)
        c, h, w = image.shape
        level = args.level if args.level is not None else _auto_level(h, w)
        er = codec.api.encode_image(
            image, settings, level=level, max_bits=round(args.bpp * h * w)
        )
    total_bytes = len(er.encoded_bytes)

    def _annotate(img, bpp):
        # burned-in bpp overlay (reference make_gif.py:43,78): red
        # text top-left; PIL's default font scaled to the frame
        from PIL import ImageDraw, ImageFont

        img = img.convert("RGB") if img.mode != "RGB" else img
        try:
            font = ImageFont.load_default(
                size=max(img.height // 12, 10)
            )
        except TypeError:  # older PIL: fixed-size bitmap font
            font = ImageFont.load_default()
        ImageDraw.Draw(img).text(
            (10, 10), f"BPP: {bpp:.4f}", (255, 0, 0), font=font
        )
        return img

    frames = []
    coeff_frames = []
    for f in range(1, args.frames + 1):
        nb = max(1, round(total_bytes * f / args.frames))
        partial = er.__class__(
            er.encoded_bytes[:nb], er.h, er.w, er.c, er.max_n, er.level
        )
        rec = codec.api.decode_image(partial, settings)[..., :h, :w]
        arr = (np.clip(rec, 0, 1) * 255).astype(np.uint8)
        frame = Image.fromarray(
            np.moveaxis(arr, 0, -1) if c > 1 else arr[0]
        )
        if getattr(args, "annotate", False):
            frame = _annotate(frame, nb * 8 / (h * w))
        frames.append(frame)
        if getattr(args, "coeff_out", None):
            # raw coefficient-array visualization, the reference's
            # second lane (make_gif.py:58-65): |coeffs| * 75 clipped
            dec = codec.api.decode_rec_array(partial, settings)
            vis = np.clip(
                np.abs(np.asarray(dec["rec_arr"], np.float64)) * 75.0,
                0, 255,
            ).astype(np.uint8)
            coeff_frames.append(
                Image.fromarray(
                    np.moveaxis(vis, 0, -1) if c > 1 else vis[0]
                )
            )
        print(f"frame {f}/{args.frames}: {nb} bytes "
              f"({nb*8/(h*w):.4f} bpp)", file=sys.stderr)
    frames[0].save(
        args.out,
        save_all=True,
        append_images=frames[1:],
        duration=args.duration,
        loop=0,
    )
    print(f"wrote {args.out} ({len(frames)} frames)")
    if coeff_frames:
        coeff_frames[0].save(
            args.coeff_out,
            save_all=True,
            append_images=coeff_frames[1:],
            duration=args.duration,
            loop=0,
        )
        print(f"wrote {args.coeff_out} (raw coefficient view)")
    if getattr(args, "mp4", None):
        # mp4 companion (reference make_gif.py:78-96; h264 has no
        # encoder in this cv2 build, mp4v plays everywhere)
        import cv2

        fps = max(1000.0 / max(args.duration, 1), 1.0)
        vw = cv2.VideoWriter(
            args.mp4, cv2.VideoWriter_fourcc(*"mp4v"), fps,
            (frames[0].width, frames[0].height),
        )
        if not vw.isOpened():
            print("error: cv2 VideoWriter failed to open mp4 output",
                  file=sys.stderr)
            return 2
        for fr in frames:
            rgb = np.asarray(fr.convert("RGB"))
            vw.write(rgb[:, :, ::-1])  # BGR
        vw.release()
        print(f"wrote {args.mp4} ({len(frames)} frames @ {fps:.1f} fps)")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="spiht-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("encode-decode", help="round-trip one image")
    p1.add_argument("image")
    p1.add_argument("--out", default=None, help="save reconstruction here")
    _add_codec_args(p1)
    p1.set_defaults(fn=cmd_encode_decode)

    p4 = sub.add_parser("encode", help="encode an image to a stream file")
    p4.add_argument("image")
    p4.add_argument("out")
    _add_codec_args(p4)
    p4.set_defaults(fn=cmd_encode)

    p5 = sub.add_parser("decode", help="decode a stream file to an image")
    p5.add_argument("stream")
    p5.add_argument("out")
    _add_codec_args(p5)
    p5.set_defaults(fn=cmd_decode)

    p7 = sub.add_parser(
        "batch", help="batch-encode many images to stream files"
    )
    p7.add_argument("images", nargs="+")
    p7.add_argument("--outdir", required=True,
                    help="directory for the .spiht stream files")
    _add_codec_args(p7)
    p7.set_defaults(fn=cmd_batch)

    p6 = sub.add_parser("plan", help="rate plan without encoding (JSON)")
    p6.add_argument("image")
    _add_codec_args(p6)
    p6.set_defaults(fn=cmd_plan)

    p3 = sub.add_parser("sweep", help="rate-distortion sweep (JSON lines)")
    p3.add_argument("image")
    p3.add_argument("--bpps", default="0.075,0.1,0.25,0.5,1.0")
    _add_codec_args(p3)
    p3.set_defaults(fn=cmd_sweep)

    p2 = sub.add_parser("progressive", help="progressive-decode GIF")
    p2.add_argument("image")
    p2.add_argument("out")
    p2.add_argument("--frames", type=int, default=24)
    p2.add_argument("--duration", type=int, default=120, help="ms per frame")
    p2.add_argument(
        "--coeff-out", default=None,
        help="also write the raw coefficient-array visualization GIF "
             "(|coeffs|*75, the reference make_gif.py's second lane)",
    )
    p2.add_argument(
        "--annotate", action="store_true",
        help="burn a 'BPP: x.xxxx' overlay into each frame "
             "(reference make_gif.py:78)",
    )
    p2.add_argument(
        "--mp4", default=None, metavar="OUT.mp4",
        help="also write the animation as an mp4 (cv2 mp4v; "
             "reference make_gif.py:78-96)",
    )
    _add_codec_args(p2)
    p2.set_defaults(fn=cmd_progressive)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
