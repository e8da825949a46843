"""CLI subcommands and the metrics module, driven end-to-end on a small
synthetic image with the native backend."""

import json
import os

import numpy as np
import pytest

from spiht_tpu import SpihtSettings, cli, metrics
from spiht_tpu import encode_image, decode_image
from spiht_tpu.utils import imsave


@pytest.fixture()
def png(tmp_path, rng):
    im = rng.random((3, 64, 80))
    path = str(tmp_path / "t.png")
    imsave(path, im)
    return path


def test_cli_encode_decode(png, tmp_path, capsys):
    out = str(tmp_path / "rec.png")
    rc = cli.main(
        ["encode-decode", png, "--bpp", "1.0", "--out", out,
         "--backend", "native", "--stats"]
    )
    assert rc == 0
    assert os.path.exists(out)
    captured = capsys.readouterr().out
    assert "PSNR" in captured
    assert "bits per plane" in captured


def test_cli_rejects_bad_bpp(png, capsys):
    assert cli.main(["encode-decode", png, "--bpp", "-1"]) == 2


def test_cli_sweep_json_lines(png, capsys):
    rc = cli.main(
        ["sweep", png, "--bpps", "0.25,1.0", "--backend", "native"]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    stats = [json.loads(l) for l in lines]
    assert len(stats) == 2
    assert stats[1]["psnr_db"] > stats[0]["psnr_db"]
    assert stats[1]["bpp"] > stats[0]["bpp"]


def test_cli_encode_decode_files(png, tmp_path, capsys):
    stream = str(tmp_path / "s.spiht")
    out = str(tmp_path / "d.png")
    assert cli.main(["encode", png, stream, "--bpp", "1.0",
                     "--backend", "native"]) == 0
    assert os.path.getsize(stream) > 0
    assert cli.main(["decode", stream, out, "--backend", "native"]) == 0
    assert os.path.exists(out)
    # wrong settings still decodes (garbage-in-garbage-out is the
    # reference contract); missing/invalid files error cleanly
    assert cli.main(["decode", str(tmp_path / "nope.spiht"), out]) == 2
    bad = tmp_path / "bad.spiht"
    bad.write_bytes(b"not json\nxxxx")
    assert cli.main(["decode", str(bad), out]) == 2


def test_cli_batch_encode(png, tmp_path, capsys, rng):
    # second image with a DIFFERENT shape: groups must split and both
    # stream files must decode with the standard decode command
    png2 = str(tmp_path / "t2.png")
    imsave(png2, rng.random((3, 48, 64)))
    outdir = str(tmp_path / "streams")
    rc = cli.main(
        ["batch", png, png2, "--outdir", outdir, "--bpp", "1.0",
         "--backend", "native"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "MP/s aggregate" in out
    for stem, hw in (("t", (64, 80)), ("t2", (48, 64))):
        stream = os.path.join(outdir, stem + ".spiht")
        assert os.path.getsize(stream) > 0
        rec = str(tmp_path / f"rec_{stem}.png")
        assert cli.main(["decode", stream, rec,
                         "--backend", "native"]) == 0
        assert os.path.exists(rec)
    # batch streams match single-image encode byte-for-byte
    single = str(tmp_path / "single.spiht")
    assert cli.main(["encode", png, single, "--bpp", "1.0",
                     "--backend", "native"]) == 0
    with open(single, "rb") as f1, \
            open(os.path.join(outdir, "t.spiht"), "rb") as f2:
        assert f1.read() == f2.read()


def test_cli_batch_stem_collision(png, tmp_path, capsys, rng):
    # inputs from different directories sharing a basename must not
    # silently overwrite each other in --outdir
    sub = tmp_path / "other"
    sub.mkdir()
    png2 = str(sub / os.path.basename(png))
    imsave(png2, rng.random((3, 64, 80)))
    outdir = str(tmp_path / "collide")
    rc = cli.main(["batch", png, png2, "--outdir", outdir, "--bpp", "0.5",
                   "--backend", "native"])
    assert rc == 0
    names = sorted(os.listdir(outdir))
    assert names == ["t-1.spiht", "t.spiht"]
    assert all(os.path.getsize(os.path.join(outdir, n)) > 0 for n in names)


def test_cli_batch_device_backend(png, tmp_path, capsys):
    # 'device' backend: same-shape group through encode_images_device
    # (on CPU this is the jitted XLA machine; bitstreams are identical)
    outdir = str(tmp_path / "dstreams")
    rc = cli.main(
        ["batch", png, png, "--outdir", outdir, "--bpp", "0.5",
         "--backend", "device"]
    )
    assert rc == 0
    assert cli.main(["batch", png, "--outdir", outdir, "--bpp", "-2"]) == 2
    assert cli.main(["batch", str(tmp_path / "missing.png"),
                     "--outdir", outdir]) == 2


def test_cli_progressive_gif(png, tmp_path):
    out = str(tmp_path / "p.gif")
    rc = cli.main(
        ["progressive", png, out, "--frames", "4", "--backend", "native"]
    )
    assert rc == 0
    assert os.path.getsize(out) > 0


def test_cli_progressive_annotate_mp4(png, tmp_path):
    """The burned-in bpp overlay + mp4 companion (make_gif.py:43,78-96)."""
    out = str(tmp_path / "p.gif")
    mp4 = str(tmp_path / "p.mp4")
    rc = cli.main(
        ["progressive", png, out, "--frames", "3", "--backend",
         "native", "--annotate", "--mp4", mp4]
    )
    assert rc == 0
    assert os.path.getsize(out) > 0
    assert os.path.getsize(mp4) > 0
    # the overlay changed pixels vs the unannotated first frame
    from PIL import Image

    plain = str(tmp_path / "q.gif")
    assert cli.main(
        ["progressive", png, plain, "--frames", "3",
         "--backend", "native"]
    ) == 0
    import numpy as np

    a = np.asarray(Image.open(out).convert("RGB"))
    b = np.asarray(Image.open(plain).convert("RGB"))
    assert a.shape == b.shape and (a != b).any()


def test_bits_per_plane_total(rng):
    settings = SpihtSettings()
    im = rng.random((1, 32, 32))
    er = encode_image(im, settings, level=2, max_bits=2000)
    hist = metrics.bits_per_plane(er, settings)
    # every consumed bit is attributed to exactly one plane; the stream has
    # len*8 bits of which the decoder consumes all (pad zeros included)
    assert sum(hist.values()) == len(er.encoded_bytes) * 8
    assert max(hist) == er.max_n


def test_stage_timer():
    t = metrics.StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert set(rep) == {"a", "b"}
    assert t.counts["a"] == 2
    assert "a" in t.pretty()


def test_psnr_identity(rng):
    im = rng.random((3, 16, 16))
    assert metrics.psnr(im, im) == float("inf")
    noisy = np.clip(im + 0.1, 0, 1)
    assert 10 < metrics.psnr(im, noisy) < 30
