"""Demo: the embedded-stream property as an animation.

Encodes once at the max bitrate, then decodes byte PREFIXES at many bpp
levels (the reference's make_gif.py flow) — no re-encoding, pure stream
truncation — and writes a GIF. Equivalent one-liner:

    python -m spiht_tpu.cli progressive IMAGE OUT.gif --frames 40
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spiht_tpu import cli

if __name__ == "__main__":
    image = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/progressive.gif"
    raise SystemExit(
        cli.main(["progressive", image, out, "--frames", "40", "--bpp", "2.0"])
    )
