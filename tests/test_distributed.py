"""Multi-host glue: manifests, host batch slicing, single-process init."""

import numpy as np

import spiht_tpu
from spiht_tpu import SpihtSettings
from spiht_tpu.parallel import (
    encode_manifest,
    host_batch_slice,
    initialize,
    load_manifest,
    merge_manifests,
)


def test_initialize_single_process_noop():
    initialize()  # must be a no-op without a coordinator


def test_host_batch_slice_partition():
    got = [host_batch_slice(10, pi, 3) for pi in range(3)]
    covered = []
    for s in got:
        covered.extend(range(10)[s])
    assert covered == list(range(10))


def test_manifest_roundtrip(rng):
    settings = SpihtSettings()
    images = [rng.random((1, 24, 24)) for _ in range(3)]
    ers = spiht_tpu.encode_images(images, settings, level=1, max_bits=500)
    text = encode_manifest(["a", "b", "c"], ers)
    back = load_manifest(text)
    assert set(back) == {"a", "b", "c"}
    for k, er in zip(["a", "b", "c"], ers):
        assert back[k].encoded_bytes == er.encoded_bytes
        assert back[k].max_n == er.max_n
        # decodes identically after the round trip
        np.testing.assert_allclose(
            spiht_tpu.decode_image(back[k], settings),
            spiht_tpu.decode_image(er, settings),
        )


def test_merge_manifests(rng):
    settings = SpihtSettings()
    im = rng.random((1, 24, 24))
    (er,) = spiht_tpu.encode_images([im], settings, level=1)
    t1 = encode_manifest(["x"], [er])
    t2 = encode_manifest(["y"], [er])
    merged = merge_manifests([t1, t2])
    assert set(merged) == {"x", "y"}
