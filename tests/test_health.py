"""Failure detection + elastic recovery (parallel/health.py).

Faults are injected (hung probes, raising encode paths) — the same
control flow that fires on real XlaRuntimeError / deadline expiry.
"""

import time

import numpy as np
import pytest

from spiht_tpu import SpihtSettings
from spiht_tpu.parallel import health


def _images(n=5, c=3, h=32, w=32):
    rng = np.random.default_rng(0)
    return [np.clip(rng.random((c, h, w)), 0, 1) for _ in range(n)]


def test_probe_all_cpu_devices_healthy():
    res = health.probe_devices(timeout_s=60.0)
    assert res and all(h.ok for h in res)
    assert all(h.latency_s >= 0 for h in res)


def test_probe_detects_hang_via_deadline():
    def hang(device):
        time.sleep(1.0)

    res = health.probe_devices(devices=["d0"], timeout_s=0.1, probe_fn=hang)
    assert len(res) == 1 and not res[0].ok
    assert "deadline" in res[0].error


def test_probe_reports_device_error():
    def boom(device):
        raise RuntimeError("DEVICE_UNAVAILABLE")

    res = health.probe_devices(devices=["d0"], timeout_s=5, probe_fn=boom)
    assert not res[0].ok and "DEVICE_UNAVAILABLE" in res[0].error


def test_healthy_devices_filters():
    def flaky(device):
        if device == "bad":
            raise RuntimeError("dead")

    devs = health.healthy_devices(["good", "bad"], timeout_s=5,
                                  probe_fn=flaky)
    assert devs == ["good"]


def test_failover_retries_device_errors_then_succeeds():
    calls = {"n": 0}
    retried = []

    def step():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: xla runtime wedged")
        return "ok"

    out = health.run_with_failover(
        step, retries=3, backoff_s=0.0,
        on_retry=lambda a, e: retried.append(a),
    )
    assert out == "ok" and calls["n"] == 3 and retried == [1, 2]


def test_failover_does_not_retry_program_bugs():
    calls = {"n": 0}

    def step():
        calls["n"] += 1
        raise ValueError("shape bug")

    with pytest.raises(ValueError):
        health.run_with_failover(step, retries=5, backoff_s=0.0)
    assert calls["n"] == 1


def test_failover_does_not_retry_bare_runtime_error():
    """A bare RuntimeError without a client-death message is a program
    bug, not a wedged device — it must propagate on the first attempt."""
    calls = {"n": 0}

    def step():
        calls["n"] += 1
        raise RuntimeError("dict changed size during iteration")

    with pytest.raises(RuntimeError):
        health.run_with_failover(step, retries=5, backoff_s=0.0)
    assert calls["n"] == 1


def test_failover_exhausts_retries():
    def step():
        raise RuntimeError("UNAVAILABLE: still dead")

    with pytest.raises(RuntimeError):
        health.run_with_failover(step, retries=2, backoff_s=0.0)


def test_robust_encode_completes_and_checkpoints(tmp_path):
    images = _images(5)
    settings = SpihtSettings()
    manifest = str(tmp_path / "m.json")
    out = health.robust_encode_images(
        images, settings, level=3, max_bits=2000, chunk=2,
        manifest_path=manifest,
    )
    assert sorted(out.keys()) == [0, 1, 2, 3, 4]
    # manifest is a complete checkpoint: a rerun never re-encodes
    def poisoned(*a, **k):
        raise AssertionError("should not re-encode completed ids")

    again = health.robust_encode_images(
        images, settings, level=3, max_bits=2000, chunk=2,
        manifest_path=manifest, encode_fn=poisoned,
    )
    assert {k: v.encoded_bytes for k, v in again.items()} == {
        k: v.encoded_bytes for k, v in out.items()
    }


def test_robust_encode_resumes_after_mid_job_crash(tmp_path):
    from spiht_tpu.codec import api

    images = _images(6)
    settings = SpihtSettings()
    manifest = str(tmp_path / "m.json")
    calls = {"n": 0}

    def crashy(imgs, s, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt  # simulated job kill on chunk 2
        return api.encode_images(imgs, s, **kw)

    with pytest.raises(KeyboardInterrupt):
        health.robust_encode_images(
            images, settings, level=3, max_bits=2000, chunk=2,
            manifest_path=manifest, encode_fn=crashy, retries=0,
        )
    # chunk 1 survived in the manifest; resume finishes the rest
    out = health.robust_encode_images(
        images, settings, level=3, max_bits=2000, chunk=2,
        manifest_path=manifest,
    )
    want = api.encode_images(images, settings, level=3, max_bits=2000)
    assert all(out[i].encoded_bytes == want[i].encoded_bytes
               for i in range(6))


def test_robust_encode_degrades_to_host_on_persistent_device_error(
    tmp_path,
):
    from spiht_tpu.codec import api

    images = _images(4)
    settings = SpihtSettings()

    def always_dead(imgs, s, **kw):
        raise RuntimeError("UNAVAILABLE: TPU device error")

    out = health.robust_encode_images(
        images, settings, level=3, max_bits=2000, chunk=4,
        manifest_path=str(tmp_path / "m.json"),
        encode_fn=always_dead, retries=1,
    )
    want = api.encode_images(images, settings, level=3, max_bits=2000)
    assert all(out[i].encoded_bytes == want[i].encoded_bytes
               for i in range(4))
