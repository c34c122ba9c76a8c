"""Serving layer: micro-batching engine + HTTP daemon (tqdne_tpu/serving.py).

The engine is exercised with a fake device fn (fast, deterministic
routing checks); the HTTP end-to-end test drives a tiny trained 1D EDM
run through the real server on a loopback port."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from tqdne_tpu import serving


def _fake_batcher(batch_size=8, t=16, delay_ms=40.0, run_delay=0.0):
    """run_fn echoes each row's first conditioning value into its waveform,
    so result routing across chunks/batches is checkable."""

    def run_fn(key, cond):
        if run_delay:
            time.sleep(run_delay)
        out = np.broadcast_to(cond[:, :1, None], (len(cond), 3, t))
        return np.ascontiguousarray(out, np.float32)

    return serving.Microbatcher(run_fn, lambda x: x, batch_size, t,
                                max_delay_ms=delay_ms)


def test_single_request_roundtrip():
    b = _fake_batcher()
    cond = np.arange(3, dtype=np.float32).reshape(3, 1) * np.ones((3, 5), np.float32)
    out = b.generate(cond)
    assert out.shape == (3, 3, 16)
    assert np.array_equal(out[:, 0, 0], np.array([0.0, 1.0, 2.0]))
    b.shutdown()


def test_large_request_splits_into_batches():
    b = _fake_batcher(batch_size=4)
    cond = np.arange(10, dtype=np.float32).reshape(10, 1) * np.ones((10, 5), np.float32)
    out = b.generate(cond)
    assert b.batches_run == 3  # 4 + 4 + 2
    assert np.array_equal(out[:, 0, 0], np.arange(10, dtype=np.float32))
    b.shutdown()


def test_concurrent_requests_coalesce():
    # hold the worker busy so both submits are queued before packing starts
    b = _fake_batcher(batch_size=8, delay_ms=200.0, run_delay=0.05)
    b.generate(np.zeros((1, 5), np.float32))  # warm/occupy
    p1 = b.submit(np.full((3, 5), 1.0, np.float32))
    p2 = b.submit(np.full((3, 5), 2.0, np.float32))
    assert p1.done.wait(10) and p2.done.wait(10)
    assert b.batches_run == 2  # warmup batch + ONE coalesced batch
    assert np.all(p1.out[:, 0, 0] == 1.0) and np.all(p2.out[:, 0, 0] == 2.0)
    b.shutdown()


def test_seeded_requests_run_exclusively_and_deterministically():
    t = 16

    def run_fn(key, cond):
        import jax

        noise = np.asarray(jax.random.normal(key, (len(cond), 3, t)), np.float32)
        return noise + np.asarray(cond[:, :1, None], np.float32)

    b = serving.Microbatcher(run_fn, lambda x: x, 8, t, max_delay_ms=100.0)
    cond = np.ones((2, 5), np.float32)
    out1 = b.generate(cond, seed=7)
    out2 = b.generate(cond, seed=7)
    out3 = b.generate(cond, seed=8)
    assert np.array_equal(out1, out2)
    assert not np.array_equal(out1, out3)
    b.shutdown()


def test_pipeline_overlaps_fetch_with_next_dispatch():
    """The device owner must dispatch batch N+1 while batch N's (slow)
    device->host fetch is still in flight on the finalizer thread."""
    dispatched = []

    def run_fn(key, cond):
        dispatched.append(time.monotonic())
        return np.zeros((len(cond), 3, 8), np.float32)

    def fetch_fn(out):
        time.sleep(0.15)  # simulated relay fetch
        return out

    b = serving.Microbatcher(run_fn, lambda x: x, 4, 8, max_delay_ms=1.0,
                             fetch_fn=fetch_fn)
    p1 = b.submit(np.zeros((4, 5), np.float32))  # full batch -> no window wait
    p2 = b.submit(np.zeros((4, 5), np.float32))
    assert p1.done.wait(10) and p2.done.wait(10)
    assert len(dispatched) == 2
    # overlapped: second dispatch well inside the first fetch's sleep
    assert dispatched[1] - dispatched[0] < 0.15
    b.shutdown()


def test_error_propagates_to_caller():
    def run_fn(key, cond):
        raise RuntimeError("device on fire")

    b = serving.Microbatcher(run_fn, lambda x: x, 4, 16)
    with pytest.raises(RuntimeError, match="device on fire"):
        b.generate(np.zeros((2, 5), np.float32))
    # engine survives a failed batch
    assert b._worker.is_alive()
    b.shutdown()


def test_request_validation():
    b = _fake_batcher()
    with pytest.raises(serving.RequestError):
        b.submit(np.zeros((0, 5), np.float32))
    with pytest.raises(serving.RequestError):
        b.submit(np.zeros((2, 3), np.float32))
    with pytest.raises(serving.RequestError):
        b.submit(np.zeros((serving.MAX_REQUEST_ROWS + 1, 5), np.float32))
    b.shutdown()


def test_parse_conditions_forms():
    rows = serving.parse_conditions([
        {"hypocentral_distance": 50, "magnitude": 5.5, "vs30": 400,
         "hypocentre_depth": 20, "azimuthal_gap": 100},
        [60, 6.0, 300, 10, 90],
    ])
    assert rows.shape == (2, 5) and rows[0, 0] == 50 and rows[1, 1] == 6.0
    for bad in (None, [], [[1, 2]], [{"magnitude": 5}], "x"):
        with pytest.raises(serving.RequestError):
            serving.parse_conditions(bad)
    # non-numeric values are a client error (HTTP 400), not a server 500
    for bad in ([[1, 2, 3, 4, "abc"]],
                [{"hypocentral_distance": None, "magnitude": 5.5, "vs30": 400,
                  "hypocentre_depth": 20, "azimuthal_gap": 100}]):
        with pytest.raises(serving.RequestError):
            serving.parse_conditions(bad)


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.slow
def test_http_server_end_to_end(tmp_path):
    from tqdne_tpu.cli import train as train_cli

    wd = str(tmp_path)
    train_cli.main([
        "1d_edm", "--workdir", wd, "--synthetic", "16", "--max-epochs", "1",
        "-b", "8", "--eval-every", "99", "--tiny", "--dtype", "f32",
    ])

    from tqdne_tpu.cli import common
    from tqdne_tpu.cli.generate_waveforms import SUMMARY_STATISTICS

    bundle = common.build_inference("1d_edm", wd, np.float32, num_steps=2, tiny=True)
    batcher = serving.Microbatcher.from_bundle(bundle, batch_size=4)
    normalize = lambda c: (c - SUMMARY_STATISTICS[:, 0]) / SUMMARY_STATISTICS[:, 1]
    server = serving.make_server(batcher, normalize, {"config": "1d_edm"}, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        status, health = _post(base + "/generate", {"conditions": [
            {"hypocentral_distance": 50, "magnitude": 5.5, "vs30": 400,
             "hypocentre_depth": 20, "azimuthal_gap": 100},
            [60, 6.0, 300, 10, 90],
        ], "seed": 3})
        assert status == 200, health
        wf = np.array(health["waveforms"], np.float32)
        assert wf.shape == (2, 3, 4064)
        assert np.isfinite(wf).mean() > 0.5  # untrained-model overflow tolerated

        # b64 format round-trips bit-exact against the same seed
        status, r2 = _post(base + "/generate", {"conditions": [[50, 5.5, 400, 20, 100],
                                                               [60, 6.0, 300, 10, 90]],
                                                "seed": 3, "format": "b64"})
        assert status == 200
        import base64

        wf2 = np.frombuffer(base64.b64decode(r2["waveforms_b64"]), "<f4").reshape(
            r2["shape"])
        assert np.array_equal(wf, wf2, equal_nan=True)

        status, err = _post(base + "/generate", {"conditions": [[1, 2]]})
        assert status == 400 and "error" in err

        # non-integer seed and non-numeric conditioning are 400s, not 500s
        status, err = _post(base + "/generate", {
            "conditions": [[50, 5.5, 400, 20, 100]], "seed": "not-an-int"})
        assert status == 400 and "seed" in err["error"]
        status, err = _post(base + "/generate", {
            "conditions": [[50, 5.5, 400, 20, "oops"]]})
        assert status == 400 and "error" in err

        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.loads(r.read())["ok"] is True
        with urllib.request.urlopen(base + "/info", timeout=10) as r:
            assert json.loads(r.read())["config"] == "1d_edm"
    finally:
        server.shutdown()
        server.server_close()
        batcher.shutdown()
