"""HTTP serving front end (serve_http.ModelServer): endpoint contract,
numerics vs the direct Predictor, request coalescing through the
MicroBatcher, and error paths — all against an in-process server on an
OS-assigned port."""

import json
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

import vae_assoc_tpu as vat
from vae_assoc_tpu.serve import Predictor
from vae_assoc_tpu.serve_http import ModelServer

TINY = dict(
    n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
    n_hidden_gener_1=16, n_hidden_gener_2=16,
)


@pytest.fixture(scope="module")
def served():
    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"],
    )
    pred = Predictor.from_model(model)
    # max_batch=64 keeps the warmed compile set to one bucket (fast CI).
    with ModelServer(pred, max_wait_ms=20.0, max_batch=64) as server:
        port = server.start()
        yield pred, server, f"http://127.0.0.1:{port}"


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_healthz(served):
    _, _, base = served
    with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["modalities"] == ["image", "trajectory"]


def test_cross_generate_matches_predictor(served, rng):
    pred, _, base = served
    x = rng.uniform(0, 1, (3, 24)).astype(np.float32)
    out = _post(base, "/v1/cross_generate",
                {"inputs": x.tolist(), "src": "image", "dst": "trajectory"})
    got = np.asarray(out["outputs"], np.float32)
    np.testing.assert_allclose(
        got, pred.cross_generate(x, "image", "trajectory"),
        rtol=1e-4, atol=1e-6,
    )


def test_transform_generate_reconstruct(served, rng):
    pred, _, base = served
    x = rng.uniform(0, 1, (2, 24)).astype(np.float32)
    y = rng.normal(size=(2, 24)).astype(np.float32)
    z = _post(base, "/v1/transform", {"inputs": [x.tolist(), y.tolist()]})
    want_z = pred.transform([x, y])
    np.testing.assert_allclose(
        np.asarray(z["latents"][0], np.float32), want_z[0],
        rtol=1e-4, atol=1e-6,
    )
    gen = _post(base, "/v1/generate",
                {"latents": np.asarray(want_z[0]).tolist(),
                 "modality": "trajectory"})
    np.testing.assert_allclose(
        np.asarray(gen["outputs"], np.float32),
        pred.generate(np.asarray(want_z[0]), "trajectory"),
        rtol=1e-4, atol=1e-6,
    )
    rec = _post(base, "/v1/reconstruct",
                {"inputs": x.tolist(), "modality": "image"})
    np.testing.assert_allclose(
        np.asarray(rec["outputs"], np.float32),
        pred.reconstruct(x, "image"), rtol=1e-4, atol=1e-6,
    )


def test_concurrent_requests_coalesce(served, rng):
    """Parallel HTTP clients must coalesce into fewer device dispatches
    than requests (the MicroBatcher works across the HTTP boundary)."""
    pred, server, base = served
    n = 24
    xs = [rng.uniform(0, 1, (1, 24)).astype(np.float32) for _ in range(n)]
    before = server.batcher.dispatches

    def call(x):
        return np.asarray(_post(base, "/v1/cross_generate",
                                {"inputs": x.tolist(), "src": 0, "dst": 1}
                                )["outputs"], np.float32)

    with ThreadPoolExecutor(max_workers=12) as ex:
        outs = list(ex.map(call, xs))
    for x, got in zip(xs, outs):
        np.testing.assert_allclose(
            got, pred.cross_generate(x, 0, 1), rtol=1e-4, atol=1e-6
        )
    assert server.batcher.dispatches - before < n, "no coalescing over HTTP"


def test_error_paths(served):
    _, _, base = served
    # Unknown modality → 400 with a message, not a traceback/500.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/v1/cross_generate",
              {"inputs": [[0.0] * 24], "src": "image", "dst": "nope"})
    assert e.value.code == 400
    assert "nope" in json.loads(e.value.read())["error"]
    # Missing field → 400.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/v1/cross_generate", {"inputs": [[0.0] * 24]})
    assert e.value.code == 400
    # Unknown route → 404.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/v1/does_not_exist", {})
    assert e.value.code == 404
    # Bad JSON → 400.
    req = urllib.request.Request(
        base + "/v1/cross_generate", data=b"{not json",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_oversize_transform_chunks_within_warmed_set(served, rng):
    """transform/generate beyond max_batch must chunk to warmed buckets,
    not escape to an unwarmed (request-thread-compiled) one."""
    pred, server, base = served
    n = 100  # > max_batch=64 → two chunks
    x = rng.uniform(0, 1, (n, 24)).astype(np.float32)
    y = rng.normal(size=(n, 24)).astype(np.float32)
    z = _post(base, "/v1/transform", {"inputs": [x.tolist(), y.tolist()]})
    want = pred.transform([x, y])
    got = np.asarray(z["latents"][0], np.float32)
    assert got.shape == want[0].shape
    np.testing.assert_allclose(got, want[0], rtol=1e-4, atol=1e-6)
    gen = _post(base, "/v1/generate",
                {"latents": np.asarray(want[0]).tolist(), "modality": 0})
    np.testing.assert_allclose(
        np.asarray(gen["outputs"], np.float32),
        pred.generate(np.asarray(want[0]), 0), rtol=1e-4, atol=1e-6,
    )


def test_malformed_inputs_return_400_not_connection_drop(served):
    """Scalars, 1-D arrays, ragged nests, and ragged per-modality row
    counts are client errors: 400 with a message (IndexError used to
    escape and drop the connection)."""
    _, _, base = served
    for payload in (
        {"latents": 5, "modality": "image"},                 # 0-d
        {"latents": [1.0, 2.0], "modality": "image"},        # 1-D
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, "/v1/generate", payload)
        assert e.value.code == 400, payload
        assert "2-D" in json.loads(e.value.read())["error"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/v1/transform",
              {"inputs": [[[0.0] * 24] * 2, [[0.0] * 24] * 5]})  # ragged rows
    assert e.value.code == 400
    assert "equal row counts" in json.loads(e.value.read())["error"]


def test_server_config_validation():
    """Powers of two are load-bearing for the warmed-bucket contract;
    min_batch > max_batch is rejected by MicroBatcher itself."""
    from vae_assoc_tpu.serve import MicroBatcher
    from vae_assoc_tpu.serve_http import ModelServer

    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"],
    )
    pred = Predictor.from_model(model)
    with pytest.raises(ValueError, match="power of two"):
        ModelServer(pred, max_batch=1000)
    with pytest.raises(ValueError, match="power of two"):
        ModelServer(pred, max_batch=64, min_batch=48)
    with pytest.raises(ValueError, match="max_batch"):
        MicroBatcher(pred, max_batch=64, min_batch=256)
    # Explicit min > max is a misconfiguration, not a silent clamp.
    with pytest.raises(ValueError, match="max_batch"):
        ModelServer(pred, max_batch=64, min_batch=128, warm=False)
    # max_batch beyond Predictor's MAX_BUCKET would chunk internally and
    # leak residual chunks outside the warmed set.
    with pytest.raises(ValueError, match="MAX_BUCKET"):
        ModelServer(pred, max_batch=8192, warm=False)


def test_cli_sigterm_graceful_drain(tmp_path):
    """The serving CLI shuts down cleanly on SIGTERM (the orchestrator
    preemption signal): stops accepting, drains the MicroBatcher via the
    context exit, and exits 0 — mirroring the training driver's
    preemption-safe story."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time

    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"],
    )
    mdir = tmp_path / "model"
    model.save_model(str(mdir))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "vae_assoc_tpu.serve_http", str(mdir),
         "--port", str(port), "--max-batch", "64"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        for line in proc.stdout:
            if "serving" in line:
                break
        # Prove it actually serves, then request shutdown.
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["status"] == "ok"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, out[-3000:]
    assert "draining in-flight requests" in out
    assert "server closed" in out
    # The port is released (server_close ran): a fresh bind succeeds.
    # SO_REUSEADDR matches what ThreadingHTTPServer itself sets
    # (allow_reuse_address) — without it the healthz connection's
    # TIME_WAIT state blocks a plain bind for ~60 s.
    deadline = time.time() + 10
    while True:
        try:
            with socket.socket() as s:
                s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
                s.bind(("127.0.0.1", port))
            break
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)


def test_cli_small_max_batch_defaults_min_batch():
    """`--max-batch 32` with no --min-batch must start: the CLI default
    for --min-batch is None (→ min(64, max_batch)), not a hard 64 that
    would exceed max_batch and refuse startup. Also: ModelServer's
    Python-API default follows max_batch down."""
    from vae_assoc_tpu.serve_http import _build_parser

    args = _build_parser().parse_args(["some_dir", "--max-batch", "32"])
    assert args.min_batch is None
    assert args.compile_cache is None  # opt-in (test_driver covers the hit)
    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"],
    )
    pred = Predictor.from_model(model)
    server = ModelServer(pred, max_batch=32, warm=False)
    assert server.batcher.min_batch == 32
    server.close()


def test_numpy_integer_modality_accepted(served, rng):
    """np.int64 (e.g. from np.argmax) must behave exactly like the plain
    int index — not fall through to the name lookup's KeyError."""
    pred, _, base = served
    x = rng.uniform(0, 1, (2, 24)).astype(np.float32)
    np.testing.assert_allclose(
        pred.cross_generate(x, np.int64(0), np.int64(1)),
        pred.cross_generate(x, 0, 1), rtol=1e-6, atol=0,
    )
    assert pred.cfg.modality_index(np.int32(1)) == 1
    with pytest.raises(KeyError, match="out of range"):
        pred.cfg.modality_index(np.int64(-1))


def test_negative_int_modality_rejected(served):
    """Negative modality indices must 400: Python indexing would silently
    serve the wrong modality AND each distinct negative value would mint a
    fresh jit program on a request thread (unbounded compile set)."""
    _, _, base = served
    for path, payload in (
        ("/v1/generate", {"latents": [[0.0] * 4], "modality": -1}),
        ("/v1/cross_generate",
         {"inputs": [[0.0] * 24], "src": -1, "dst": 1}),
        ("/v1/cross_generate",
         {"inputs": [[0.0] * 24], "src": 0, "dst": 5}),
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, path, payload)
        assert e.value.code == 400, (path, payload)
        assert "out of range" in json.loads(e.value.read())["error"]
