"""AOT export (export.py): StableHLO artifact roundtrip vs the live
Predictor, symbolic-batch behavior across bucket sizes, oversized-batch
chunking, manifest guards, and duck-typing into the HTTP ModelServer."""

import json
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import vae_assoc_tpu as vat
from vae_assoc_tpu import bucketing as bucketing_mod
from vae_assoc_tpu import serve as serve_mod
from vae_assoc_tpu.export import ExportedPredictor, export_predictor
from vae_assoc_tpu.serve import Predictor

TINY = dict(
    n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
    n_hidden_gener_1=16, n_hidden_gener_2=16,
)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """(Predictor, ExportedPredictor, artifact_dir) over a tiny trained
    model — module-scoped: export traces every endpoint once."""
    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"],
    )
    rng = np.random.default_rng(0)
    xs = [rng.uniform(0, 1, (32, 24)).astype(np.float32),
          rng.normal(size=(32, 24)).astype(np.float32)]
    model.partial_fit(xs)  # non-init weights: parity below is non-trivial
    pred = Predictor.from_model(model)
    out = tmp_path_factory.mktemp("export_artifact")
    manifest = export_predictor(pred, str(out))
    assert set(manifest["endpoints"]) == {
        "transform", "generate_0", "generate_1",
        "cross_generate_0_0", "cross_generate_0_1",
        "cross_generate_1_0", "cross_generate_1_1",
    }
    return pred, ExportedPredictor.load(str(out)), out


def test_export_matches_predictor_all_endpoints(exported, rng):
    pred, ep, _ = exported
    x = rng.uniform(0, 1, (5, 24)).astype(np.float32)  # odd n: pad path
    y = rng.normal(size=(5, 24)).astype(np.float32)
    np.testing.assert_allclose(
        ep.cross_generate(x, "image", "trajectory"),
        pred.cross_generate(x, "image", "trajectory"), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        ep.reconstruct(y, 1), pred.reconstruct(y, 1), rtol=1e-5, atol=1e-6)
    for za, zb in zip(ep.transform([x, y]), pred.transform([x, y])):
        np.testing.assert_allclose(za, zb, rtol=1e-5, atol=1e-6)
    z = rng.normal(size=(5, 4)).astype(np.float32)
    np.testing.assert_allclose(
        ep.generate(z, "image"), pred.generate(z, "image"),
        rtol=1e-5, atol=1e-6)


def test_export_symbolic_batch_any_bucket(exported, rng):
    """ONE artifact serves every bucket (the symbolic-batch design goal):
    results are row-slices of each other regardless of padding bucket."""
    pred, ep, _ = exported
    x = rng.uniform(0, 1, (130, 24)).astype(np.float32)  # buckets 1..256
    full = ep.cross_generate(x, 0, 1)
    assert full.shape == (130, 24)
    np.testing.assert_allclose(
        full[:3], ep.cross_generate(x[:3], 0, 1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        full, pred.cross_generate(x, 0, 1), rtol=1e-5, atol=1e-6)


def test_export_chunks_oversized_batches(exported, rng, monkeypatch):
    """Batches beyond MAX_BUCKET split into device-call chunks (same
    contract as Predictor) — shrink the cap so the test stays tiny."""
    pred, ep, _ = exported
    monkeypatch.setattr(serve_mod, "MAX_BUCKET", 8)       # Predictor's cap
    monkeypatch.setattr(bucketing_mod, "MAX_BUCKET", 8)   # export's cap
    x = rng.uniform(0, 1, (20, 24)).astype(np.float32)  # 8+8+4
    np.testing.assert_allclose(
        ep.cross_generate(x, 0, 1), pred.cross_generate(x, 0, 1),
        rtol=1e-5, atol=1e-6)
    y = rng.normal(size=(20, 24)).astype(np.float32)
    for za, zb in zip(ep.transform([x, y]), pred.transform([x, y])):
        np.testing.assert_allclose(za, zb, rtol=1e-5, atol=1e-6)
    z = rng.normal(size=(20, 4)).astype(np.float32)
    np.testing.assert_allclose(
        ep.generate(z, 1), pred.generate(z, 1), rtol=1e-5, atol=1e-6)


def test_export_manifest_guards(exported, tmp_path):
    _, _, art = exported
    with pytest.raises(FileNotFoundError, match="manifest"):
        ExportedPredictor.load(str(tmp_path / "nowhere"))
    bad = tmp_path / "bad_format"
    bad.mkdir()
    mf = json.loads((art / "manifest.json").read_text())
    mf["format"] = 999
    (bad / "manifest.json").write_text(json.dumps(mf))
    with pytest.raises(ValueError, match="format"):
        ExportedPredictor.load(str(bad))


def test_export_load_expands_home(exported, rng, monkeypatch):
    """'~'-relative artifact paths load (regression: the manifest check
    expanded '~' but the endpoint files were opened with the raw path, so
    a valid '~/...' directory failed with FileNotFoundError mid-load)."""
    import os

    pred, _, art = exported
    monkeypatch.setenv("HOME", str(os.path.dirname(str(art))))
    ep = ExportedPredictor.load("~/" + os.path.basename(str(art)))
    x = rng.uniform(0, 1, (4, 24)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ep.cross_generate(x, 0, 1)),
        np.asarray(pred.cross_generate(x, 0, 1)),
        rtol=1e-5, atol=1e-6,
    )


def test_export_serves_over_http(exported, rng):
    """ExportedPredictor duck-types into ModelServer + MicroBatcher: the
    full HTTP path works with no model classes behind it."""
    import urllib.request

    from vae_assoc_tpu.serve_http import ModelServer

    pred, ep, _ = exported
    # CLI: --from-export routes model_dir to ExportedPredictor.load.
    from vae_assoc_tpu.serve_http import _build_parser
    args = _build_parser().parse_args(["some_dir", "--from-export"])
    assert args.from_export
    x = rng.uniform(0, 1, (3, 24)).astype(np.float32)
    with ModelServer(ep, max_batch=8, max_wait_ms=5.0) as server:
        port = server.start()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/cross_generate",
            data=json.dumps({"inputs": x.tolist(), "src": "image",
                             "dst": "trajectory"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            out = np.asarray(json.loads(r.read())["outputs"], np.float32)
    np.testing.assert_allclose(
        out, pred.cross_generate(x, 0, 1), rtol=1e-4, atol=1e-6)


def test_export_loads_without_model_code(exported):
    """Self-containment: serving an artifact needs no model code and no
    checkpoint restore. The package __init__ imports the API (and so the
    model modules) as a side effect; poisoning models/ AND serve/ in
    sys.modules after load proves no endpoint CALL touches either —
    export.py's call path is StableHLO modules + bucketing.py only."""
    _, _, art = exported
    prog = textwrap.dedent(f"""
        import sys
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        from vae_assoc_tpu.export import ExportedPredictor
        ep = ExportedPredictor.load({str(art)!r})
        for name in list(sys.modules):
            if "vae_assoc_tpu.models" in name or name.endswith(".serve"):
                del sys.modules[name]
        sys.modules["vae_assoc_tpu.models"] = None  # import would raise
        sys.modules["vae_assoc_tpu.serve"] = None
        out = ep.cross_generate(np.zeros((2, 24), np.float32), 0, 1)
        assert out.shape == (2, 24), out.shape
        zs = ep.transform([np.zeros((2, 24), np.float32)] * 2)
        assert zs[0].shape == (2, 4), zs[0].shape
        print("SELF_CONTAINED_OK")
    """)
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SELF_CONTAINED_OK" in r.stdout


def test_export_cli_roundtrip(tmp_path, rng):
    """`python -m vae_assoc_tpu.export save_dir out_dir` writes a loadable
    artifact from a save_model directory."""
    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"],
    )
    save_dir = tmp_path / "saved"
    model.save_model(str(save_dir))
    out_dir = tmp_path / "artifact"
    r = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.export", "--cpu",
         str(save_dir), str(out_dir)],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-3000:]
    ep = ExportedPredictor.load(str(out_dir))
    x = rng.uniform(0, 1, (3, 24)).astype(np.float32)
    pred = Predictor.load(str(save_dir))
    np.testing.assert_allclose(
        ep.cross_generate(x, 0, 1), pred.cross_generate(x, 0, 1),
        rtol=1e-5, atol=1e-6)
