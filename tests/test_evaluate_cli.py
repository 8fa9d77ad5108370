"""Standalone evaluation CLI (vae_assoc_tpu/evaluate.py, vae-assoc-eval)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    return env


def _train(tmp_path, *extra):
    ckpt = tmp_path / "ckpt"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "96",
         "--batch-size", "32", "--epochs", "1",
         "--ckpt-dir", str(ckpt), *extra],
        env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return ckpt


def test_eval_cli_end_to_end(tmp_path):
    ckpt = _train(tmp_path)
    # Driver checkpoints are self-describing now.
    assert (ckpt / "model_config.json").exists()
    out_json = tmp_path / "eval.json"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.evaluate", str(ckpt), "--cpu",
         "--data", "synthetic", "--n-samples", "64", "--batch-size", "32",
         "--mll-samples", "4", "--json", str(out_json)],
        env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res == json.loads(out_json.read_text())
    for key in ("mse_image->trajectory", "mse_trajectory->image", "total",
                "knn_image->trajectory", "iwae_image", "elbo_trajectory"):
        assert key in res, sorted(res)
        assert np.isfinite(res[key]), (key, res[key])
    assert res["iwae_image"] >= res["elbo_image"] - 1e-5
    assert res["backend"] == "cpu" and res["n_samples"] == 64


def test_eval_cli_conditional(tmp_path):
    ckpt = _train(tmp_path, "--conditional")
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.evaluate", str(ckpt), "--cpu",
         "--data", "synthetic", "--n-samples", "64", "--batch-size", "32"],
        env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert "knn_image->trajectory" in res  # label-blind conditional probe


def test_eval_cli_errors(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.evaluate",
         str(tmp_path / "nope"), "--cpu"],
        env=_env(), capture_output=True, text=True, timeout=300,
    )
    assert out.returncode != 0 and "model_config.json" in out.stderr

    ckpt = _train(tmp_path)
    # Contradicting the RECORDED featurization fails loudly (the arch
    # width alone cannot distinguish rbf(100) from resample(100)).
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.evaluate", str(ckpt), "--cpu",
         "--data", "synthetic", "--n-samples", "32",
         "--traj-encoding", "rbf"],
        env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert out.returncode != 0 and "contradicts" in out.stderr


def test_eval_cli_rbf_encoding_recorded(tmp_path):
    """A model trained with --traj-encoding rbf evaluates correctly with
    NO flags — the featurization comes from model_config.json 'data'."""
    ckpt = _train(tmp_path, "--traj-encoding", "rbf", "--rbf-centers", "100")
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.evaluate", str(ckpt), "--cpu",
         "--data", "synthetic", "--n-samples", "48", "--batch-size", "24"],
        env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert np.isfinite(res["mse_image->trajectory"])
    # No duplicate unprefixed MSE-grid keys (the '->' filter).
    assert "image->trajectory" not in res
