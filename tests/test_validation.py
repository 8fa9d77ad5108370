"""Held-out validation subsystem: the deterministic train/val split
(`data.pipeline.split_train_val`), the chunked full-set metrics evaluator
(`train.eval.eval_metrics`), and the driver's `--val-frac/--val-every/
--keep-best` surface (periodic val_* logging + best-checkpoint keeping).

The reference only ever printed the running training cost (SURVEY.md
§3.1); held-out evaluation is rebuild-added production surface.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig
from vae_assoc_tpu.data.pipeline import split_train_val
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.train import eval as eval_mod
from vae_assoc_tpu.utils.logging import read_jsonl

TINY = dict(
    n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
    n_hidden_gener_1=16, n_hidden_gener_2=16,
)


def tiny_cfg():
    return AssocConfig(
        [ModalityConfig("image", TINY, recon="bernoulli"),
         ModalityConfig("trajectory", TINY, recon="gaussian")],
        assoc_lambda=0.5,
    )


def _xs(rng, n=70):
    return [rng.uniform(0, 1, (n, 24)).astype(np.float32),
            rng.normal(size=(n, 24)).astype(np.float32)]


# -- split -------------------------------------------------------------------

def test_split_deterministic_disjoint_exhaustive(rng):
    xs = _xs(rng)
    tr, va, (ti, vi) = split_train_val(xs, 0.2, seed=3)
    assert int(tr[0].shape[0]) == 56 and int(va[0].shape[0]) == 14
    # Disjoint and exhaustive over the 70 rows.
    assert sorted(np.concatenate([ti, vi]).tolist()) == list(range(70))
    # Rows are gathered by the index arrays (alignment across modalities).
    np.testing.assert_array_equal(np.asarray(va[1]), xs[1][vi])
    # Same (N, frac, seed) -> identical split; --resume reconstructs it.
    _, va2, (_, vi2) = split_train_val(xs, 0.2, seed=3)
    np.testing.assert_array_equal(vi, vi2)
    # Different seed -> different permutation (not just a tail slice).
    _, _, (_, vi3) = split_train_val(xs, 0.2, seed=4)
    assert not np.array_equal(vi, vi3)


def test_split_validation_errors(rng):
    xs = _xs(rng)
    with pytest.raises(ValueError, match="val_frac"):
        split_train_val(xs, 0.0)
    with pytest.raises(ValueError, match="val_frac"):
        split_train_val(xs, 1.0)
    with pytest.raises(ValueError, match="row-aligned"):
        split_train_val([xs[0], xs[1][:10]], 0.2)


# -- eval_metrics ------------------------------------------------------------

def test_eval_metrics_keys_and_determinism(rng):
    cfg = tiny_cfg()
    params = assoc_mod.init_assoc(jax.random.key(0), cfg)
    xs = _xs(rng)
    m = eval_mod.eval_metrics(params, xs, cfg, batch_size=32)
    # Loss surface + the full cross-modal MSE grid, one flat dict.
    for k in ("total", "assoc", "recon_image", "kl_trajectory",
              "image->trajectory", "trajectory->image", "image->image"):
        assert k in m and np.isfinite(m[k]), (k, m)
    # Fixed (params, data, seed) -> identical numbers on re-evaluation.
    assert m == eval_mod.eval_metrics(params, xs, cfg, batch_size=32)


def test_eval_metrics_chunked_matches_single_call(rng):
    """70 rows at batch 32 = scanned chunks [2,32] + ragged tail [6]; the
    sample-weighted average must match one whole-set call (MSE terms are
    ε-free and deterministic -> tight; loss terms draw chunk-wise ε ->
    statistical tolerance)."""
    cfg = tiny_cfg()
    params = assoc_mod.init_assoc(jax.random.key(1), cfg)
    xs = _xs(rng)
    chunked = eval_mod.eval_metrics(params, xs, cfg, batch_size=32)
    single = eval_mod.eval_metrics(params, xs, cfg, batch_size=70)
    for k in ("image->trajectory", "trajectory->image",
              "image->image", "trajectory->trajectory"):
        np.testing.assert_allclose(chunked[k], single[k], rtol=1e-5)
    for k in ("total", "recon_image", "recon_trajectory"):
        np.testing.assert_allclose(chunked[k], single[k], rtol=0.05)


def test_eval_metrics_weighted_tail(rng):
    """The ragged tail is weighted by its true size: metrics over [10+10+1]
    rows at batch 10 equal the mean of per-row contributions, not the mean
    of three chunk means. Build data where the tail row is an outlier in a
    deterministic (ε-free) metric."""
    cfg = tiny_cfg()
    params = assoc_mod.init_assoc(jax.random.key(2), cfg)
    rng_l = np.random.default_rng(0)
    xs = [rng_l.uniform(0, 1, (21, 24)).astype(np.float32),
          rng_l.normal(size=(21, 24)).astype(np.float32)]
    m = eval_mod.eval_metrics(params, xs, cfg, batch_size=10)
    s = eval_mod.eval_metrics(params, xs, cfg, batch_size=21)
    np.testing.assert_allclose(
        m["image->image"], s["image->image"], rtol=1e-5
    )


def test_eval_metrics_empty_raises():
    cfg = tiny_cfg()
    params = assoc_mod.init_assoc(jax.random.key(0), cfg)
    with pytest.raises(ValueError, match="at least one sample"):
        eval_mod.eval_metrics(
            params, [np.zeros((0, 24), np.float32)] * 2, cfg
        )


# -- driver surface ----------------------------------------------------------

def _driver_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    return env


def test_driver_validation_end_to_end(tmp_path):
    """--val-frac/--val-every/--keep-best in a subprocess: val_* records at
    the right epochs, best checkpoint directory written, post-train eval on
    the held-out split."""
    metrics = tmp_path / "m.jsonl"
    ckpt_dir = tmp_path / "ckpt"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "256",
         "--batch-size", "64", "--epochs", "5", "--val-frac", "0.25",
         "--val-every", "2", "--keep-best",
         "--metrics", str(metrics), "--ckpt-dir", str(ckpt_dir)],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "192 train / 64 val" in out.stdout
    recs = read_jsonl(str(metrics))
    val_epochs = [r["epoch"] for r in recs if "val_total" in r]
    # Boundaries after epochs 2 and 4 (logged as last-completed epoch
    # index 1, 3) plus the forced final validation after epoch 5 (index 4).
    assert val_epochs == [1, 3, 4], recs
    vr = [r for r in recs if "val_total" in r][0]
    assert "val_image->trajectory" in vr and "val_assoc" in vr
    assert (ckpt_dir / "best").is_dir()
    assert "new best val_total" in out.stdout


def test_driver_validation_composes_with_sharded_layouts(tmp_path):
    """--val-frac under --mesh 8 (DP) and --mesh 8 --fsdp: eval_metrics'
    jitted programs must accept GSPMD-sharded params (XLA inserts the
    gathers), and the val epochs land on the same boundaries as on one
    device."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    for extra in ([], ["--fsdp"]):
        metrics = tmp_path / f"m{'_'.join(extra)}.jsonl"
        out = subprocess.run(
            [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
             "--config", "3", "--data", "synthetic", "--n-samples", "320",
             "--batch-size", "64", "--epochs", "2", "--mesh", "8",
             "--val-frac", "0.2", "--metrics", str(metrics)] + extra,
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, (extra, out.stderr[-3000:])
        recs = read_jsonl(str(metrics))
        val_epochs = [r["epoch"] for r in recs if "val_total" in r]
        assert val_epochs == [0, 1], (extra, recs)


def test_driver_validation_composes_with_fused(tmp_path):
    """--fused + --val-frac: the chunk loop bounds each fused device
    program at the next validation boundary, so whole-run fusion and
    periodic held-out evaluation compose."""
    metrics = tmp_path / "m.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "256",
         "--batch-size", "64", "--epochs", "4", "--fused",
         "--val-frac", "0.25", "--val-every", "2", "--metrics", str(metrics)],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    recs = read_jsonl(str(metrics))
    assert [r["epoch"] for r in recs if "val_total" in r] == [1, 3], recs


def test_driver_keep_best_resume_reseeds_best(tmp_path):
    """--resume with --keep-best must re-seed best-so-far from the existing
    best/ checkpoint: starting from inf would let the first post-resume
    validation overwrite a genuinely better best with a worse state. With
    --learning-rate 0 the resumed run's val_total exactly equals the saved
    best (params frozen at the best state), so a correct run reports the
    seed and never announces a new best."""
    metrics = tmp_path / "m.jsonl"
    ckpt_dir = tmp_path / "ckpt"
    base = [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
            "--config", "3", "--data", "synthetic", "--n-samples", "128",
            "--batch-size", "64", "--val-frac", "0.25", "--val-every", "1",
            "--keep-best", "--ckpt-dir", str(ckpt_dir),
            "--metrics", str(metrics)]
    out = subprocess.run(
        base + ["--epochs", "3"],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "new best val_total" in out.stdout
    out2 = subprocess.run(
        base + ["--epochs", "2", "--resume", "--learning-rate", "0"],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out2.returncode == 0, out2.stderr[-3000:]
    assert "resume: existing best checkpoint has val_total=" in out2.stdout
    # Params frozen at the prior best -> equal val_total -> no new best,
    # and the best/ checkpoint is not overwritten by an equal-or-worse one.
    assert "new best val_total" not in out2.stdout


def test_driver_early_stopping(tmp_path):
    """--early-stop-patience: with LR 0 the params never change, so
    val_total never improves after the first validation; patience 1 must
    stop the run at the second validation instead of training 10 epochs."""
    metrics = tmp_path / "m.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "64", "--epochs", "10", "--learning-rate", "0",
         "--val-frac", "0.25", "--val-every", "1",
         "--early-stop-patience", "1", "--metrics", str(metrics)],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "early stop at epoch 1" in out.stdout
    recs = read_jsonl(str(metrics))
    train_epochs = [r["epoch"] for r in recs if "grad_norm" in r]
    assert train_epochs == [0, 1], recs  # stopped after 2 of 10 epochs


def test_driver_early_stop_requires_val(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--early-stop-patience", "2"],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode != 0
    assert "--early-stop-patience requires --val-frac" in out.stderr


def test_driver_keep_best_requires_val_and_ckpt(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--keep-best",
         "--ckpt-dir", str(tmp_path / "c")],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode != 0
    assert "--keep-best requires --val-frac" in out.stderr
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--keep-best", "--val-frac", "0.2"],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode != 0
    assert "--keep-best requires --ckpt-dir" in out.stderr
