"""Experiment driver CLI, eval harness, metrics JSONL, viz, kill-and-resume."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.train import eval as eval_mod
from vae_assoc_tpu.utils.logging import MetricsLogger, read_jsonl

TINY = dict(
    n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
    n_hidden_gener_1=16, n_hidden_gener_2=16,
)


def tiny_cfg():
    return AssocConfig(
        [
            ModalityConfig("image", TINY, recon="bernoulli"),
            ModalityConfig("trajectory", TINY, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )


def test_cross_modal_mse_keys_and_values(rng):
    cfg = tiny_cfg()
    params = assoc_mod.init_assoc(jax.random.key(0), cfg)
    xs = [
        rng.uniform(0, 1, (32, 24)).astype(np.float32),
        rng.normal(size=(32, 24)).astype(np.float32),
    ]
    mse = eval_mod.evaluate(params, xs, cfg)
    assert set(mse) == {
        "image->image", "image->trajectory",
        "trajectory->image", "trajectory->trajectory",
    }
    assert all(np.isfinite(v) and v >= 0 for v in mse.values())


def test_metrics_logger_roundtrip(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path) as log:
        log.write(epoch=0, total=12.5)
        log.write(epoch=1, total=10.0, note="ok")
    recs = read_jsonl(path)
    assert len(recs) == 2
    assert recs[1]["total"] == 10.0 and recs[1]["note"] == "ok"


def test_metrics_logger_tensorboard_tee(tmp_path):
    tf = pytest.importorskip("tensorflow")
    tb = str(tmp_path / "tb")
    with MetricsLogger(str(tmp_path / "m.jsonl"), tensorboard_dir=tb) as log:
        log.write(epoch=0, total=12.5)
        log.write(epoch=1, total=10.0, note="ok")  # non-scalars skipped
    import glob
    events = glob.glob(tb + "/events.out.tfevents.*")
    assert events, "no TB event file written"
    seen = {}
    for path in events:
        for ev in tf.compat.v1.train.summary_iterator(path):
            for v in ev.summary.value:
                seen[(ev.step, v.tag)] = tf.make_ndarray(v.tensor).item()
    assert seen[(0, "total")] == 12.5
    assert seen[(1, "total")] == 10.0
    assert all(tag != "note" for _, tag in seen)


def test_viz_figures(rng):
    pytest.importorskip("matplotlib")
    from vae_assoc_tpu.utils import viz

    imgs = rng.uniform(0, 1, (8, 784)).astype(np.float32)
    fig = viz.reconstruction_grid(imgs, imgs)
    assert fig is not None
    trajs = rng.uniform(-1, 1, (8, 200)).astype(np.float32)
    assert viz.trajectories_over_images(imgs, trajs) is not None
    z = rng.normal(size=(64, 4)).astype(np.float32)
    assert viz.latent_scatter(z, rng.integers(0, 10, 64)) is not None


def test_driver_cli_end_to_end(tmp_path):
    """Full L3 surface in a subprocess on the CPU mesh: train, JSONL,
    checkpoint, resume, plots, eval."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    metrics = tmp_path / "metrics.jsonl"
    ckpt_dir = tmp_path / "ckpt"
    plots = tmp_path / "plots"
    base = [
        sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
        "--config", "3", "--data", "synthetic", "--n-samples", "256",
        "--batch-size", "32", "--epochs", "3",
        "--metrics", str(metrics), "--ckpt-dir", str(ckpt_dir),
        "--plots-dir", str(plots), "--mll-samples", "8",
    ]
    out = subprocess.run(base, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    recs = read_jsonl(str(metrics))
    totals = [r["total"] for r in recs if "total" in r]
    assert len(totals) == 3
    mse_recs = [r for r in recs if "mse_image->trajectory" in r]
    assert mse_recs, recs
    rec_recs = [r for r in recs if "knn_image->trajectory" in r]
    assert rec_recs and 0.0 <= rec_recs[0]["knn_image->trajectory"] <= 1.0
    mll_recs = [r for r in recs if "iwae_image" in r]
    assert mll_recs and mll_recs[0]["iwae_image"] >= mll_recs[0]["elbo_image"]
    assert (plots / "reconstructions.png").exists()
    assert (plots / "image_to_trajectory.png").exists()
    assert (plots / "latent_scatter.png").exists()

    # Kill-and-resume (SURVEY.md §5 "Failure detection"): a new process
    # restores the checkpoint and continues from the saved step.
    out2 = subprocess.run(
        base + ["--resume", "--epochs", "2"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out2.returncode == 0, out2.stderr[-3000:]
    assert "resumed from step" in out2.stdout


def test_driver_dry_compile():
    """--dry-compile: AOT pre-flight prints params/FLOPs/memory analysis
    and exits without training; sharded layouts reject loudly."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    base = [
        sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
        "--config", "3", "--data", "synthetic", "--n-samples", "64",
        "--batch-size", "32", "--depth", "4", "--hidden", "64",
        "--dry-compile",
    ]
    out = subprocess.run(base, env=env, capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "params:" in out.stdout
    assert "flops/step" in out.stdout
    assert ("HBM:" in out.stdout
            or "memory analysis unavailable" in out.stdout), out.stdout
    out2 = subprocess.run(base + ["--mesh", "4"], env=env,
                          capture_output=True, text=True, timeout=600)
    assert out2.returncode != 0
    assert "single-device step" in out2.stderr


def test_driver_sigterm_preemption_save(tmp_path):
    """Preemption-safe training (SURVEY.md §5 "Failure detection"): SIGTERM
    mid-run makes the driver checkpoint at the next chunk boundary and exit
    cleanly; a --resume run continues from the saved step."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    ckpt_dir = tmp_path / "ckpt"
    base = [
        sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
        "--config", "3", "--data", "synthetic", "--n-samples", "64",
        "--batch-size", "32", "--epochs", "500", "--preempt-chunk", "4",
        "--ckpt-dir", str(ckpt_dir),
    ]
    # stderr merged into stdout: a second unread PIPE could fill and block
    # the child before the line we wait for ever appears.
    proc = subprocess.Popen(
        base, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        # Wait until training is actually under way (first chunk's epoch
        # records echoed by MetricsLogger), then request preemption.
        for line in proc.stdout:
            if "total=" in line:
                break
        proc.send_signal(__import__("signal").SIGTERM)
        out, _ = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, out[-3000:]
    assert "preempted (signal 15): checkpoint saved" in out, out[-2000:]
    # 500 epochs at 2 steps/epoch would be step 1000; preemption must have
    # stopped well short of that, and resume must pick the step up.
    out2 = subprocess.run(
        base + ["--resume", "--epochs", "2"],  # argparse: last --epochs wins
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out2.returncode == 0, out2.stderr[-3000:]
    assert "resumed from step" in out2.stdout
    step = int(out2.stdout.split("resumed from step")[1].split()[0])
    assert 0 < step < 1000

    from vae_assoc_tpu.train import driver

    with pytest.raises(SystemExit, match="must be >= 0"):
        driver.main(["--config", "3", "--epochs", "1",
                     "--ckpt-dir", "/tmp/x", "--preempt-chunk", "-3"])
    with pytest.raises(SystemExit, match="requires --ckpt-dir"):
        driver.main(["--config", "3", "--epochs", "1",
                     "--preempt-chunk", "4"])


def test_driver_ema_decay_end_to_end(tmp_path):
    """--ema-decay: training runs, validation + post-train eval use the
    debiased EMA weights (wiring check), and the incompatible
    --sweep-lrs combination exits loudly."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    metrics = tmp_path / "metrics.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "32", "--epochs", "2", "--ema-decay", "0.9",
         "--val-frac", "0.25", "--metrics", str(metrics)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    recs = read_jsonl(str(metrics))
    assert [r for r in recs if "val_total" in r], recs
    assert [r for r in recs if "mse_image->trajectory" in r], recs

    from vae_assoc_tpu.train import driver

    with pytest.raises(SystemExit, match="ema-decay"):
        driver.main(["--config", "3", "--sweep-seeds", "2",
                     "--sweep-lrs", "1e-3", "1e-4",
                     "--ema-decay", "0.999", "--epochs", "1"])


def test_driver_config5_sharded_layout_flags(tmp_path):
    """Regression (round-2 advisor, medium): config 5 defaults
    use_pallas=True, and `--config 5 --fsdp` / `--model-parallel` used to
    pass the CLI-flag guard then crash in _check_fsdp/_check_tp_mesh with
    a raw ValueError traceback. The driver now forces the jnp path for
    sharded layouts; also covers the round-3 combined
    `--model-parallel --fsdp` spelling (previously rejected)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    for extra in (["--fsdp"], ["--model-parallel", "2"],
                  ["--model-parallel", "2", "--fsdp"]):
        out = subprocess.run(
            [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
             "--config", "5", "--data", "synthetic", "--n-samples", "256",
             "--batch-size", "64", "--steps-per-call", "1", "--epochs", "1",
             "--mesh", "8"] + extra,
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, (extra, out.stderr[-3000:])
        assert "ValueError" not in out.stderr, (extra, out.stderr[-3000:])
    # Explicit --use-pallas with a sharded layout is a loud, clean exit.
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "5", "--mesh", "8", "--fsdp", "--use-pallas"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode != 0
    assert "jnp model path" in out.stderr


def test_driver_config5_zero_layout(tmp_path):
    """--zero runs config 5 WITH its declared Pallas kernels (unlike --fsdp,
    which must force the jnp path), gathers the flat-sharded state for
    validation/checkpoint/eval, and rejects layout-conflicting flags."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    metrics = tmp_path / "metrics.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "5", "--data", "synthetic", "--n-samples", "256",
         "--batch-size", "64", "--steps-per-call", "1", "--epochs", "2",
         "--mesh", "8", "--zero", "--val-frac", "0.25",
         "--ckpt-dir", str(tmp_path / "ckpt"), "--metrics", str(metrics)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "ZeRO-sharded data-parallel" in out.stdout
    recs = read_jsonl(str(metrics))
    assert any("val_total" in r for r in recs), recs
    assert any("mse_image->trajectory" in r for r in recs), recs
    for bad, msg in (
        (["--config", "5", "--mesh", "8", "--zero", "--fsdp"],
         "owns the whole layout"),
        # config 3 never auto-meshes, so a bare --zero has no mesh.
        (["--config", "3", "--zero"], "require --mesh"),
    ):
        args = [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
                "--epochs", "1"] + bad
        out = subprocess.run(args, env=env, capture_output=True, text=True,
                             timeout=600)
        assert out.returncode != 0
        assert msg in out.stderr, (bad, out.stderr[-2000:])


def test_driver_config5_tp_shard_layout(tmp_path):
    """--tp-shard runs config 5 WITH its declared Pallas kernels (the
    shard_map TP layout keeps them), gathers the padded-sharded state for
    validation/checkpoint/eval, and rejects layout-conflicting flags."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    metrics = tmp_path / "metrics.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "5", "--data", "synthetic", "--n-samples", "256",
         "--batch-size", "64", "--steps-per-call", "1", "--epochs", "2",
         "--mesh", "8", "--tp-shard", "--val-frac", "0.25",
         "--ckpt-dir", str(tmp_path / "ckpt"), "--metrics", str(metrics)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "tensor-parallel (shard_map, kernels kept)" in out.stdout
    recs = read_jsonl(str(metrics))
    assert any("val_total" in r for r in recs), recs
    assert any("mse_image->trajectory" in r for r in recs), recs
    for bad, msg in (
        (["--config", "5", "--mesh", "8", "--tp-shard", "--zero"],
         "owns the whole layout"),
        (["--config", "3", "--tp-shard"], "require --mesh"),
        (["--config", "5", "--mesh", "8", "--data-parallel", "2"],
         "requires --tp-shard"),
        (["--config", "5", "--mesh", "8", "--tp-shard",
          "--data-parallel", "3"], "not divisible"),
    ):
        args = [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
                "--epochs", "1"] + bad
        out = subprocess.run(args, env=env, capture_output=True, text=True,
                             timeout=600)
        assert out.returncode != 0
        assert msg in out.stderr, (bad, out.stderr[-2000:])


def test_driver_config5_tp_dp_layout(tmp_path):
    """--tp-shard --data-parallel D: DP×TP on one 2-D ('data','model')
    shard_map mesh with the config-5 Pallas kernels kept (round 5)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    metrics = tmp_path / "metrics.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "5", "--data", "synthetic", "--n-samples", "256",
         "--batch-size", "64", "--steps-per-call", "1", "--epochs", "2",
         "--mesh", "8", "--tp-shard", "--data-parallel", "2",
         "--val-frac", "0.25",
         "--ckpt-dir", str(tmp_path / "ckpt"), "--metrics", str(metrics)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "DPxTP (shard_map, kernels kept): 2 data shards x 4 model" \
        in out.stdout
    recs = read_jsonl(str(metrics))
    assert any("val_total" in r for r in recs), recs
    assert any("mse_image->trajectory" in r for r in recs), recs


def test_resume_reproduces_uninterrupted_run(rng):
    """Checkpoint determinism: save at step N, train M more; restore and
    retrain M — identical losses (exact-resume guarantee, SURVEY.md §5)."""
    from vae_assoc_tpu.train.step import init_train_state, make_train_step
    from vae_assoc_tpu.utils import checkpoint as ckpt
    import tempfile

    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=16)
    xs = [
        rng.uniform(0, 1, (16, 24)).astype(np.float32),
        rng.normal(size=(16, 24)).astype(np.float32),
    ]
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    for _ in range(3):
        state, _ = step(state, xs)
    with tempfile.TemporaryDirectory() as td:
        ckpt.save(td, state)
        cont = [float(step_out[1]["total"]) for step_out in _run(step, state, xs, 4)]
        restored = ckpt.restore(td, init_train_state(cfg, tc))
        replay = [float(step_out[1]["total"]) for step_out in _run(step, restored, xs, 4)]
    assert cont == replay


def _run(step, state, xs, n):
    outs = []
    for _ in range(n):
        state, m = step(state, xs)
        outs.append((state, m))
    return outs


def test_async_checkpoint_save(rng):
    """block=False returns immediately; wait() makes it durable + restorable."""
    import tempfile

    from vae_assoc_tpu.train.step import init_train_state, make_train_step
    from vae_assoc_tpu.utils import checkpoint as ckpt

    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=16)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [
        rng.uniform(0, 1, (16, 24)).astype(np.float32),
        rng.normal(size=(16, 24)).astype(np.float32),
    ]
    state, _ = step(state, xs)
    with tempfile.TemporaryDirectory() as td:
        ckpt.save(td, state, block=False)
        state, _ = step(state, xs)  # overlap with the in-flight save
        ckpt.wait(td)
        restored = ckpt.restore(td, init_train_state(cfg, tc))
        assert int(restored.step) == 1


def test_driver_compile_cache_populates_and_hits(tmp_path):
    """--compile-cache: the first run writes persistent-cache entries; a
    second identical run HITS them — detected by entry mtimes staying
    untouched (a cache hit never rewrites the entry file; a miss would
    recompile and put). Subprocesses so the global jax config of this
    test process is never mutated (utils/compile_cache.py)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    cache = tmp_path / "xla_cache"
    base = [
        sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
        "--config", "1", "--data", "synthetic", "--n-samples", "128",
        "--batch-size", "32", "--epochs", "1",
        "--compile-cache", str(cache),
    ]
    out = subprocess.run(base, env=env, capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    entries = {p.name: p.stat().st_mtime_ns for p in cache.iterdir()}
    assert entries, "first run wrote no persistent-cache entries"

    out2 = subprocess.run(base, env=env, capture_output=True, text=True,
                          timeout=600)
    assert out2.returncode == 0, out2.stderr[-3000:]
    after = {p.name: p.stat().st_mtime_ns for p in cache.iterdir()}
    stale = {k: v for k, v in after.items() if k in entries}
    assert stale and all(entries[k] == v for k, v in stale.items()), (
        "second run rewrote cache entries — persistent cache missed")
