"""Per-config integration matrix (SURVEY.md §4.4): every BASELINE config
milestone — shrunk to tiny dims but keeping its exact shape (modalities,
recon kinds, encoder type, dtype policy, parallelism) — must overfit a
tiny subset: loss decreasing and reconstruction MSE under threshold.
"""

import dataclasses
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import (
    AssocConfig,
    ModalityConfig,
    baseline_config,
    default_image_arch,
)
from vae_assoc_tpu.data.pipeline import PairedDataset
from vae_assoc_tpu.train import evaluate
from vae_assoc_tpu.train.step import init_train_state, make_train_step


def _shrink(cfg: AssocConfig) -> AssocConfig:
    """Same config shape, tiny dims (conv towers keep 784 — required)."""
    mods = []
    for m in cfg.modalities:
        arch = dict(m.arch)
        arch.update(
            n_z=4, n_hidden_recog_1=32, n_hidden_recog_2=32,
            n_hidden_gener_1=32, n_hidden_gener_2=32,
        )
        if not m.encoder.startswith("conv"):
            arch["n_input"] = min(arch["n_input"], 64)
        mods.append(dataclasses.replace(m, arch=arch))
    return dataclasses.replace(cfg, modalities=mods)


@pytest.fixture(scope="module")
def paired():
    ds = PairedDataset.from_synthetic(64, seed=5, n_timesteps=32)
    imgs, trajs = (np.asarray(a) for a in ds.features())
    return imgs, trajs[:, :64]


@pytest.mark.parametrize("milestone", [1, 2, 3, 4])
def test_milestone_overfits_tiny_subset(milestone, paired):
    imgs, trajs = paired
    cfg, tc = baseline_config(milestone)
    cfg = _shrink(cfg)
    tc = dataclasses.replace(
        tc, batch_size=32, steps_per_call=1, learning_rate=3e-3,
        use_pallas=False,
    )
    by_name = {"image": imgs, "trajectory": trajs}
    xs = [
        jnp.asarray(by_name[m.name][:32, : m.arch["n_input"]])
        for m in cfg.modalities
    ]
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    losses = []
    for _ in range(50):
        state, m = step(state, xs)
        losses.append(float(m["total"]))
    assert losses[-1] < 0.7 * losses[0], (milestone, losses[0], losses[-1])
    mse = evaluate(state.params, xs, cfg, compute_dtype=tc.compute_dtype)
    for k, v in mse.items():
        src = k.split("->")[0]
        bound = 0.06 if "image->image" in k else 0.6
        assert v < bound, (milestone, k, v, mse)


def test_milestone_5_dp_overfits(paired):
    """Config 5's shape: DP over the 8-device mesh, bf16, multi-step scan."""
    from vae_assoc_tpu.parallel import (
        init_dp_train_state, make_dp_train_step, make_mesh, shard_batch,
    )

    imgs, trajs = paired
    cfg, tc = baseline_config(5)
    cfg = _shrink(cfg)
    tc = dataclasses.replace(
        tc, batch_size=32, steps_per_call=2, learning_rate=3e-3,
        use_pallas=False,
    )
    mesh = make_mesh(8)
    widths = [m.arch["n_input"] for m in cfg.modalities]
    xs = shard_batch(
        mesh,
        [np.repeat(imgs[:16, : widths[0]], 4, 0).reshape(2, 32, -1),
         np.repeat(trajs[:16, : widths[1]], 4, 0).reshape(2, 32, -1)],
        leading_scan_axis=True,
    )
    state = init_dp_train_state(cfg, tc, mesh)
    step = make_dp_train_step(cfg, tc, mesh)
    losses = []
    for _ in range(25):
        state, m = step(state, xs)
        losses.append(float(np.mean(np.asarray(m["total"]))))
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])


def test_driver_mesh_flag_runs_dp(tmp_path):
    """--mesh 4 on the virtual-device CPU backend drives dp_train_loop."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "32", "--epochs", "2", "--mesh", "4"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "data-parallel over 4 devices" in out.stdout


def test_driver_model_parallel_flag_runs_tp(tmp_path):
    """--mesh 4 --model-parallel 2 drives the DP x TP GSPMD loop."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "32", "--epochs", "2", "--mesh", "4",
         "--model-parallel", "2"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "(data, model) mesh" in out.stdout


def test_driver_fsdp_flag_runs_fsdp(tmp_path):
    """--mesh 4 --fsdp drives the ZeRO-style sharded-state loop."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "32", "--epochs", "2", "--mesh", "4", "--fsdp"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "fully-sharded data-parallel over 4 devices" in out.stdout

