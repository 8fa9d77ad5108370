"""Real multi-process (multi-controller) DP validation — the multi-host
path without a cluster.

Launches 2 separate JAX processes (scripts/multiprocess_dp_worker.py),
each owning 4 virtual CPU devices, connected via
`jax.distributed.initialize` with Gloo cross-process collectives. The
workers train over the 2-level ('replica', 'data') mesh from
`make_multihost_mesh` with `batch_axes=("replica", "data")` — the exact
production spelling for a multi-host pod, where the gradient sync's outer
leg rides DCN. Asserts:

  1. both processes report identical losses each step (the all-reduce is
     actually global);
  2. the losses match a single-process run of the same (2, 4) mesh shape
     on the same global batches (multi-process == single-process
     semantics);
  3. workers' replicated params stay bit-identical across devices
     (checked in-worker);
  4. cross-process TENSOR parallelism (worker phase 2: a (4, 2)
     ('data','model') mesh spanning both processes, Megatron GSPMD
     shardings, jit-identity state placement) — identical across
     processes and equal to the single-process TP run.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

NPROC = 2


def _free_port() -> str:
    """OS-assigned free port — a hardcoded one collides across concurrent
    suite runs on the same host (parallel CI, leftover processes)."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return str(s.getsockname()[1])


def _launch():
    port = _free_port()
    env = dict(os.environ)
    # Workers provision their own 4-device CPU platform; the conftest's
    # 8-device flag must not leak in.
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env.pop("JAX_PLATFORMS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(root, "scripts", "multiprocess_dp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(NPROC), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(NPROC)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    return procs, outs


def test_two_process_dp_matches_single_process():
    procs, outs = _launch()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "DONE" in out, out[-3000:]

    per_proc = []
    for out in outs:
        losses = {
            int(m.group(1)): float(m.group(2))
            for m in re.finditer(r"^METRICS \d+ (\d+) ([0-9.]+)", out, re.M)
        }
        assert len(losses) == 3, out[-2000:]
        per_proc.append([losses[i] for i in range(3)])
    # 1. Identical across processes: the collective really was global.
    np.testing.assert_allclose(per_proc[0], per_proc[1], rtol=0)

    # 2. Single-process reference: same (2, 4) mesh shape on the 8-device
    # conftest backend, same seed/batches/batch_axes.
    import jax
    from jax.sharding import Mesh
    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
    from vae_assoc_tpu.parallel import (
        init_dp_train_state,
        make_dp_train_step,
        shard_batch,
    )

    arch = dict(
        n_input=24,
        n_z=4,
        n_hidden_recog_1=16,
        n_hidden_recog_2=16,
        n_hidden_gener_1=16,
        n_hidden_gener_2=16,
    )
    cfg = AssocConfig(
        [
            ModalityConfig("image", arch, recon="bernoulli"),
            ModalityConfig("trajectory", dict(arch), recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("replica", "data"))
    state = init_dp_train_state(cfg, tc, mesh)
    step_fn = make_dp_train_step(cfg, tc, mesh, batch_axes=("replica", "data"))
    rng = np.random.default_rng(7)
    ref = []
    for _ in range(3):
        xs = shard_batch(
            mesh,
            [
                rng.uniform(0, 1, (32, 24)).astype(np.float32),
                rng.normal(size=(32, 24)).astype(np.float32),
            ],
            batch_axes=("replica", "data"),
        )
        state, metrics = step_fn(state, xs)
        ref.append(float(jax.device_get(metrics["total"])))
    np.testing.assert_allclose(per_proc[0], ref, rtol=2e-5)

    # 3. Cross-process TENSOR parallelism (worker phase 2): identical
    # across processes AND matching a single-process TP run of the same
    # (4, 2) ('data', 'model') mesh shape on the same global batches.
    tp_per_proc = []
    for out in outs:
        losses = {
            int(m.group(1)): float(m.group(2))
            for m in re.finditer(r"^TPMETRICS \d+ (\d+) ([0-9.]+)", out, re.M)
        }
        assert len(losses) == 2, out[-2000:]
        tp_per_proc.append([losses[i] for i in range(2)])
    np.testing.assert_allclose(tp_per_proc[0], tp_per_proc[1], rtol=0)

    from vae_assoc_tpu.parallel import (
        init_tp_train_state,
        make_tp_train_step,
        shard_tp_batch,
    )

    tp_mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    tp_state = init_tp_train_state(cfg, tc, tp_mesh)
    tp_step = make_tp_train_step(cfg, tc, tp_mesh)
    rng2 = np.random.default_rng(11)
    tp_ref = []
    for _ in range(2):
        xs = shard_tp_batch(
            tp_mesh,
            [
                rng2.uniform(0, 1, (32, 24)).astype(np.float32),
                rng2.normal(size=(32, 24)).astype(np.float32),
            ],
        )
        tp_state, metrics = tp_step(tp_state, xs)
        tp_ref.append(float(jax.device_get(metrics["total"])))
    np.testing.assert_allclose(tp_per_proc[0], tp_ref, rtol=2e-5)

    # 4. Cross-process combined TP×FSDP (worker phase 3, round 3): the
    # one-spec-tree layout's weight all-gathers / gradient
    # reduce-scatters cross the process boundary too — identical across
    # processes AND matching the single-process combined run.
    cf_per_proc = []
    for out in outs:
        losses = {
            int(m.group(1)): float(m.group(2))
            for m in re.finditer(r"^TFMETRICS \d+ (\d+) ([0-9.]+)", out, re.M)
        }
        assert len(losses) == 2, out[-2000:]
        cf_per_proc.append([losses[i] for i in range(2)])
    np.testing.assert_allclose(cf_per_proc[0], cf_per_proc[1], rtol=0)

    from vae_assoc_tpu.parallel import (
        init_tp_fsdp_train_state,
        make_tp_fsdp_train_step,
    )

    cf_state = init_tp_fsdp_train_state(cfg, tc, tp_mesh)
    cf_step = make_tp_fsdp_train_step(cfg, tc, tp_mesh)
    rng3 = np.random.default_rng(13)
    cf_ref = []
    for _ in range(2):
        xs = shard_tp_batch(
            tp_mesh,
            [
                rng3.uniform(0, 1, (32, 24)).astype(np.float32),
                rng3.normal(size=(32, 24)).astype(np.float32),
            ],
        )
        cf_state, metrics = cf_step(cf_state, xs)
        cf_ref.append(float(jax.device_get(metrics["total"])))
    np.testing.assert_allclose(cf_per_proc[0], cf_ref, rtol=2e-5)

    # 5. Cross-process shard_map ZeRO (worker phase 4, round 3): the
    # hand-written all-gather/reduce-scatter pair rides the cross-process
    # backend; flat state shards span both processes (asserted in-worker).
    # Identical across processes AND matching the single-process ZeRO run
    # on the same 8-device 1-D mesh and global batches.
    z_per_proc = []
    for out in outs:
        losses = {
            int(m.group(1)): float(m.group(2))
            for m in re.finditer(r"^ZMETRICS \d+ (\d+) ([0-9.]+)", out, re.M)
        }
        assert len(losses) == 2, out[-2000:]
        z_per_proc.append([losses[i] for i in range(2)])
    np.testing.assert_allclose(z_per_proc[0], z_per_proc[1], rtol=0)

    from vae_assoc_tpu.parallel import (
        init_zero_train_state,
        make_zero_train_step,
    )

    z_mesh = Mesh(np.asarray(jax.devices()), ("data",))
    z_state = init_zero_train_state(cfg, tc, z_mesh)
    z_step = make_zero_train_step(cfg, tc, z_mesh)
    rng4 = np.random.default_rng(17)
    z_ref = []
    for _ in range(2):
        xs = shard_batch(
            z_mesh,
            [
                rng4.uniform(0, 1, (32, 24)).astype(np.float32),
                rng4.normal(size=(32, 24)).astype(np.float32),
            ],
        )
        z_state, metrics = z_step(z_state, xs)
        z_ref.append(float(jax.device_get(metrics["total"])))
    np.testing.assert_allclose(z_per_proc[0], z_ref, rtol=2e-5)
