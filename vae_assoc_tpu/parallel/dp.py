"""Data-parallel training over an ICI mesh (BASELINE.json:11, config 5).

The reference trains on one CPU device with no parallelism (SURVEY.md §2.2).
This module is the TPU-native scale-out: `shard_map` over a 1-D `('data',)`
mesh runs the *same* per-shard train step on each chip's batch slice, and a
single `psum`/`pmean` gradient all-reduce over ICI is the entire
communication surface. Parameters and optimizer state stay replicated;
batches are sharded on the batch dimension.

Semantics: the DP step on a global batch of size B over D devices computes
exactly the gradient of the global-batch mean loss (mean of per-shard means
with equal shard sizes B/D), so learning curves match the single-device
step up to ε-stream differences (per-shard keys are decorrelated by folding
in the mesh position — see `train.step._one_step`).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from vae_assoc_tpu.configs import AssocConfig, TrainConfig
from vae_assoc_tpu.parallel import mesh as mesh_mod
from vae_assoc_tpu.train.step import (
    TrainState,
    _one_step,
    init_train_state,
    make_optimizer,
)


@functools.lru_cache(maxsize=64)
def make_dp_train_step(
    cfg: AssocConfig, tc: TrainConfig, mesh: Mesh, *, batch_axes=None, jit=True
):
    """Build the data-parallel train step over `mesh`.

    Returns ``step_fn(state, xs) -> (state', metrics)`` mirroring
    `train.step.make_train_step`, where each array in ``xs`` is a global
    batch ``[B, n_input_k]`` (or ``[N, B, n_input_k]`` stacks when
    ``tc.steps_per_call == N``) sharded — or shardable — on its batch dim.
    State must be replicated (see `parallel.mesh.replicate`); it is donated.

    batch_axes: mesh axis name(s) the batch shards over — the first mesh
    axis by default; a tuple (e.g. ``("replica", "data")`` from
    `make_multihost_mesh`) runs the gradient sync over every level
    (DCN + ICI) in one logical pmean.
    """
    opt = make_optimizer(tc)
    axis = batch_axes if batch_axes is not None else mesh.axis_names[0]
    n = tc.steps_per_call

    def local_step(state: TrainState, xs):
        if n == 1:
            return _one_step(state, list(xs), cfg, tc, opt, axis)

        def body(carry, batch):
            return _one_step(carry, list(batch), cfg, tc, opt, axis)

        return jax.lax.scan(body, state, tuple(xs))

    xs_spec = mesh_mod.batch_spec(mesh, leading_scan_axis=n > 1, batch_axes=batch_axes)
    step_fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), xs_spec),
        out_specs=(P(), P()),
    )
    if jit:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))
    return step_fn


def init_dp_train_state(cfg: AssocConfig, tc: TrainConfig, mesh: Mesh, key=None):
    """Initialize a TrainState replicated across the mesh."""
    return mesh_mod.replicate(mesh, init_train_state(cfg, tc, key))


def dp_train_loop(
    cfg: AssocConfig,
    tc: TrainConfig,
    data: Sequence[np.ndarray],
    mesh: Mesh,
    *,
    epochs: int = 10,
    state: TrainState | None = None,
    display_step: int = 1,
    on_metrics=None,
    shuffle: bool = True,
):
    """Epoch driver for the DP step — the scaled-out `train.loop.train_loop`.

    `data` is a list of K paired host arrays [N, n_input_k]; each epoch is
    shuffled on host, cut into global batches of `tc.batch_size` (must be
    divisible by the mesh size), sharded onto the mesh, and consumed in
    `steps_per_call` stacks. Returns (state, history).
    """
    if state is None:
        state = init_dp_train_state(cfg, tc, mesh)
    step_fn = make_dp_train_step(cfg, tc, mesh)
    return _epoch_loop(
        cfg,
        tc,
        data,
        mesh,
        step_fn,
        state,
        shard_fn=mesh_mod.shard_batch,
        n_batch_dev=mesh.devices.size,
        epochs=epochs,
        display_step=display_step,
        on_metrics=on_metrics,
        shuffle=shuffle,
    )


def _epoch_loop(
    cfg: AssocConfig,
    tc: TrainConfig,
    data: Sequence[np.ndarray],
    mesh: Mesh,
    step_fn,
    state: TrainState,
    *,
    shard_fn,
    n_batch_dev: int,
    epochs: int,
    display_step: int,
    on_metrics,
    shuffle: bool,
):
    """Shared host-side epoch driver for the sharded steps (DP and DP×TP).

    `n_batch_dev` is the number of mesh slots the batch dim shards over —
    the full mesh for pure DP, the `data` axis extent for DP×TP.
    """
    import time

    n = data[0].shape[0]
    bs = tc.batch_size
    if bs % n_batch_dev:
        raise ValueError(f"global batch {bs} not divisible by {n_batch_dev} devices")
    nb = n // bs
    spc = tc.steps_per_call
    n_calls = nb // spc
    if n_calls == 0:
        raise ValueError(
            f"dataset of {n} rows gives {nb} batches/epoch < steps_per_call={spc}"
        )
    n_dev = mesh.devices.size
    # Chunk-offset-aware shuffle stream (see train.loop.train_loop):
    # deterministic in (seed, start_step), no permutation replay across
    # checkpoint-chunked calls or resumes.
    rng = np.random.default_rng([tc.seed, int(jax.device_get(state.step))])

    history = []
    for epoch in range(epochs):
        perm = rng.permutation(n) if shuffle else np.arange(n)
        used = n_calls * spc * bs
        t0 = time.perf_counter()
        metrics_acc = []
        for c in range(n_calls):
            sel = perm[c * spc * bs : (c + 1) * spc * bs]
            if spc > 1:
                xs = [d[sel].reshape(spc, bs, d.shape[-1]) for d in data]
            else:
                xs = [d[sel] for d in data]
            xs = shard_fn(mesh, xs, leading_scan_axis=spc > 1)
            state, metrics = step_fn(state, xs)
            metrics_acc.append(metrics)
        metrics_acc = jax.device_get(metrics_acc)
        dt = time.perf_counter() - t0
        mean_metrics = {
            k: float(np.mean([np.mean(m[k]) for m in metrics_acc]))
            for k in metrics_acc[0]
        }
        mean_metrics["samples_per_sec"] = used / dt
        mean_metrics["samples_per_sec_per_chip"] = used / dt / n_dev
        history.append(mean_metrics)
        if on_metrics is not None and (epoch % display_step == 0):
            on_metrics(epoch, mean_metrics)
    return state, history
