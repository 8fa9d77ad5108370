"""Vectorized multi-model training: E models in ONE compiled program.

The reference trains one model per process invocation (SURVEY.md §3.1 —
the driver script builds one `AssocVariationalAutoEncoder` and loops
`partial_fit`); a seed ensemble or hyperparameter sweep means rerunning
the script E times. On TPU that is the worst possible shape: the
reference-scale towers (784→500→500→20) underutilize the MXU on their
own (docs/PERF.md "Where the remaining ~4× goes"), and E sequential runs
pay that underutilization E times plus E dispatch streams.

This module `jax.vmap`s the SAME `_one_step` every other path uses over
a leading model axis, so E towers become one batch of larger dot_generals
sharing one fused program, one shuffle stream, and one dispatch. Swept
axes:

- **seed** — per-model init params + reparameterization ε stream
  (always; it's just the vmapped `TrainState`).
- **learning_rate** — the optimizer is built with ``learning_rate=1.0``
  and the Adam direction is scaled per model (bitwise-equal to
  ``optax.adam(lr)``; see `step._one_step`). Constant-schedule only —
  a per-model cosine horizon would need per-model schedule state.
- **assoc_lambda** — the objective is rebuilt from its logged terms with
  a runtime λ (`step._total_with_lambda`); exact gradients, one program
  for every λ.

The model axis is data-independent, so sweep states compose with the
rest of the framework: `select_model(state, i)` is a plain `TrainState`
that checkpoints (orbax), evaluates (`train.eval`), and serves
(`serve.Predictor`) like any single-model state.

Kernels: the sweep forces the XLA path (``use_pallas=False``). The
Pallas kernels' grids and VMEM budgets are sized per model; vmap's
`pallas_call` batching rule would serialize the model axis into grid
steps, forfeiting exactly the cross-model batching this module exists
for. XLA instead fuses the E towers into batched contractions — measured
on TPU in docs/PERF.md ("Sweep").
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vae_assoc_tpu.configs import AssocConfig, TrainConfig
from vae_assoc_tpu.train.step import (
    TrainState,
    _one_step,
    init_train_state,
    make_optimizer,
)


def _sweep_tc(tc: TrainConfig, vary_lr: bool) -> TrainConfig:
    """The TrainConfig the vmapped step actually runs."""
    if vary_lr and (tc.lr_schedule != "constant" or tc.warmup_steps > 0):
        raise ValueError(
            "per-model learning rates require the constant LR schedule "
            f"with no warmup; got lr_schedule={tc.lr_schedule!r}, "
            f"warmup_steps={tc.warmup_steps}"
        )
    if vary_lr and tc.ema_decay > 0:
        raise ValueError(
            "per-model learning rates are incompatible with ema_decay: "
            "lr scaling happens outside the optimizer chain, so the "
            "in-chain EMA stage would average the UNSCALED updates"
        )
    changes = {}
    if vary_lr:
        changes["learning_rate"] = 1.0  # direction only; scaled per model
    if tc.use_pallas:
        changes["use_pallas"] = False  # see module docstring
    return dataclasses.replace(tc, **changes) if changes else tc


def init_sweep_state(
    cfg: AssocConfig, tc: TrainConfig, seeds: Sequence[int]
) -> TrainState:
    """E independently-seeded `TrainState`s stacked on a leading model axis.

    Model i is initialized from ``jax.random.key(seeds[i])`` — exactly the
    key `init_train_state` derives for a single run with that seed, so a
    sweep member is comparable to the standalone run it replaces.
    """
    seeds = [int(s) for s in seeds]
    if len(seeds) < 1:
        raise ValueError("need at least one seed")
    if len(set(seeds)) != len(seeds):
        raise ValueError(f"duplicate seeds in sweep: {seeds}")
    keys = jnp.stack([jax.random.key(s) for s in seeds])
    return jax.vmap(lambda k: init_train_state(cfg, _sweep_tc(tc, False), k))(
        keys
    )


def select_model(state: TrainState, i: int) -> TrainState:
    """Extract sweep member i as a plain single-model `TrainState`."""
    return jax.tree.map(lambda x: x[i], state)


@functools.lru_cache(maxsize=32)
def make_sweep_step(
    cfg: AssocConfig,
    tc: TrainConfig,
    *,
    vary_lr: bool = False,
    vary_assoc: bool = False,
    jit: bool = True,
):
    """Build the vmapped E-model train step.

    Returns ``step_fn(state, xs, *extras) -> (state', metrics)`` where
    ``state`` is an `init_sweep_state` pytree, ``xs`` is the usual list of
    per-modality batches (shared by all models — the model axis is the
    hyperparameter axis, not a data axis), ``extras`` is ``(lrs?, lams?)``
    — one ``[E]`` float array per enabled vary flag, in that order — and
    every metric comes back with a leading ``[E]`` axis.

    ``tc.steps_per_call > 1`` works exactly as in `make_train_step`: ``xs``
    holds ``[N, B, D]`` stacks, one `lax.scan` runs N fused steps, metrics
    gain a leading ``[N]`` axis (then ``[E]``: ``[N, E]``).
    """
    tc_run = _sweep_tc(tc, vary_lr)
    opt = make_optimizer(tc_run)
    n_extra = int(vary_lr) + int(vary_assoc)

    def one(state, xs, *extras):
        it = iter(extras)
        lr = next(it) if vary_lr else None
        lam = next(it) if vary_assoc else None
        return _one_step(
            state, list(xs), cfg, tc_run, opt, assoc_lambda=lam, lr_scale=lr
        )

    # Data is broadcast (in_axes=None); state and hyperparameters map over
    # the model axis.
    vstep = jax.vmap(one, in_axes=(0, None) + (0,) * n_extra)

    if tc.steps_per_call == 1:

        def step_fn(state, xs, *extras):
            _check_extras(extras, n_extra, state)
            return vstep(state, tuple(xs), *extras)

    else:

        def step_fn(state, xs, *extras):
            _check_extras(extras, n_extra, state)

            def body(carry, batch):
                return vstep(carry, batch, *extras)

            return jax.lax.scan(body, state, tuple(xs))

    if jit:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))
    return step_fn


def _check_extras(extras, n_extra: int, state) -> None:
    if len(extras) != n_extra:
        raise ValueError(
            f"sweep step built for {n_extra} hyperparameter array(s) "
            f"(lrs, lams as enabled), got {len(extras)}"
        )
    e = jax.tree.leaves(state)[0].shape[0]
    for a in extras:
        if a.shape != (e,):
            raise ValueError(
                f"hyperparameter arrays must be shape ({e},) — one entry "
                f"per sweep model — got {a.shape}"
            )


@functools.lru_cache(maxsize=32)
def make_dp_sweep_step(
    cfg: AssocConfig,
    tc: TrainConfig,
    mesh,
    *,
    vary_lr: bool = False,
    vary_assoc: bool = False,
    jit: bool = True,
):
    """Data-parallel sweep: `shard_map` over the data mesh OUTSIDE,
    `vmap` over the model axis INSIDE.

    Batches shard over devices exactly as in `parallel.dp.make_dp_train_step`
    (each of the E models sees the same GLOBAL batch); the ``[E]``-stacked
    state and hyperparameter arrays replicate. Inside each shard the vmapped
    `_one_step` pmeans every model's loss over the data axis, so the
    backward pass all-reduces E per-model gradients over ICI in one
    coalesced collective — the DP communication surface, times E models.

    ``step_fn(state, xs, *extras)`` mirrors `make_sweep_step`, with ``xs``
    global batches sharded (or shardable) on the batch dim and ``state``
    replicated (`parallel.mesh.replicate` of an `init_sweep_state` tree).
    """
    from jax.sharding import PartitionSpec as P

    from vae_assoc_tpu.parallel import mesh as mesh_mod

    tc_run = _sweep_tc(tc, vary_lr)
    opt = make_optimizer(tc_run)
    axis = mesh.axis_names[0]
    n_extra = int(vary_lr) + int(vary_assoc)

    def one(state, xs, *extras):
        it = iter(extras)
        lr = next(it) if vary_lr else None
        lam = next(it) if vary_assoc else None
        return _one_step(
            state, list(xs), cfg, tc_run, opt, axis,
            assoc_lambda=lam, lr_scale=lr,
        )

    vstep = jax.vmap(one, in_axes=(0, None) + (0,) * n_extra)
    n = tc.steps_per_call

    def local(state, xs, *extras):
        _check_extras(extras, n_extra, state)
        if n == 1:
            return vstep(state, tuple(xs), *extras)

        def body(carry, batch):
            return vstep(carry, batch, *extras)

        return jax.lax.scan(body, state, tuple(xs))

    xs_spec = mesh_mod.batch_spec(mesh, leading_scan_axis=n > 1)
    step_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), xs_spec) + (P(),) * n_extra,
        out_specs=(P(), P()),
    )
    if jit:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))
    return step_fn


def init_dp_sweep_state(
    cfg: AssocConfig, tc: TrainConfig, mesh, seeds: Sequence[int]
) -> TrainState:
    """An `init_sweep_state` tree replicated across the mesh."""
    from vae_assoc_tpu.parallel import mesh as mesh_mod

    return mesh_mod.replicate(mesh, init_sweep_state(cfg, tc, seeds))


def sweep_loop(
    cfg: AssocConfig,
    tc: TrainConfig,
    data: Sequence[np.ndarray],
    *,
    seeds: Sequence[int],
    learning_rates: Optional[Sequence[float]] = None,
    assoc_lambdas: Optional[Sequence[float]] = None,
    epochs: int = 10,
    state: Optional[TrainState] = None,
    display_step: int = 1,
    on_metrics: Optional[Callable[[int, dict], None]] = None,
    shuffle: bool = True,
):
    """Train E models over the same paired data in one program per call.

    Mirrors `train_loop`'s contract (staged HBM data, chunk-offset-aware
    host shuffle, per-epoch mean metrics) with a leading model axis:
    history entries map metric name → ``[E]`` numpy array. All models see
    identical batches in identical order — the sweep axes are
    (seed, learning_rate, assoc_lambda), not data.

    Returns ``(state, history)``; pick a winner with
    ``select_model(state, int(np.argmin(history[-1]["total"])))``.
    """
    e = len(seeds)
    for name, arr in (("learning_rates", learning_rates),
                      ("assoc_lambdas", assoc_lambdas)):
        if arr is not None and len(arr) != e:
            raise ValueError(
                f"{name} must have one entry per seed ({e}), got {len(arr)}"
            )
    extras = []
    if learning_rates is not None:
        extras.append(jnp.asarray(learning_rates, jnp.float32))
    if assoc_lambdas is not None:
        extras.append(jnp.asarray(assoc_lambdas, jnp.float32))

    n = data[0].shape[0]
    for k, d in enumerate(data):
        if d.shape[0] != n:
            raise ValueError(f"modality {k} has {d.shape[0]} rows, expected {n}")
    bs, spc = tc.batch_size, tc.steps_per_call
    nb = n // bs
    if nb == 0:
        raise ValueError(f"batch_size {bs} > dataset size {n}")
    n_calls = nb // spc
    if n_calls == 0:
        raise ValueError(f"steps_per_call {spc} > batches/epoch {nb}")

    if state is None:
        state = init_sweep_state(cfg, tc, seeds)
    step_fn = make_sweep_step(
        cfg,
        tc,
        vary_lr=learning_rates is not None,
        vary_assoc=assoc_lambdas is not None,
    )

    from vae_assoc_tpu.train.loop import _gather_epoch_fn

    dev_data = [jax.device_put(jnp.asarray(d)) for d in data]
    # Same chunk-offset-aware shuffle stream as train_loop — steps count
    # per model and advance in lockstep, so leaf [0] is the shared count.
    start_step = int(jax.device_get(state.step[0]))
    shuffle_rng = np.random.default_rng([tc.seed, start_step])
    gather_epoch = _gather_epoch_fn(n_calls, spc, bs)

    history = []
    for epoch in range(epochs):
        perm = (
            shuffle_rng.permutation(n) if shuffle else np.arange(n)
        ).astype(np.int32)
        epoch_stacks = gather_epoch(jnp.asarray(perm), *dev_data)
        t0 = time.perf_counter()
        metrics_acc = []
        for c in range(n_calls):
            xs = [stack[c] if spc > 1 else stack[c, 0] for stack in epoch_stacks]
            state, metrics = step_fn(state, xs, *extras)
            metrics_acc.append(metrics)
        metrics_acc = jax.device_get(metrics_acc)
        dt = time.perf_counter() - t0
        # Mean over steps within the epoch, keeping the model axis: each
        # call's metric is [E] (spc==1) or [N, E] (scan) — mean axis 0.
        mean_metrics = {
            k: np.mean(
                np.stack([np.atleast_2d(m[k]) for m in metrics_acc]),
                axis=(0, 1),
            )
            for k in metrics_acc[0]
        }
        # Per-model rate (comparable with a single-model train_loop run):
        # each model consumed n_calls*spc*bs samples in dt. The sweep's
        # aggregate is E× this — logged separately so per-model JSONL
        # records never read E× inflated.
        mean_metrics["samples_per_sec"] = np.full(e, n_calls * spc * bs / dt)
        mean_metrics["sweep_model_samples_per_sec"] = np.full(
            e, n_calls * spc * bs * e / dt
        )
        history.append(mean_metrics)
        if on_metrics is not None and (epoch % display_step == 0):
            on_metrics(epoch, mean_metrics)
    return state, history


__all__ = [
    "init_dp_sweep_state",
    "init_sweep_state",
    "make_dp_sweep_step",
    "make_sweep_step",
    "select_model",
    "sweep_loop",
]
