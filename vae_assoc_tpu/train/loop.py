"""Host-side epoch driver around the jitted train step.

Replaces the reference's epoch/minibatch `partial_fit` loop (SURVEY.md
§3.1): data is staged to device once, shuffled with device-side gathers,
and consumed in ``steps_per_call``-sized stacks so the host touches the
device only once per fused scan. Periodic metrics mirror the reference's
``display_step`` average-cost print, but as structured dicts.
"""

from __future__ import annotations

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
    make_train_step,
)


def _batches_per_epoch(n_samples: int, batch_size: int) -> int:
    return n_samples // batch_size  # drop remainder, as the reference does


@functools.lru_cache(maxsize=64)
def _gather_epoch_fn(n_calls: int, spc: int, bs: int):
    """Cached jitted epoch gather: perm + staged arrays → [n_calls, spc, bs, D]
    stacks. Module-level cache so chunked training (one train_loop call per
    checkpoint interval) reuses the compiled gather instead of re-tracing a
    fresh closure every call."""

    @jax.jit
    def gather(perm, *arrays):
        used = n_calls * spc * bs
        return tuple(
            a[perm[:used]].reshape(n_calls, spc, bs, a.shape[-1]) for a in arrays
        )

    return gather


def train_loop(
    cfg: AssocConfig,
    tc: TrainConfig,
    data: Sequence[np.ndarray],
    *,
    epochs: int = 10,
    state: Optional[TrainState] = None,
    display_step: int = 1,
    on_metrics: Optional[Callable[[int, dict], None]] = None,
    shuffle: bool = True,
    refresh_data: Optional[Callable[[int], Sequence]] = None,
):
    """Train for `epochs` over paired per-modality arrays.

    Args:
      data: list of K host arrays, each [N, n_input_k], paired by row.
      on_metrics: callback(epoch, metrics_dict) every `display_step` epochs.
      refresh_data: optional callback(epoch_index) -> fresh device arrays
        with the SAME shapes as `data`, called at each epoch start — the
        per-epoch data-augmentation hook (`PairedDataset.features(
        augment=...)`); shapes are static so the gathered-epoch program is
        reused across refreshes. epoch_index is the loop-local epoch; a
        chunked caller (the driver) adds its own offset for a
        deterministic stream across chunks/resume.

    Returns (state, history list of per-epoch mean metric dicts).
    """
    n = data[0].shape[0]
    for k, d in enumerate(data):
        if d.shape[0] != n:
            raise ValueError(f"modality {k} has {d.shape[0]} rows, expected {n}")
    bs = tc.batch_size
    nb = _batches_per_epoch(n, bs)
    if nb == 0:
        raise ValueError(f"batch_size {bs} > dataset size {n}")
    spc = tc.steps_per_call
    n_calls = nb // spc
    if n_calls == 0:
        raise ValueError(f"steps_per_call {spc} > batches/epoch {nb}")

    if state is None:
        state = init_train_state(cfg, tc)
    step_fn = make_train_step(cfg, tc)

    # Stage the full dataset into HBM once; per-epoch shuffles are
    # device-side gathers — no per-batch host→device feed_dict copies.
    dev_data = [jax.device_put(jnp.asarray(d)) for d in data]
    # Fold training progress into the shuffle stream: a chunked run (the
    # driver calls train_loop once per checkpoint interval) or a resumed one
    # must NOT replay the same permutation sequence every chunk. Seeding
    # with (seed, start_step) keeps runs deterministic AND chunk-offset
    # aware — and keeps kill/resume reproducibility, since checkpoints land
    # on chunk boundaries (same start_step → same continuation stream).
    start_step = int(jax.device_get(state.step))
    shuffle_rng = np.random.default_rng([tc.seed, start_step])
    gather_epoch = _gather_epoch_fn(n_calls, spc, bs)

    history = []
    for epoch in range(epochs):
        if refresh_data is not None:
            fresh = [jnp.asarray(d) for d in refresh_data(epoch)]
            if any(f.shape != d.shape for f, d in zip(fresh, dev_data)) or (
                len(fresh) != len(dev_data)
            ):
                raise ValueError(
                    "refresh_data must return arrays with the original "
                    f"shapes {[d.shape for d in dev_data]}, got "
                    f"{[f.shape for f in fresh]}"
                )
            dev_data = fresh
        perm = (
            shuffle_rng.permutation(n) if shuffle else np.arange(n)
        ).astype(np.int32)
        epoch_stacks = gather_epoch(jnp.asarray(perm), *dev_data)
        t0 = time.perf_counter()
        metrics_acc = []
        for c in range(n_calls):
            xs = [stack[c] if spc > 1 else stack[c, 0] for stack in epoch_stacks]
            state, metrics = step_fn(state, xs)
            metrics_acc.append(metrics)
        # One host sync per epoch, after all calls are enqueued.
        metrics_acc = jax.device_get(metrics_acc)
        dt = time.perf_counter() - t0
        mean_metrics = {
            k: float(np.mean([np.mean(m[k]) for m in metrics_acc]))
            for k in metrics_acc[0]
        }
        mean_metrics["samples_per_sec"] = n_calls * spc * bs / dt
        history.append(mean_metrics)
        if on_metrics is not None and (epoch % display_step == 0):
            on_metrics(epoch, mean_metrics)
    return state, history


@functools.lru_cache(maxsize=64)
def _fused_runner(cfg: AssocConfig, tc: TrainConfig, steps: int, shuffle: bool):
    """Build (and cache) the jitted N-epoch runner for a config.

    Cached at module level so repeated `train_loop_fused` calls with the
    same config reuse the compiled program instead of re-tracing — configs
    are hashable frozen dataclasses precisely for this.
    """
    opt = make_optimizer(tc)
    bs = tc.batch_size
    used = steps * bs

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def run(state, key, dev_data, epochs):
        n = dev_data[0].shape[0]

        def epoch_body(state, ekey):
            if shuffle:
                perm = jax.random.permutation(ekey, n)[:used]
            else:
                perm = jnp.arange(used)
            stacks = tuple(a[perm].reshape(steps, bs, a.shape[-1]) for a in dev_data)

            def step_body(carry, batch):
                return _one_step(carry, list(batch), cfg, tc, opt)

            state, metrics = jax.lax.scan(step_body, state, stacks)
            return state, {k: jnp.mean(v) for k, v in metrics.items()}

        keys = jax.random.split(key, epochs)
        return jax.lax.scan(epoch_body, state, keys)

    return run


def train_loop_fused(
    cfg: AssocConfig,
    tc: TrainConfig,
    data: Sequence[np.ndarray],
    *,
    epochs: int = 10,
    state: Optional[TrainState] = None,
    shuffle: bool = True,
):
    """Fully device-resident training: N epochs in ONE dispatched program.

    Where `train_loop` pays a host↔device round trip per fused call (which
    dominates wall-clock behind a high-latency device link), this variant
    compiles shuffle → gather → all train steps of ALL epochs into a single
    jitted double `lax.scan` (epochs outer, steps inner). The host touches
    the device exactly once to launch and once to fetch the [epochs]-shaped
    metric means — the "multi-step lax.scan on device from day one" design
    of SURVEY.md §7. Shuffling uses a device-side `jax.random.permutation`
    per epoch (deterministic in tc.seed).

    Returns (state, history) like `train_loop`; `samples_per_sec` is the
    aggregate over the whole run (one number, repeated per epoch entry).
    """
    n = data[0].shape[0]
    for k, d in enumerate(data):
        if d.shape[0] != n:
            raise ValueError(f"modality {k} has {d.shape[0]} rows, expected {n}")
    bs, spc = tc.batch_size, tc.steps_per_call
    steps = (n // bs // spc) * spc  # steps per epoch, whole fused calls only
    if steps == 0:
        raise ValueError(
            f"dataset of {n} rows < batch_size*steps_per_call = {bs * spc}"
        )
    used = steps * bs
    if state is None:
        state = init_train_state(cfg, tc)
    dev_data = tuple(jax.device_put(jnp.asarray(d)) for d in data)
    # Chunk-offset-aware shuffle stream (see train_loop): deterministic in
    # (seed, start_step), no permutation replay across chunks/resumes.
    shuffle_key = jax.random.fold_in(
        jax.random.key(np.uint32(tc.seed) ^ np.uint32(0x5EED)),
        int(jax.device_get(state.step)),
    )

    run = _fused_runner(cfg, tc, steps, shuffle)
    # The first (cfg, tc, shapes, epochs) combination pays compilation
    # inside dt; repeat calls hit the module-level jit cache (configs are
    # hashable) — for steady-state numbers call twice and read the second.
    t0 = time.perf_counter()
    state, em = run(state, shuffle_key, dev_data, epochs)
    em = jax.device_get(em)
    dt = time.perf_counter() - t0
    sps = epochs * used / dt
    history = []
    for e in range(epochs):
        h = {k: float(v[e]) for k, v in em.items()}
        h["samples_per_sec"] = sps
        history.append(h)
    return state, history
