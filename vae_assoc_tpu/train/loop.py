"""Host-side epoch driver around the jitted train step.

Replaces the reference's epoch/minibatch `partial_fit` loop (SURVEY.md
§3.1): data is staged to device once, shuffled with device-side gathers,
and consumed in ``steps_per_call``-sized stacks so the host touches the
device only once per fused scan. Periodic metrics mirror the reference's
``display_step`` average-cost print, but as structured dicts.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vae_assoc_tpu.configs import AssocConfig, TrainConfig
from vae_assoc_tpu.train.step import TrainState, init_train_state, make_train_step


def _batches_per_epoch(n_samples: int, batch_size: int) -> int:
    return n_samples // batch_size  # drop remainder, as the reference does


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
):
    """Train for `epochs` over paired per-modality arrays.

    Args:
      data: list of K host arrays, each [N, n_input_k], paired by row.
      on_metrics: callback(epoch, metrics_dict) every `display_step` epochs.

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
    shuffle_rng = np.random.default_rng(tc.seed)

    @jax.jit
    def gather_epoch(perm, *arrays):
        used = n_calls * spc * bs
        return tuple(
            a[perm[:used]].reshape(n_calls, spc, bs, a.shape[-1]) for a in arrays
        )

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
