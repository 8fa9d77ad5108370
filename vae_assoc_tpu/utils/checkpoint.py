"""Checkpoint save/restore via orbax.

Replaces the reference's `tf.train.Saver.save/restore` (SURVEY.md §3.5)
with async orbax checkpoints of the full TrainState pytree
{step, params, opt_state, rng} — keep-last-k, exact resume
(SURVEY.md §5 "Checkpoint / resume").
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from vae_assoc_tpu.train.step import TrainState

DEFAULT_KEEP = 3


def _manager(path: str, keep: int = DEFAULT_KEEP) -> ocp.CheckpointManager:
    path = os.path.abspath(os.path.expanduser(path))
    return ocp.CheckpointManager(
        path,
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save(
    path: str,
    state: TrainState,
    *,
    step: Optional[int] = None,
    keep: int = DEFAULT_KEEP,
    block: bool = True,
) -> str:
    """Save TrainState; returns the checkpoint directory.

    block=False starts an async orbax save and returns immediately —
    training continues while the checkpoint persists in the background
    (SURVEY.md §5 "Checkpoint/resume: save is async"). Call
    `wait(path)` before relying on it. Safe to combine with the donated
    train step: orbax copies device→host synchronously inside save();
    only the disk write is deferred, so donation can't clobber it.
    """
    # Join any in-flight async save to the same path first — otherwise its
    # manager would be dropped un-waited (abandoned write) and two live
    # managers would race on the directory's bookkeeping.
    wait(path)
    mgr = _manager(path, keep)
    if step is None:
        # Sweep states (train/sweep.py) carry an [E] step vector whose
        # members advance in lockstep; a plain state is a scalar. Either
        # way the max is the checkpoint's step number.
        step = int(np.max(jax.device_get(state.step)))
    # PRNG keys are typed arrays; store raw key data for portability.
    payload = state._replace(rng=jax.random.key_data(state.rng))
    mgr.save(step, args=ocp.args.StandardSave(payload._asdict()))
    if block:
        mgr.wait_until_finished()
        mgr.close()
    else:
        _ASYNC_MANAGERS[os.path.abspath(os.path.expanduser(path))] = mgr
    return path


_ASYNC_MANAGERS: dict = {}


def wait(path: str) -> None:
    """Block until any in-flight async save to `path` is durable."""
    mgr = _ASYNC_MANAGERS.pop(os.path.abspath(os.path.expanduser(path)), None)
    if mgr is not None:
        mgr.wait_until_finished()
        mgr.close()


def restore(path: str, template: TrainState, *, step: Optional[int] = None) -> TrainState:
    """Restore into the structure of `template` (shapes/dtypes must match)."""
    mgr = _manager(path)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    tmpl = template._replace(rng=jax.random.key_data(template.rng))._asdict()
    restored = mgr.restore(step, args=ocp.args.StandardRestore(tmpl))
    mgr.close()
    st = TrainState(**restored)
    return st._replace(rng=jax.random.wrap_key_data(st.rng))
