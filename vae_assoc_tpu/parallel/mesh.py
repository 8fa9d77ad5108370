"""Device-mesh construction and batch-sharding utilities.

The reference is single-process/single-device TensorFlow with no
communication layer at all (SURVEY.md §2.2); the TPU-native equivalent of a
comm backend is XLA's built-in collectives over ICI, driven by shardings on
a `jax.sharding.Mesh`. This module owns mesh construction so that scaling
from one chip to a v5e-8 slice — or to a multi-host DCN×ICI 2-level mesh —
is a config change, not a redesign (SURVEY.md §5 "Distributed communication
backend").

Only the 1-D data axis is exercised by the models (tiny MLPs need no tensor
parallelism — SURVEY.md §2.2 rows TP/PP/SP/EP are N/A-by-design), but
`make_mesh` accepts a `model_axis` so pjit sharding rules *could* split
hidden dims without touching callers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    data_axis: str = DATA_AXIS,
    model_axis: Optional[str] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 1-D data mesh (default) or a 2-D (data, model) mesh.

    Args:
      n_devices: use the first N available devices (default: all).
      model_axis / model_parallel: optional second mesh axis — a hook for
        tensor-parallel shardings; DP uses `model_parallel=1`.
      devices: explicit device list (overrides n_devices).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"requested {n_devices} devices, only {len(devices)} available"
                )
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    if model_axis is None:
        return Mesh(devices, (data_axis,))
    if devices.size % model_parallel:
        raise ValueError(
            f"{devices.size} devices not divisible by model_parallel={model_parallel}"
        )
    grid = devices.reshape(devices.size // model_parallel, model_parallel)
    return Mesh(grid, (data_axis, model_axis))


def make_multihost_mesh(
    *, dcn_axis: str = "replica", data_axis: str = DATA_AXIS
) -> Mesh:
    """2-level DCN×ICI mesh for multi-host pods (SURVEY.md §5 "Distributed
    communication backend": multi-host is a config change, not a redesign).

    Call `jax.distributed.initialize()` first on real multi-host pods; the
    outer axis then spans hosts (gradient sync over DCN) and the inner axis
    spans each host's chips (sync over ICI). On a single process this
    degenerates to a (1, n_local) mesh, so the same code path is testable
    anywhere. Pass ``batch_axes=(dcn_axis, data_axis)`` to
    `make_dp_train_step` so the batch shards over both levels.
    """
    devices = np.asarray(jax.devices())
    n_proc = jax.process_count()
    return Mesh(devices.reshape(n_proc, -1), (dcn_axis, data_axis))


def batch_spec(mesh: Mesh, *, leading_scan_axis: bool = False, batch_axes=None) -> P:
    """PartitionSpec sharding the batch dim of [B, D] (or [N, B, D]) arrays.

    batch_axes: mesh axis name(s) the batch dim shards over — defaults to
    the first mesh axis; pass a tuple to span a multi-level mesh.
    """
    axes = batch_axes if batch_axes is not None else mesh.axis_names[0]
    return P(None, axes) if leading_scan_axis else P(axes)


def shard_batch(mesh: Mesh, arrays, *, leading_scan_axis: bool = False, batch_axes=None):
    """Place per-modality batch arrays onto the mesh, batch-dim sharded.

    Produces committed global arrays so the jitted DP step consumes them
    without any implicit resharding transfer.
    """
    spec = batch_spec(mesh, leading_scan_axis=leading_scan_axis, batch_axes=batch_axes)
    sharding = NamedSharding(mesh, spec)
    return tuple(jax.device_put(a, sharding) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. TrainState) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
