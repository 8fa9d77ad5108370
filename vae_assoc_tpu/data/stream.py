"""Streaming host→device input: double-buffered prefetch for big datasets.

`PairedDataset` stages everything into HBM once — right for UJI-scale
data. For corpora larger than device memory, `prefetch_batches` streams:
while the device computes on batch i, batch i+1's host slice is already
in flight (JAX's async dispatch makes `device_put` non-blocking, so a
one-deep queue gives copy/compute overlap without threads). Shapes are
static (fixed batch size, remainder dropped like the reference's
minibatcher), so every step hits the compiled train step.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import jax
import numpy as np


def prefetch_batches(
    data: Sequence[np.ndarray],
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    epochs: int = 1,
    device: Optional[jax.Device] = None,
    prefetch: int = 2,
) -> Iterator[tuple]:
    """Yield tuples of per-modality device batches, `prefetch` deep.

    Args:
      data: K paired host arrays [N, D_k] (memory-mapped arrays work too —
        rows are sliced lazily per batch).
      prefetch: how many batches to keep in flight ahead of the consumer.
    """
    n = data[0].shape[0]
    for k, d in enumerate(data):
        if d.shape[0] != n:
            raise ValueError(f"modality {k} has {d.shape[0]} rows, expected {n}")
    nb = n // batch_size
    if nb == 0:
        raise ValueError(f"batch_size {batch_size} > dataset size {n}")
    rng = np.random.default_rng(seed)

    def put(sel):
        return tuple(jax.device_put(d[sel], device) for d in data)

    queue = []
    for _ in range(epochs):
        order = rng.permutation(n) if shuffle else np.arange(n)
        for b in range(nb):
            sel = order[b * batch_size : (b + 1) * batch_size]
            queue.append(put(sel))  # async: transfer overlaps compute
            if len(queue) > prefetch:
                yield queue.pop(0)
    while queue:
        yield queue.pop(0)


def stream_train(step_fn, state, data, batch_size, *, epochs=1, seed=0,
                 shuffle=True, prefetch=2):
    """Drive a train step from the prefetch stream; returns (state, metrics list)."""
    history = []
    for xs in prefetch_batches(
        data, batch_size, shuffle=shuffle, seed=seed, epochs=epochs,
        prefetch=prefetch,
    ):
        state, metrics = step_fn(state, list(xs))
        history.append(metrics)
    return state, jax.device_get(history)
