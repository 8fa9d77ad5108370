"""Device-side paired input pipeline.

Replaces the reference's offline numpy prep + per-batch `feed_dict` copies
(SURVEY.md §1.1 L1, §3.4): raw padded stroke sequences go to device
*once*, and one jitted function derives both modality feature sets in HBM —

  trajectory branch: arc-length resample → center/scale → flatten
  image branch:      resample → rasterize 28×28 → blur → normalize [0,1]

so every (image, trajectory) pair is produced by construction from the
same raw character — the pairing the association loss trains on.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vae_assoc_tpu.ops.rasterize import rasterize_trajectories
from vae_assoc_tpu.ops.resample import normalize_and_flatten, unflatten_trajectory


@functools.partial(
    jax.jit, static_argnames=("n_timesteps", "image_size", "raster_points")
)
def featurize_pairs(
    points: jax.Array,
    lengths: jax.Array,
    *,
    n_timesteps: int = 100,
    image_size: int = 28,
    raster_points: Optional[int] = None,
):
    """[B, max_pts, 2] raw strokes → (images [B, size²] in [0,1],
    trajs [B, 2*n_timesteps] in [-1,1]). One fused device program."""
    trajs = normalize_and_flatten(points, lengths, n_timesteps)
    # Rasterize from a denser resample so thin fast strokes stay connected.
    rp = raster_points or max(2 * n_timesteps, 128)
    dense = normalize_and_flatten(points, lengths, rp, flatten=False)
    images = rasterize_trajectories(dense, size=image_size)
    return images, trajs


class PairedDataset:
    """Host-side container staging raw strokes to device and featurizing once.

    Usage:
        ds = PairedDataset.from_synthetic(2000)
        imgs, trajs = ds.features()        # device arrays, ready for train_loop
    """

    def __init__(
        self,
        points: np.ndarray,
        lengths: np.ndarray,
        labels: Optional[np.ndarray] = None,
        *,
        n_timesteps: int = 100,
        image_size: int = 28,
    ):
        self.n_timesteps = n_timesteps
        self.image_size = image_size
        self.labels = labels
        self._points = jax.device_put(jnp.asarray(points, jnp.float32))
        self._lengths = jax.device_put(jnp.asarray(lengths, jnp.int32))
        self._features = None

    @classmethod
    def from_synthetic(cls, n_samples: int, *, seed: int = 0, **kw):
        from vae_assoc_tpu.data.synthetic import generate_raw_strokes

        raw = generate_raw_strokes(n_samples, seed=seed)
        return cls(raw["points"], raw["lengths"], raw["labels"], **kw)

    @classmethod
    def from_uji(cls, paths, *, charset=None, max_points: int = 256, **kw):
        from vae_assoc_tpu.data.uji import load_uji_files

        raw = load_uji_files(paths, charset=charset, max_points=max_points)
        return cls(raw["points"], raw["lengths"], raw["labels"], **kw)

    def __len__(self):
        return int(self._points.shape[0])

    def features(self):
        """(images [N, size²], trajs [N, 2T]) — computed on device, cached."""
        if self._features is None:
            self._features = featurize_pairs(
                self._points,
                self._lengths,
                n_timesteps=self.n_timesteps,
                image_size=self.image_size,
            )
        return self._features

    def trajectories_2d(self):
        """[N, T, 2] unflattened normalized trajectories (for plotting/robot)."""
        _, trajs = self.features()
        return unflatten_trajectory(trajs)
