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
    jax.jit,
    static_argnames=(
        "n_timesteps", "image_size", "raster_points", "traj_encoding",
        "rbf_centers", "augment",  # AugmentConfig is a hashable frozen dc
    ),
)
def featurize_pairs(
    points: jax.Array,
    lengths: jax.Array,
    *,
    n_timesteps: int = 100,
    image_size: int = 28,
    raster_points: Optional[int] = None,
    traj_encoding: str = "resample",
    rbf_centers: int = 100,
    augment=None,
    augment_key=None,
):
    """[B, max_pts, 2] raw strokes → (images [B, size²] in [0,1],
    trajectory features). One fused device program.

    ``augment`` (an `ops.augment.AugmentConfig`) + ``augment_key``: apply
    per-sample random affine transforms to the RAW strokes first, so both
    derived modalities see the same deformed geometry (a consistent
    pair). Augment + resample + rasterize lower into the same program.

    traj_encoding selects the trajectory parameterization (SURVEY.md §2.1
    "Trajectory parameterization"):
      - "resample" (the reference's featurizer): arc-length resample to
        n_timesteps, flatten → [B, 2*n_timesteps] in [-1, 1];
      - "rbf" (the reference ecosystem's pytrajkin-style functional
        variant): the resampled curve's ridge RBF fit → [B, 2*rbf_centers]
        weight vectors (ops/rbf.py). Invert either with
        `PairedDataset.decode_trajectories`.
    """
    if traj_encoding not in ("resample", "rbf"):
        raise ValueError(
            f"traj_encoding must be 'resample' or 'rbf', got {traj_encoding!r}"
        )
    if augment is not None:
        from vae_assoc_tpu.ops.augment import augment_strokes

        if augment_key is None:
            raise ValueError("augment given but augment_key is None")
        points = augment_strokes(points, lengths, augment_key, augment)
    if traj_encoding == "rbf":
        from vae_assoc_tpu.ops.rbf import fit_rbf

        curves = normalize_and_flatten(points, lengths, n_timesteps, flatten=False)
        trajs = fit_rbf(curves, n_centers=rbf_centers)
    else:
        trajs = normalize_and_flatten(points, lengths, n_timesteps)
    # Rasterize from a denser resample so thin fast strokes stay connected.
    rp = raster_points or max(2 * n_timesteps, 128)
    dense = normalize_and_flatten(points, lengths, rp, flatten=False)
    images = rasterize_trajectories(dense, size=image_size)
    return images, trajs


def split_train_val(arrays, val_frac: float, *, seed: int = 0):
    """Deterministic held-out split of aligned per-modality arrays.

    Returns ``(train_arrays, val_arrays, (train_idx, val_idx))`` where the
    index arrays are a seeded permutation of ``range(N)`` — pass them to
    slice anything row-aligned with the features (e.g. ``ds.labels`` for
    the latent-scatter plot). Permuting (rather than slicing the tail)
    matters for ordered sources like UJI files, where the tail would be a
    single writer/character block rather than an i.i.d. sample.

    The split is a pure function of (N, val_frac, seed): a resumed run
    (driver --resume) reconstructs the identical held-out set, so val
    metrics stay comparable across restarts.
    """
    if not 0.0 < val_frac < 1.0:
        raise ValueError(f"val_frac must be in (0, 1), got {val_frac}")
    n = int(arrays[0].shape[0])
    for a in arrays[1:]:
        if int(a.shape[0]) != n:
            raise ValueError(
                "split_train_val needs row-aligned arrays; got leading dims "
                f"{[int(a.shape[0]) for a in arrays]}"
            )
    n_val = int(np.ceil(n * val_frac))
    if not 0 < n_val < n:
        raise ValueError(
            f"val_frac {val_frac} of {n} samples leaves an empty split"
        )
    perm = np.random.default_rng(seed).permutation(n)
    train_idx, val_idx = perm[:-n_val], perm[-n_val:]
    # Gather on device (features usually live in HBM already); the indices
    # return as numpy for host-side label slicing.
    train = [jnp.asarray(a)[train_idx] for a in arrays]
    val = [jnp.asarray(a)[val_idx] for a in arrays]
    return train, val, (train_idx, val_idx)


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
        traj_encoding: str = "resample",
        rbf_centers: int = 100,
    ):
        self.n_timesteps = n_timesteps
        self.image_size = image_size
        self.traj_encoding = traj_encoding
        self.rbf_centers = rbf_centers
        self.labels = labels
        self._points = jax.device_put(jnp.asarray(points, jnp.float32))
        self._lengths = jax.device_put(jnp.asarray(lengths, jnp.int32))
        self._features = None

    @property
    def traj_features(self) -> int:
        """Trajectory feature width under the configured encoding — the
        trajectory modality's arch n_input."""
        if self.traj_encoding == "rbf":
            return 2 * self.rbf_centers
        return 2 * self.n_timesteps

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

    def features(self, *, augment=None, augment_key=None):
        """(images [N, size²], traj features [N, traj_features]) — computed
        on device; the clean (unaugmented) result is cached.

        With ``augment`` (an `ops.augment.AugmentConfig`) + ``augment_key``
        the raw strokes are randomly deformed first and the result is NOT
        cached — each call with a fresh key is a fresh epoch's view of the
        data (`train.loop.train_loop`'s refresh_data hook)."""
        if augment is not None:
            return self._featurize(augment, augment_key)
        if augment_key is not None:
            raise ValueError(
                "augment_key given without augment (an AugmentConfig) — "
                "pass both; a key alone would silently return the cached "
                "clean features"
            )
        if self._features is None:
            self._features = self._featurize(None, None)
        return self._features

    def subset(self, idx) -> "PairedDataset":
        """A new PairedDataset over rows `idx` (same featurization knobs).

        Used by the driver's --augment --val-frac combination: per-epoch
        augmentation re-featurizes ONLY the training rows instead of the
        full set (the val rows would be computed and thrown away)."""
        import numpy as np

        idx = np.asarray(idx)
        sub = PairedDataset(
            np.asarray(self._points)[idx],
            np.asarray(self._lengths)[idx],
            None if self.labels is None else np.asarray(self.labels)[idx],
            n_timesteps=self.n_timesteps,
            image_size=self.image_size,
            traj_encoding=self.traj_encoding,
            rbf_centers=self.rbf_centers,
        )
        return sub

    def _featurize(self, augment, augment_key):
        return featurize_pairs(
            self._points,
            self._lengths,
            n_timesteps=self.n_timesteps,
            image_size=self.image_size,
            traj_encoding=self.traj_encoding,
            rbf_centers=self.rbf_centers,
            augment=augment,
            augment_key=augment_key,
        )

    def decode_trajectories(self, trajs=None):
        """Trajectory features → [N, T, 2] curves (plotting/robot output).

        Inverts whichever encoding produced the features — flattened
        resampled points reshape; RBF weight vectors decode through the
        basis (ops/rbf.rbf_reconstruct). Accepts model *generated*
        features too (the cross-modal img→traj path)."""
        if trajs is None:
            trajs = self.features()[1]
        if self.traj_encoding == "rbf":
            from vae_assoc_tpu.ops.rbf import rbf_reconstruct

            return rbf_reconstruct(jnp.asarray(trajs), self.n_timesteps)
        return unflatten_trajectory(jnp.asarray(trajs))

    def trajectories_2d(self):
        """[N, T, 2] normalized trajectory curves (for plotting/robot)."""
        return self.decode_trajectories()
