"""Device-side stroke augmentation for the input pipeline.

The reference trained on the fixed featurized arrays (SURVEY.md §3.4) —
no augmentation anywhere. This module adds the TPU-native equivalent of
a host-side augmentation stage: per-sample random affine transforms
applied to the RAW stroke points (one fused jitted program), so BOTH
derived modalities — the rasterized image and the resampled/RBF
trajectory features — see the same geometry and stay a consistent pair.

Transform family: the downstream normalizer (`ops/resample.
normalize_and_flatten`) centers each curve and isotropically rescales it,
so translation and uniform scale are normalized away — the augmentations
that actually reach the model are:

- rotation            θ ~ U(−max_rotate°, +max_rotate°)
- shear (x by y)      s ~ U(−max_shear, +max_shear)
- anisotropic scale   a ~ U(1−max_scale, 1+max_scale) on x relative to y
  (aspect-ratio jitter; a uniform factor would cancel)
- point jitter        ε ~ N(0, (point_jitter · extent)²) per point,
  relative to each sample's bounding-box extent so raw UJI tablet
  coordinates (≈10³ units) and synthetic unit-box strokes jitter
  comparably.

All transforms are linear maps of the point array; padded rows beyond
`lengths` are transformed too, harmlessly — every consumer masks by
length (`ops/resample.batch_resample`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Knobs for `augment_strokes` (hashable — cacheable in jit closures).

    Defaults are mild, handwriting-plausible deformations; set a field to
    0 to disable that transform. `max_rotate` is in DEGREES.
    """

    max_rotate: float = 15.0
    max_shear: float = 0.15
    max_scale: float = 0.15
    point_jitter: float = 0.01

    def __post_init__(self):
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v < 0:
                raise ValueError(f"{f.name} must be >= 0, got {v}")
        if not self.max_scale < 1.0:
            raise ValueError(
                f"max_scale must be < 1 (scale factor 1±max), got {self.max_scale}"
            )


def augment_strokes(
    points: jax.Array,
    lengths: jax.Array,
    key: jax.Array,
    cfg: AugmentConfig = AugmentConfig(),
) -> jax.Array:
    """[B, P, 2] raw strokes → randomly transformed [B, P, 2].

    Deterministic in `key`; per-sample independent draws. Composes under
    jit (pure function) — `data.pipeline.featurize_pairs` calls it when
    given an augment key, so augment+resample+rasterize lower into ONE
    device program.
    """
    b = points.shape[0]
    k_rot, k_shear, k_scale, k_jit = jax.random.split(key, 4)
    pts = points.astype(jnp.float32)

    theta = jnp.deg2rad(cfg.max_rotate) * jax.random.uniform(
        k_rot, (b,), minval=-1.0, maxval=1.0
    )
    shear = cfg.max_shear * jax.random.uniform(
        k_shear, (b,), minval=-1.0, maxval=1.0
    )
    scale = 1.0 + cfg.max_scale * jax.random.uniform(
        k_scale, (b,), minval=-1.0, maxval=1.0
    )
    c, s = jnp.cos(theta), jnp.sin(theta)
    one = jnp.ones_like(theta)
    zero = jnp.zeros_like(theta)
    # A = R(θ) @ Shear(s) @ Scale(a, 1), row-vector convention p' = p @ Aᵀ.
    rot = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2
    )  # [B, 2, 2]
    sh = jnp.stack(
        [jnp.stack([one, shear], -1), jnp.stack([zero, one], -1)], -2
    )
    sc = jnp.stack(
        [jnp.stack([scale, zero], -1), jnp.stack([zero, one], -1)], -2
    )
    a = rot @ sh @ sc  # [B, 2, 2]
    out = jnp.einsum("bpd,bed->bpe", pts, a)

    if cfg.point_jitter > 0:
        # Jitter relative to each sample's VALID-point bounding-box extent
        # (raw tablet coords are ~10³ units; synthetic strokes ~1).
        p = pts.shape[1]
        mask = (jnp.arange(p)[None, :] < lengths[:, None])[..., None]
        big = jnp.float32(1e30)
        lo = jnp.min(jnp.where(mask, pts, big), axis=1, keepdims=True)
        hi = jnp.max(jnp.where(mask, pts, -big), axis=1, keepdims=True)
        extent = jnp.maximum(jnp.max(hi - lo, axis=-1, keepdims=True), 1e-6)
        noise = jax.random.normal(k_jit, out.shape, jnp.float32)
        out = out + cfg.point_jitter * extent * noise
    return out
