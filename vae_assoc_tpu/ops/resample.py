"""Device-side arc-length trajectory resampling.

The reference resamples each raw variable-length pen-stroke sequence to a
fixed length on the host with numpy before pickling (SURVEY.md §3.4). The
TPU-native rebuild runs the same math *inside* the input pipeline on
device ("resamples/flattens trajectories directly into HBM",
BASELINE.json:5): variable-length inputs are length-padded + masked to a
static shape, and resampling is a fully vectorized
cumsum / searchsorted / gather / lerp — no data-dependent shapes, so it
jits, vmaps, and shards.

This is also the framework's only "sequence-length scaling" mechanism —
the model itself has no sequence axis (SURVEY.md §5 "Long-context": N/A
by design; scaling happens here at the pipeline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _masked_points(points, length):
    """Clamp padding to the last valid point so padded segments have length 0."""
    n = points.shape[0]
    idx = jnp.minimum(jnp.arange(n), length - 1)
    return jnp.take(points, idx, axis=0)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def arc_length_resample(points: jax.Array, length: jax.Array, num_samples: int):
    """Resample one padded polyline to `num_samples` points uniform in arc length.

    Args:
      points: [max_pts, D] float — raw polyline, padded past `length`.
      length: [] int — number of valid points (>= 1).
      num_samples: static output length T.

    Returns [num_samples, D] float32. Degenerate inputs (length == 1 or zero
    total arc length) collapse to a constant polyline at the first point.
    """
    pts = _masked_points(points.astype(jnp.float32), length)
    seg = pts[1:] - pts[:-1]
    seg_len = jnp.sqrt(jnp.sum(seg * seg, axis=-1))
    cum = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(seg_len)])
    total = cum[-1]
    # Targets uniform in [0, total]; guard zero-length paths.
    t = jnp.linspace(0.0, 1.0, num_samples) * jnp.maximum(total, 1e-12)
    # Segment index for each target: rightmost i with cum[i] <= t.
    idx = jnp.clip(jnp.searchsorted(cum, t, side="right") - 1, 0, pts.shape[0] - 2)
    d0 = jnp.take(cum, idx)
    sl = jnp.take(seg_len, idx)
    frac = jnp.where(sl > 0, (t - d0) / jnp.maximum(sl, 1e-12), 0.0)
    p0 = jnp.take(pts, idx, axis=0)
    p1 = jnp.take(pts, idx + 1, axis=0)
    return p0 + frac[:, None] * (p1 - p0)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def batch_resample(points: jax.Array, lengths: jax.Array, num_samples: int):
    """[B, max_pts, D] + [B] lengths → [B, num_samples, D] (vmapped)."""
    return jax.vmap(lambda p, l: arc_length_resample(p, l, num_samples))(
        points, lengths
    )


@functools.partial(jax.jit, static_argnames=("num_samples", "flatten"))
def normalize_and_flatten(
    points: jax.Array,
    lengths: jax.Array,
    num_samples: int,
    *,
    flatten: bool = True,
):
    """Full device-side trajectory featurization: resample → center/scale → flatten.

    Each resampled trajectory is centered on its bounding-box midpoint and
    isotropically scaled so the larger box side spans [-1, 1] (aspect
    preserved) — the reference's center/scale normalization (SURVEY.md §3.4).

    Returns [B, num_samples*D] (x0, y0, x1, y1, ...) if `flatten` else
    [B, num_samples, D].
    """
    traj = batch_resample(points, lengths, num_samples)  # [B, T, D]
    lo = jnp.min(traj, axis=1, keepdims=True)
    hi = jnp.max(traj, axis=1, keepdims=True)
    center = 0.5 * (lo + hi)
    half_span = jnp.max(hi - lo, axis=-1, keepdims=True) * 0.5  # [B, 1, 1]
    traj = (traj - center) / jnp.maximum(half_span, 1e-6)
    if flatten:
        return traj.reshape(traj.shape[0], -1)
    return traj


def validate_strokes(points: jax.Array, lengths: jax.Array):
    """checkify-based input sanitizer for the resampler's gather indices.

    Pure-functional JAX has no data races to detect (SURVEY.md §5 "Race
    detection"); the failure mode that remains is out-of-contract input —
    lengths outside [1, max_pts] would make `_masked_points`' clamped
    gathers silently wrong, and NaN points poison the arc-length cumsum.
    Run under `jax.experimental.checkify.checkify`:

        err, _ = checkify.checkify(validate_strokes)(points, lengths)
        err.throw()
    """
    from jax.experimental import checkify

    max_pts = points.shape[-2]
    checkify.check(jnp.all(lengths >= 1), "stroke lengths must be >= 1")
    checkify.check(
        jnp.all(lengths <= max_pts),
        "stroke lengths exceed the padded point capacity {m}",
        m=jnp.int32(max_pts),
    )
    valid = jnp.arange(max_pts)[None, :, None] < lengths[:, None, None]
    checkify.check(
        jnp.all(jnp.where(valid, jnp.isfinite(points), True)),
        "non-finite coordinates inside valid stroke region",
    )
    return True


def unflatten_trajectory(flat: jax.Array, n_dims: int = 2):
    """[B, T*D] → [B, T, D]: invert the pipeline's flattening for plotting/robot."""
    b = flat.shape[0]
    return flat.reshape(b, -1, n_dims)
