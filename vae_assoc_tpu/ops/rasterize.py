"""Device-side stroke rasterization: trajectory → 28×28 normalized image.

The reference rasterizes pen trajectories to 28×28 grayscale on the host
(numpy + blur) during offline data prep (SURVEY.md §3.4). Here the same
transform is a jittable device function so the whole image branch of the
input pipeline can run on TPU: bilinear point splatting via scatter-add,
a small separable Gaussian blur (two 1-D convolutions — XLA fuses these
fine; there is no hot-loop need for a custom kernel), and max-normalization
to [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("size", "sigma"))
def rasterize_trajectories(
    traj: jax.Array, size: int = 28, sigma: float = 0.7
) -> jax.Array:
    """[B, T, 2] trajectories in [-1, 1]² → [B, size*size] images in [0, 1].

    Points are splatted bilinearly onto the grid (each point contributes to
    its 4 neighboring pixels), blurred with a separable Gaussian, and
    normalized per image by max. y is drawn downward (row 0 = top), matching
    image convention.
    """
    b, t, _ = traj.shape
    # [-1,1] → pixel coordinates with a 1.5px margin.
    margin = 1.5
    scale = (size - 1 - 2 * margin) / 2.0
    px = margin + (traj[..., 0] + 1.0) * scale  # [B, T]
    py = margin + (1.0 - traj[..., 1]) * scale  # flip y for image rows

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0
    fy = py - y0

    img = jnp.zeros((b, size, size), jnp.float32)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))
    for dy, dx, w in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        yy = jnp.clip(y0 + dy, 0, size - 1)
        xx = jnp.clip(x0 + dx, 0, size - 1)
        img = img.at[batch_idx, yy, xx].add(w)

    # Separable Gaussian blur: two rank-1 matmuls (size×size), MXU-friendly.
    radius = max(1, int(3 * sigma))
    k = _gaussian_kernel1d(sigma, radius)
    blur_mat = jnp.zeros((size, size), jnp.float32)
    rows = jnp.arange(size)
    for i, off in enumerate(range(-radius, radius + 1)):
        cols = jnp.clip(rows + off, 0, size - 1)
        blur_mat = blur_mat.at[rows, cols].add(k[i])
    img = jnp.einsum("brc,rk->bkc", img, blur_mat.T)
    img = jnp.einsum("brc,ck->brk", img, blur_mat.T)

    peak = jnp.max(img, axis=(1, 2), keepdims=True)
    img = jnp.clip(img / jnp.maximum(peak, 1e-6), 0.0, 1.0)
    return img.reshape(b, size * size)
