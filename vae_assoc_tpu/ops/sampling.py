"""Reparameterization sampler: z = μ + σ·ε, ε ~ N(0, I).

The reference samples ε with TF's stateful `tf.random_normal` inside the
graph (SURVEY.md §3.2). The rebuild uses counter-based `jax.random` keys —
a pure function of (key, shape) — which is the TPU-native equivalent: no
host round-trip, splittable across shard_map data shards, reproducible.
Parity tests inject ε explicitly instead of matching RNG streams
(SURVEY.md §7 "RNG semantics").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_eps(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Draw ε ~ N(0, I)."""
    return jax.random.normal(key, shape, dtype=dtype)


def reparameterize(z_mean, z_logvar, *, key=None, eps=None) -> jax.Array:
    """z = μ + sqrt(exp(logσ²))·ε. Pass either a PRNG ``key`` or explicit ``eps``."""
    if eps is None:
        if key is None:
            raise ValueError("reparameterize needs `key` or `eps`")
        eps = sample_eps(key, z_mean.shape, jnp.result_type(z_mean, jnp.float32))
    sigma = jnp.sqrt(jnp.exp(z_logvar.astype(eps.dtype)))
    return z_mean.astype(eps.dtype) + sigma * eps
