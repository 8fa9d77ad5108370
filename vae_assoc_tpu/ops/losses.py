"""Loss terms of the associative VAE objective.

Joint objective (BASELINE.json:5; SURVEY.md §3.2):

    cost = Σ_k mean_batch[ recon_k + KL_k ] + λ · Σ_{i<j} mean_batch ‖μ_i − μ_j‖²

per-sample terms (sums over feature/latent dims, matching the reference's
`reduce_sum(..., 1)` convention):

    recon_bernoulli = −Σ_d [ x log(x̂ + ε) + (1−x) log(1−x̂ + ε) ],  ε = 1e-10
    recon_gaussian  = Σ_d (x − x̂)²          (linear decoder output)
    KL              = −½ Σ_z (1 + logσ² − μ² − σ²)

Two formulations of the Bernoulli term are provided:

- ``parity_mode=True``: the reference's exact math — sigmoid probabilities,
  ε-clamped logs — for fp32-CPU bitwise comparability with the oracle
  (BASELINE.json:5 "bitwise-comparable losses at fp32 on CPU").
- ``parity_mode=False`` (default): numerically-stable logit-space
  cross-entropy, `max(l,0) − l·x + log1p(exp(−|l|))`. Same function up to
  the ε clamp; preferred on TPU (no catastrophic cancellation in bf16/fp32
  and one fewer transcendental).

All reductions accumulate in fp32 regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-10  # reference's log-clamp epsilon


def _f32(x):
    return x.astype(jnp.float32)


def bernoulli_recon(
    x, *, logits=None, probs=None, parity_mode: bool = False
) -> jax.Array:
    """Per-sample Bernoulli reconstruction loss, summed over features.

    Pass ``logits`` (pre-sigmoid decoder output, preferred) or ``probs``.
    Returns shape ``[batch]`` fp32.
    """
    x = _f32(x)
    if parity_mode or logits is None:
        if probs is None:
            probs = jax.nn.sigmoid(_f32(logits))
        probs = _f32(probs)
        ll = x * jnp.log(_EPS + probs) + (1.0 - x) * jnp.log(_EPS + 1.0 - probs)
        return -jnp.sum(ll, axis=-1)
    l = _f32(logits)
    # Stable sigmoid cross-entropy from logits.
    ce = jnp.maximum(l, 0.0) - l * x + jnp.log1p(jnp.exp(-jnp.abs(l)))
    return jnp.sum(ce, axis=-1)


def gaussian_recon(x, x_recon) -> jax.Array:
    """Per-sample squared-error reconstruction (linear decoder), shape [batch]."""
    d = _f32(x) - _f32(x_recon)
    return jnp.sum(d * d, axis=-1)


def kl_divergence(z_mean, z_logvar) -> jax.Array:
    """Per-sample KL(N(μ, σ²) ‖ N(0, I)), summed over latent dims, shape [batch]."""
    mu = _f32(z_mean)
    lv = _f32(z_logvar)
    return -0.5 * jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv), axis=-1)


def assoc_loss(z_means) -> jax.Array:
    """Cross-modal latent-association term, shape [batch].

    Per-sample Σ_{i<j} ‖μ_i − μ_j‖² over all modality pairs — the coupling
    that pulls corresponding latent codes together (BASELINE.json:5
    "cross-modal latent-association term"; SURVEY.md §2.1).
    """
    zs = [_f32(z) for z in z_means]
    if len(zs) < 2:
        return jnp.zeros(zs[0].shape[0], dtype=jnp.float32)
    total = jnp.zeros(zs[0].shape[0], dtype=jnp.float32)
    for i in range(len(zs)):
        for j in range(i + 1, len(zs)):
            d = zs[i] - zs[j]
            total = total + jnp.sum(d * d, axis=-1)
    return total
