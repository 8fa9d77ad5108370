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

**Pinned reduction order (`ordered=True`, implied by parity mode).** XLA's
`jnp.sum`/`jnp.mean` reduce in an unspecified tree order, so their bits
differ from numpy's pairwise reduction. `ordered_sum`/`ordered_mean` fix a
strict left-to-right order via a loop-carried `lax.scan`, which XLA cannot
reassociate; the numpy oracle pins the identical order with `np.cumsum`.
This makes every reduction skeleton — and the transcendental-free loss
terms (Gaussian recon, association) — **bit-identical** between the JAX
fp32 CPU path and the oracle. Terms containing transcendentals (Bernoulli
log, KL exp) agree to a few ULP, bounded by libm-vs-XLA elementwise
differences, not by reduction order; the measured per-primitive gaps live
in docs/PARITY.md (probe: scripts/bitwise_probe.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-10  # reference's log-clamp epsilon


def _f32(x):
    return x.astype(jnp.float32)


def ordered_sum(x, axis: int = -1) -> jax.Array:
    """Sum with a pinned strict left-to-right accumulation order.

    A loop-carried `lax.scan` chain: XLA must preserve float-add order
    across loop iterations, unlike `jnp.sum`'s unspecified reduction tree.
    Matches `np.cumsum(x, axis)[..., -1]` (sequential by definition) bit
    for bit at fp32 — verified in tests/test_bitwise_parity.py.
    """
    x = jnp.moveaxis(_f32(x), axis, 0)
    if x.shape[0] == 1:
        return x[0]

    def step(acc, v):
        return acc + v, None

    out, _ = jax.lax.scan(step, x[0], x[1:])
    return out


def ordered_mean(x, axis: int = -1) -> jax.Array:
    """`ordered_sum` times the precomputed fp32 reciprocal of the length.

    Reciprocal-multiply, not division: XLA's algebraic simplifier rewrites
    fp32 divide-by-constant into multiply-by-reciprocal (measured: 1 ULP off
    true division for non-power-of-two n), so pinning the multiply on both
    sides is what makes the mean bit-reproducible vs the numpy oracle."""
    return ordered_sum(x, axis) * jnp.float32(1.0 / x.shape[axis])


def _sum(x, *, ordered: bool, axis: int = -1):
    return ordered_sum(x, axis) if ordered else jnp.sum(x, axis=axis)


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
        return -_sum(ll, ordered=parity_mode)
    l = _f32(logits)
    # Stable sigmoid cross-entropy from logits.
    ce = jnp.maximum(l, 0.0) - l * x + jnp.log1p(jnp.exp(-jnp.abs(l)))
    return jnp.sum(ce, axis=-1)


def gaussian_recon(x, x_recon, *, ordered: bool = False) -> jax.Array:
    """Per-sample squared-error reconstruction (linear decoder), shape [batch].

    Transcendental-free, so with ``ordered=True`` it is bit-identical to the
    numpy oracle at fp32 on CPU."""
    d = _f32(x) - _f32(x_recon)
    return _sum(d * d, ordered=ordered)


def kl_divergence(z_mean, z_logvar, *, ordered: bool = False) -> jax.Array:
    """Per-sample KL(N(μ, σ²) ‖ N(0, I)), summed over latent dims, shape [batch]."""
    mu = _f32(z_mean)
    lv = _f32(z_logvar)
    return -0.5 * _sum(1.0 + lv - mu * mu - jnp.exp(lv), ordered=ordered)


def assoc_loss(z_means, *, ordered: bool = False) -> jax.Array:
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
            total = total + _sum(d * d, ordered=ordered)
    return total
