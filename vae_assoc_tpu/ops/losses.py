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


#: Association-term forms (AssocConfig.assoc_form). "mean_l2" is the
#: reference reconstruction's default (SURVEY.md §7 flags the exact form as
#: a medium-confidence [R] claim — mean-L2 vs sampled-z-L2 vs symmetric-KL
#: are the candidate readings, so all three ship as config options; the
#: default keeps the parity surface). "infonce" is the modern CLIP-style
#: contrastive alignment, beyond the reference's candidate set.
ASSOC_FORMS = ("mean_l2", "sample_l2", "sym_kl", "infonce")


def assoc_loss(
    z_means,
    *,
    z_logvars=None,
    zs=None,
    form: str = "mean_l2",
    temp: float = 0.1,
    ordered: bool = False,
) -> jax.Array:
    """Cross-modal latent-association term, shape [batch].

    The coupling that pulls corresponding latent codes together
    (BASELINE.json:5 "cross-modal latent-association term"; SURVEY.md §2.1),
    summed over all modality pairs i<j. Four per-sample forms:

    - ``"mean_l2"`` (default, the parity surface): ‖μ_i − μ_j‖².
    - ``"sample_l2"``: ‖z_i − z_j‖² on the reparameterized samples — the
      stochastic reading; gradients reach σ through the reparam path.
      Requires ``zs`` (per-modality sampled latents).
    - ``"sym_kl"``: Jeffreys divergence KL(p_i‖p_j) + KL(p_j‖p_i) between
      the diagonal-Gaussian posteriors, closed form
      ½ Σ_d [(σ_i² + Δμ²)/σ_j² + (σ_j² + Δμ²)/σ_i² − 2] (the log-variance
      terms cancel in the symmetric sum). Requires ``z_logvars``.
    - ``"infonce"``: CLIP-style symmetric contrastive loss on the
      L2-normalized latent means — per sample b and pair (i,j),
      ½[CE(row b of μ̂_i μ̂_jᵀ/τ) + CE(col b)] with the matched pair as the
      positive and the REST OF THE BATCH as negatives (temperature ``temp``).
      One [B,B] MXU matmul per pair. Batch-relative by construction: under
      shard_map DP each shard contrasts against its LOCAL batch (the
      standard local-negatives regime — docs/PARALLEL.md); the effective
      objective therefore depends on the per-device batch size.

    The L2/KL forms are transcendental-light row reductions; ``ordered=True``
    pins the accumulation order (bit-reproducible vs the numpy oracle — the
    sym_kl exp() terms agree to libm ULP like the KL term, docs/PARITY.md).
    infonce's logsumexp has no reference counterpart to be bitwise against;
    ``ordered`` is ignored there.
    """
    if form not in ASSOC_FORMS:
        raise ValueError(f"unknown assoc_form {form!r}; one of {ASSOC_FORMS}")
    if form == "infonce":
        return _infonce(z_means, temp)
    if form == "sample_l2":
        if zs is None:
            raise ValueError("assoc_form='sample_l2' needs zs (sampled latents)")
        pts = [_f32(z) for z in zs]
    else:
        pts = [_f32(z) for z in z_means]
    if len(pts) < 2:
        return jnp.zeros(pts[0].shape[0], dtype=jnp.float32)
    total = jnp.zeros(pts[0].shape[0], dtype=jnp.float32)
    if form == "sym_kl":
        if z_logvars is None:
            raise ValueError("assoc_form='sym_kl' needs z_logvars")
        lvs = [_f32(v) for v in z_logvars]
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                d2 = jnp.square(pts[i] - pts[j])
                vi, vj = jnp.exp(lvs[i]), jnp.exp(lvs[j])
                term = 0.5 * ((vi + d2) / vj + (vj + d2) / vi - 2.0)
                total = total + _sum(term, ordered=ordered)
        return total
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d = pts[i] - pts[j]
            total = total + _sum(d * d, ordered=ordered)
    return total


def _infonce(z_means, temp: float) -> jax.Array:
    """Per-sample symmetric InfoNCE over all modality pairs, shape [batch].

    Cosine-similarity logits (L2-normalized μ) so the scale is bounded and
    ``temp`` means the same thing at any n_z; fp32 throughout. logsumexp is
    the numerically-stable log-softmax denominator."""
    if temp <= 0:
        raise ValueError(f"infonce temperature must be > 0, got {temp}")
    zs = [_f32(z) for z in z_means]
    b = zs[0].shape[0]
    if len(zs) < 2:
        return jnp.zeros(b, dtype=jnp.float32)
    inv_t = jnp.float32(1.0 / temp)
    normed = [
        z * jax.lax.rsqrt(jnp.sum(z * z, axis=-1, keepdims=True) + 1e-12)
        for z in zs
    ]
    total = jnp.zeros(b, dtype=jnp.float32)
    for i in range(len(zs)):
        for j in range(i + 1, len(zs)):
            logits = (normed[i] @ normed[j].T) * inv_t  # [B, B]
            pos = jnp.diagonal(logits)
            ce_row = jax.nn.logsumexp(logits, axis=1) - pos
            ce_col = jax.nn.logsumexp(logits, axis=0) - pos
            total = total + 0.5 * (ce_row + ce_col)
    return total
