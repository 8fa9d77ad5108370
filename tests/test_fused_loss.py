"""Fused joint-loss kernel and on-device RNG reparameterization parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.kernels.loss import joint_loss_terms_fused
from vae_assoc_tpu.kernels.sampling import reparameterize_fused
from vae_assoc_tpu.ops import losses

KINDS = ("bernoulli", "gaussian")


def _data(rng, b=32, d=24, nz=6):
    xs = (
        jnp.asarray(rng.uniform(0, 1, (b, d)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
    )
    recons = tuple(jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)) for _ in range(2))
    mus = tuple(jnp.asarray(rng.normal(size=(b, nz)).astype(np.float32)) for _ in range(2))
    lvs = tuple(jnp.asarray(rng.normal(size=(b, nz)).astype(np.float32) * 0.3) for _ in range(2))
    return xs, recons, mus, lvs


def _reference_terms(xs, recons, mus, lvs):
    cols = [
        losses.bernoulli_recon(xs[0], logits=recons[0]),
        losses.gaussian_recon(xs[1], recons[1]),
        losses.kl_divergence(mus[0], lvs[0]),
        losses.kl_divergence(mus[1], lvs[1]),
        losses.assoc_loss(list(mus)),
    ]
    return jnp.stack(cols, axis=-1)


def test_fused_loss_forward_parity(rng):
    xs, recons, mus, lvs = _data(rng)
    got = joint_loss_terms_fused(KINDS, xs, recons, mus, lvs)
    ref = _reference_terms(xs, recons, mus, lvs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_loss_grad_parity(rng):
    xs, recons, mus, lvs = _data(rng)
    w = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))  # random term mix

    def total_fused(recons, mus, lvs):
        t = joint_loss_terms_fused(KINDS, xs, recons, mus, lvs)
        return jnp.mean(t @ w)

    def total_ref(recons, mus, lvs):
        return jnp.mean(_reference_terms(xs, recons, mus, lvs) @ w)

    g_f = jax.grad(total_fused, argnums=(0, 1, 2))(recons, mus, lvs)
    g_r = jax.grad(total_ref, argnums=(0, 1, 2))(recons, mus, lvs)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_fused_loss_input_grad_parity(rng):
    """d loss / d x (the targets) must be the true closed-form gradient, not
    silently zero — input-optimization / adversarial-input uses differentiate
    through the targets."""
    xs, recons, mus, lvs = _data(rng)

    def total_fused(xs):
        return jnp.mean(jnp.sum(joint_loss_terms_fused(KINDS, xs, recons, mus, lvs), -1))

    def total_ref(xs):
        return jnp.mean(jnp.sum(_reference_terms(xs, recons, mus, lvs), -1))

    g_f = jax.grad(total_fused)(xs)
    g_r = jax.grad(total_ref)(xs)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        assert float(jnp.max(jnp.abs(b))) > 0  # the reference grad is nonzero
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_fused_loss_ragged_batch(rng):
    """Prime batch size → ceil-div grid with a ragged last tile."""
    xs, recons, mus, lvs = _data(rng, b=37)
    got = joint_loss_terms_fused(KINDS, xs, recons, mus, lvs)
    ref = _reference_terms(xs, recons, mus, lvs)
    assert got.shape == (37, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_loss_without_assoc_column(rng):
    """with_assoc=False returns [B, 2K] (no dead mean-L2 column — round-3
    ADVICE finding) with identical recon/kl values AND gradients."""
    xs, recons, mus, lvs = _data(rng, b=37)  # ragged tile too
    got = joint_loss_terms_fused(KINDS, xs, recons, mus, lvs, with_assoc=False)
    ref = _reference_terms(xs, recons, mus, lvs)
    assert got.shape == (37, 4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref[:, :4]), rtol=1e-5, atol=1e-5
    )

    w = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    def total_fused(recons, mus, lvs):
        t = joint_loss_terms_fused(KINDS, xs, recons, mus, lvs, with_assoc=False)
        return jnp.mean(t @ w)

    def total_ref(recons, mus, lvs):
        return jnp.mean(_reference_terms(xs, recons, mus, lvs)[:, :4] @ w)

    g_f = jax.grad(total_fused, argnums=(0, 1, 2))(recons, mus, lvs)
    g_r = jax.grad(total_ref, argnums=(0, 1, 2))(recons, mus, lvs)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_fused_loss_in_assoc_matches_jnp_path(rng):
    """assoc_loss_fn(use_pallas=True) == use_pallas=False with same ε."""
    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig
    from vae_assoc_tpu.models import assoc as assoc_mod

    arch = dict(
        n_input=24, n_z=6, n_hidden_recog_1=16, n_hidden_recog_2=16,
        n_hidden_gener_1=16, n_hidden_gener_2=16,
    )
    cfg = AssocConfig(
        [
            ModalityConfig("image", arch, recon="bernoulli"),
            ModalityConfig("trajectory", arch, recon="gaussian"),
        ],
        assoc_lambda=0.7,
    )
    params = assoc_mod.init_assoc(jax.random.key(0), cfg)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 24)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32)),
    ]
    eps = [jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32)) for _ in range(2)]
    t_ref, m_ref = assoc_mod.assoc_loss_fn(params, xs, cfg, eps=eps)
    t_fused, m_fused = assoc_mod.assoc_loss_fn(params, xs, cfg, eps=eps, use_pallas=True)
    np.testing.assert_allclose(float(t_fused), float(t_ref), rtol=2e-5)
    for k in m_ref:
        np.testing.assert_allclose(float(m_fused[k]), float(m_ref[k]), rtol=2e-5, atol=1e-6)


def test_reparam_fused_statistics_and_determinism():
    mu = jnp.full((512, 64), 2.0, jnp.float32)
    lv = jnp.full((512, 64), jnp.log(0.25), jnp.float32)  # σ = 0.5
    key = jax.random.key(7)
    z1 = reparameterize_fused(mu, lv, key)
    z2 = reparameterize_fused(mu, lv, key)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))  # deterministic
    z = np.asarray(z1)
    assert abs(z.mean() - 2.0) < 0.01, z.mean()
    assert abs(z.std() - 0.5) < 0.01, z.std()
    z3 = np.asarray(reparameterize_fused(mu, lv, jax.random.key(8)))
    assert np.abs(z3 - z).max() > 1e-3  # different key → different stream


def test_reparam_fused_grads():
    mu = jnp.ones((8, 4), jnp.float32)
    lv = jnp.zeros((8, 4), jnp.float32)
    key = jax.random.key(0)

    def f(mu, lv):
        return jnp.sum(reparameterize_fused(mu, lv, key) ** 2)

    gmu, glv = jax.grad(f, argnums=(0, 1))(mu, lv)
    z = reparameterize_fused(mu, lv, key)
    # dz/dμ = 1 ⇒ gμ = 2z; dz/dlv = ½(z − μ) ⇒ glv = 2z·½(z−μ) = z(z−μ)
    np.testing.assert_allclose(np.asarray(gmu), np.asarray(2 * z), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(glv), np.asarray(z * (z - mu)), rtol=1e-5, atol=1e-6
    )
