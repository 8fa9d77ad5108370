"""Golden-value unit tests per loss term vs the numpy oracle (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

import oracle_np as oracle
from vae_assoc_tpu.ops import losses, sampling


def test_bernoulli_recon_parity(rng):
    x = (rng.random((16, 784)) > 0.5).astype(np.float32)
    logits = rng.normal(size=(16, 784)).astype(np.float32) * 3
    probs = oracle.sigmoid(logits)
    want = oracle.bernoulli_recon(x, probs)
    got = losses.bernoulli_recon(jnp.array(x), logits=jnp.array(logits), parity_mode=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-4)


def test_bernoulli_stable_matches_parity(rng):
    """Stable logit-space CE == eps-clamped formulation away from saturation."""
    x = rng.random((8, 100)).astype(np.float32)
    logits = rng.normal(size=(8, 100)).astype(np.float32) * 2
    a = losses.bernoulli_recon(jnp.array(x), logits=jnp.array(logits), parity_mode=True)
    b = losses.bernoulli_recon(jnp.array(x), logits=jnp.array(logits), parity_mode=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)


def test_bernoulli_stable_no_overflow():
    """Stable mode must be finite at extreme logits (parity mode saturates fine too)."""
    x = jnp.array([[0.0, 1.0]])
    logits = jnp.array([[80.0, -80.0]])
    out = losses.bernoulli_recon(x, logits=logits, parity_mode=False)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out[0]) > 100.0  # heavily penalized wrong saturation


def test_gaussian_recon_parity(rng):
    x = rng.normal(size=(16, 200)).astype(np.float32)
    xr = rng.normal(size=(16, 200)).astype(np.float32)
    want = oracle.gaussian_recon(x, xr)
    got = losses.gaussian_recon(jnp.array(x), jnp.array(xr))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_kl_parity(rng):
    mu = rng.normal(size=(16, 20)).astype(np.float32)
    lv = rng.normal(size=(16, 20)).astype(np.float32)
    want = oracle.kl(mu, lv)
    got = losses.kl_divergence(jnp.array(mu), jnp.array(lv))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_kl_zero_at_standard_normal():
    z = jnp.zeros((4, 20))
    np.testing.assert_allclose(np.asarray(losses.kl_divergence(z, z)), 0.0, atol=1e-7)


def test_assoc_parity(rng):
    zs = [rng.normal(size=(16, 20)).astype(np.float32) for _ in range(3)]
    want = oracle.assoc_term(zs)
    got = losses.assoc_loss([jnp.array(z) for z in zs])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_assoc_single_modality_is_zero(rng):
    z = jnp.array(rng.normal(size=(16, 20)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(losses.assoc_loss([z])), 0.0)


def test_reparam_explicit_eps(rng):
    mu = rng.normal(size=(8, 20)).astype(np.float32)
    lv = rng.normal(size=(8, 20)).astype(np.float32)
    eps = rng.normal(size=(8, 20)).astype(np.float32)
    want = oracle.reparam(mu, lv, eps)
    got = sampling.reparameterize(jnp.array(mu), jnp.array(lv), eps=jnp.array(eps))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-6, atol=1e-7)


def test_reparam_key_statistics():
    """z ~ N(μ, σ²) statistically, via the key path."""
    mu = jnp.full((200_00, 4), 2.0)
    lv = jnp.full((200_00, 4), np.log(0.25))
    z = sampling.reparameterize(mu, lv, key=jax.random.key(0))
    assert abs(float(jnp.mean(z)) - 2.0) < 0.02
    assert abs(float(jnp.std(z)) - 0.5) < 0.02
