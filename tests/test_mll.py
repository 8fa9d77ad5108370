"""Marginal log-likelihood bounds (train/eval.py marginal_log_likelihood):
IWAE/ELBO estimator wiring, Jensen ordering, determinism, and a per-draw
numpy-style twin with injected ε (the parity-test RNG convention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.models import vae as vae_mod
from vae_assoc_tpu.train.eval import marginal_log_likelihood
from vae_assoc_tpu.train.step import init_train_state


def tiny_cfg():
    arch = dict(
        n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
        n_hidden_gener_1=16, n_hidden_gener_2=16,
    )
    return AssocConfig(
        [
            ModalityConfig("image", arch, recon="bernoulli"),
            ModalityConfig("trajectory", dict(arch), recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    state = init_train_state(cfg, TrainConfig(batch_size=16))
    rng = np.random.default_rng(3)
    xs = [
        rng.uniform(0, 1, (16, 24)).astype(np.float32),
        rng.normal(size=(16, 24)).astype(np.float32),
    ]
    return cfg, state.params, xs


def test_iwae_at_least_elbo(setup):
    """logsumexp(lw) − log k ≥ mean(lw) holds per draw set (Jensen) —
    deterministic, not statistical."""
    cfg, params, xs = setup
    out = marginal_log_likelihood(params, xs, cfg, n_importance=32, block=8)
    for m in cfg.modalities:
        assert out[f"iwae_{m.name}"] >= out[f"elbo_{m.name}"] - 1e-5, out


def test_k1_iwae_equals_elbo(setup):
    cfg, params, xs = setup
    out = marginal_log_likelihood(params, xs, cfg, n_importance=1, block=1)
    for m in cfg.modalities:
        np.testing.assert_allclose(
            out[f"iwae_{m.name}"], out[f"elbo_{m.name}"], rtol=1e-6
        )


def test_mll_deterministic_and_block_invariant(setup):
    """Same seed → bitwise-identical dict; ε is drawn per block index, so
    estimates depend on (seed, k) but repeated calls reproduce exactly."""
    cfg, params, xs = setup
    a = marginal_log_likelihood(params, xs, cfg, n_importance=16, block=4, seed=7)
    b = marginal_log_likelihood(params, xs, cfg, n_importance=16, block=4, seed=7)
    assert a == b
    c = marginal_log_likelihood(params, xs, cfg, n_importance=16, block=4, seed=8)
    assert a != c


def test_mll_matches_per_draw_twin_with_injected_eps(setup):
    """With ε injected explicitly, the scanned/reshaped estimator must
    equal a straightforward per-draw loop over vae_forward + the textbook
    log-weight formula (RNG-free parity, SURVEY.md §7 'RNG semantics')."""
    cfg, params, xs = setup
    k, b = 8, 16
    rng = np.random.default_rng(11)
    eps = [rng.normal(size=(k, b, 4)).astype(np.float32) for _ in range(2)]
    got = marginal_log_likelihood(
        params, xs, cfg, n_importance=k, block=4, eps=eps
    )

    log2pi = float(np.log(2 * np.pi))
    for m_i, mcfg in enumerate(cfg.modalities):
        lws = []
        for i in range(k):
            out = vae_mod.vae_forward(
                params["modalities"][m_i], jnp.asarray(xs[m_i]), mcfg,
                eps=jnp.asarray(eps[m_i][i]),
            )
            x = np.asarray(xs[m_i], np.float64)
            mu = np.asarray(out.z_mean, np.float64)
            lv = np.asarray(out.z_logvar, np.float64)
            z = np.asarray(out.z, np.float64)
            recon = np.asarray(out.recon, np.float64)
            if mcfg.recon == "bernoulli":
                l = recon
                nll = np.sum(
                    np.maximum(l, 0) - l * x + np.log1p(np.exp(-np.abs(l))),
                    axis=1,
                )
            else:
                nll = np.sum((x - recon) ** 2, axis=1) + 0.5 * x.shape[1] * np.log(np.pi)
            log_p_z = -0.5 * (np.sum(z * z, axis=1) + 4 * log2pi)
            e = np.asarray(eps[m_i][i], np.float64)
            log_q = -0.5 * (np.sum(e * e, axis=1) + np.sum(lv, axis=1) + 4 * log2pi)
            lws.append(-nll + log_p_z - log_q)
        lw = np.stack(lws)  # [k, B]
        want_elbo = float(np.mean(lw))
        m_max = lw.max(axis=0)
        want_iwae = float(
            np.mean(m_max + np.log(np.mean(np.exp(lw - m_max), axis=0)))
        )
        name = mcfg.name
        np.testing.assert_allclose(got[f"elbo_{name}"], want_elbo, rtol=2e-5)
        np.testing.assert_allclose(got[f"iwae_{name}"], want_iwae, rtol=2e-5)


def test_mll_improves_with_training(setup):
    """The bound must move the right way: a trained model assigns higher
    log-likelihood to its training data than a fresh init."""
    cfg, params, xs = setup
    from vae_assoc_tpu.train.loop import train_loop

    state, _ = train_loop(
        cfg, TrainConfig(batch_size=16, learning_rate=3e-3),
        [np.asarray(x) for x in xs], epochs=30,
    )
    before = marginal_log_likelihood(params, xs, cfg, n_importance=16)
    after = marginal_log_likelihood(state.params, xs, cfg, n_importance=16)
    for m in cfg.modalities:
        assert after[f"iwae_{m.name}"] > before[f"iwae_{m.name}"], (before, after)


def test_mll_validates_inputs(setup):
    cfg, params, xs = setup
    with pytest.raises(ValueError, match="n_importance"):
        marginal_log_likelihood(params, xs, cfg, n_importance=0)
    with pytest.raises(ValueError, match="divide"):
        marginal_log_likelihood(params, xs, cfg, n_importance=10, block=4)
    bad_eps = [np.zeros((3, 16, 4), np.float32)] * 2
    with pytest.raises(ValueError, match="eps"):
        marginal_log_likelihood(params, xs, cfg, n_importance=8, eps=bad_eps)
