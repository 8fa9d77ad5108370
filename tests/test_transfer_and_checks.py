"""transfer_fct API knob + debug_nans sanitizer smoke (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vae_assoc_tpu as vat
from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.train.step import init_train_state, make_train_step

TINY = dict(
    n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
    n_hidden_gener_1=16, n_hidden_gener_2=16,
)


@pytest.mark.parametrize("transfer", ["relu", "tanh", "elu"])
def test_transfer_fct_changes_model_and_trains(rng, transfer):
    x = rng.uniform(0, 1, (32, 24)).astype(np.float32)
    m_sp = vat.VariationalAutoencoder(TINY, seed=1)
    m_tr = vat.VariationalAutoencoder(TINY, transfer_fct=transfer, seed=1)
    # different transfer → different recognition output for the same weights
    z_sp = np.asarray(m_sp.transform(x))
    z_tr = np.asarray(m_tr.transform(x))
    assert np.abs(z_sp - z_tr).max() > 1e-4
    costs = [m_tr.partial_fit(x) for _ in range(10)]
    assert costs[-1] < costs[0]


def test_unknown_transfer_rejected():
    with pytest.raises(ValueError, match="transfer_fct"):
        vat.VariationalAutoencoder(TINY, transfer_fct="swishh")


def test_pallas_falls_back_for_non_softplus(rng):
    """use_pallas + relu must route through the jnp path, not mis-fuse."""
    cfg = AssocConfig(
        [ModalityConfig("x", TINY, transfer="relu")], assoc_lambda=0.0
    )
    tc = TrainConfig(batch_size=16, use_pallas=True)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [jnp.asarray(rng.uniform(0, 1, (16, 24)).astype(np.float32))]
    state, m = step(state, xs)
    assert np.isfinite(float(m["total"]))
    # parity with the explicitly-non-pallas path under identical ε handled
    # by the per-step keyed stream: same seed → same loss
    tc2 = TrainConfig(batch_size=16, use_pallas=False)
    state2 = init_train_state(cfg, tc2)
    step2 = make_train_step(cfg, tc2)
    _, m2 = step2(state2, xs)
    np.testing.assert_allclose(float(m["total"]), float(m2["total"]), rtol=1e-6)


def test_train_step_clean_under_debug_nans(rng):
    """SURVEY.md §5 sanitizers: one step under jax.debug_nans stays clean."""
    cfg = AssocConfig(
        [
            ModalityConfig("image", TINY, recon="bernoulli"),
            ModalityConfig("trajectory", TINY, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    tc = TrainConfig(batch_size=16)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 24)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32)),
    ]
    with jax.debug_nans(True):
        state = init_train_state(cfg, tc)
        step = make_train_step(cfg, tc)
        state, m = step(state, xs)
        assert np.isfinite(float(m["total"]))


def test_empty_batch_rejected_at_host_boundary(rng):
    """An off-the-end numpy slice produces an EMPTY batch; mean-of-nothing
    would train on NaNs and silently poison the params. The host boundary
    (api._host_xs) must reject it by name instead."""
    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"], seed=0
    )
    imgs = rng.uniform(0, 1, (32, 24)).astype(np.float32)
    trajs = rng.normal(size=(32, 24)).astype(np.float32)
    with pytest.raises(ValueError, match="empty"):
        model.partial_fit([imgs[100:164], trajs[100:164]])  # past the end
    with pytest.raises(ValueError, match="empty"):
        model.transform([imgs[:0], trajs[:0]])
    # sane batches still flow
    c = model.partial_fit([imgs, trajs])
    assert np.isfinite(c)
