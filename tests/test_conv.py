"""Conv encoder / transposed-conv decoder branch (BASELINE.json:10 config 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import (
    AssocConfig,
    ModalityConfig,
    TrainConfig,
    baseline_config,
    default_image_arch,
)
from vae_assoc_tpu.models import conv as conv_mod
from vae_assoc_tpu.models import vae as vae_mod
from vae_assoc_tpu.train.step import init_train_state, make_train_step

ARCH = default_image_arch(n_z=8, hidden=64)


@pytest.fixture()
def params():
    return conv_mod.init_conv_vae_params(jax.random.key(0), ARCH)


def test_shapes(params, rng):
    x = jnp.asarray(rng.uniform(0, 1, (6, 784)).astype(np.float32))
    mu, lv = conv_mod.encode_conv(params, x)
    assert mu.shape == (6, 8) and lv.shape == (6, 8)
    assert mu.dtype == jnp.float32
    out = conv_mod.decode_conv(params, mu)
    assert out.shape == (6, 784)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rejects_non_28x28():
    bad = dict(ARCH)
    bad["n_input"] = 100
    with pytest.raises(ValueError, match="n_input"):
        conv_mod.init_conv_vae_params(jax.random.key(0), bad)


def test_conv_vae_forward_roundtrip(params, rng):
    cfg = ModalityConfig("image", ARCH, recon="bernoulli", encoder="conv")
    x = jnp.asarray(rng.uniform(0, 1, (4, 784)).astype(np.float32))
    out = vae_mod.vae_forward(params, x, cfg, key=jax.random.key(1))
    assert out.recon.shape == (4, 784)
    rec = vae_mod.reconstruct(params, x, cfg, key=jax.random.key(1))
    assert float(jnp.min(rec)) >= 0.0 and float(jnp.max(rec)) <= 1.0


def test_conv_joint_train_learns(rng):
    """Config-4 shape: conv image tower + MLP trajectory tower, joint loss."""
    traj_arch = dict(
        n_input=24, n_z=8, n_hidden_recog_1=32, n_hidden_recog_2=32,
        n_hidden_gener_1=32, n_hidden_gener_2=32,
    )
    cfg = AssocConfig(
        [
            ModalityConfig("image", ARCH, recon="bernoulli", encoder="conv"),
            ModalityConfig("trajectory", traj_arch, recon="gaussian"),
        ],
        assoc_lambda=1.0,
    )
    tc = TrainConfig(batch_size=16, learning_rate=2e-3)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 784)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32)),
    ]
    losses = []
    for _ in range(20):
        state, m = step(state, xs)
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_baseline_config_4_builds():
    cfg, tc = baseline_config(4)
    assert cfg.modalities[0].encoder == "conv"
    state = init_train_state(cfg, tc)
    # conv tower params present with expected kernels
    w = state.params["modalities"][0]["recog"]["conv1"]["w"]
    assert w.shape == (3, 3, 1, conv_mod.C1)
