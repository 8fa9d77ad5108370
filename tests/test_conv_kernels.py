"""Pallas conv/transposed-conv kernel parity vs the lax-based conv tower.

Forward values and VJP gradients of every conv in the config-4 image tower
must match `models.conv` (which uses lax.conv_general_dilated /
lax.conv_transpose). Interpret mode on CPU; same tests lower on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import default_image_arch
from vae_assoc_tpu.kernels import conv as kconv
from vae_assoc_tpu.models import conv as conv_mod

DN = ("NHWC", "HWIO", "NHWC")
ARCH = default_image_arch(n_z=8, hidden=64)


def _close(a, b, rtol=2e-5, atol=2e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


@pytest.mark.parametrize("h,cin,cout,batch", [(28, 1, 32, 16), (14, 32, 64, 8)])
def test_strided_conv_parity(rng, h, cin, cout, batch):
    x = jnp.asarray(rng.normal(size=(batch, h, h, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = (
        jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.float32,
        )
        + b
    )
    got = kconv.conv3x3_s2(x, w, b)
    _close(got, ref)


@pytest.mark.parametrize("h,cin,cout,batch", [(7, 64, 32, 8), (14, 32, 1, 16)])
def test_transposed_conv_parity(rng, h, cin, cout, batch):
    x = jnp.asarray(rng.normal(size=(batch, h, h, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = (
        jax.lax.conv_transpose(
            x, w, (2, 2), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.float32,
        )
        + b
    )
    got = kconv.convt3x3_s2(x, w, b)
    _close(got, ref)


def test_strided_conv_grads(rng):
    x = jnp.asarray(rng.normal(size=(8, 14, 14, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32) * 0.2)
    b = jnp.zeros((6,), jnp.float32)
    t = jnp.asarray(rng.normal(size=(8, 7, 7, 6)).astype(np.float32))

    def loss_ref(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=DN) + b
        return jnp.sum((jax.nn.softplus(y) - t) ** 2)

    def loss_ker(x, w):
        return jnp.sum((jax.nn.softplus(kconv.conv3x3_s2(x, w, b)) - t) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_k, gw_k = jax.grad(loss_ker, argnums=(0, 1))(x, w)
    _close(gx_k, gx_r)
    _close(gw_k, gw_r)


def test_transposed_conv_grads(rng):
    x = jnp.asarray(rng.normal(size=(8, 7, 7, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 4)).astype(np.float32) * 0.2)
    b = jnp.zeros((4,), jnp.float32)
    t = jnp.asarray(rng.normal(size=(8, 14, 14, 4)).astype(np.float32))

    def loss_ref(x, w):
        y = jax.lax.conv_transpose(x, w, (2, 2), "SAME", dimension_numbers=DN) + b
        return jnp.sum((jax.nn.softplus(y) - t) ** 2)

    def loss_ker(x, w):
        return jnp.sum((jax.nn.softplus(kconv.convt3x3_s2(x, w, b)) - t) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_k, gw_k = jax.grad(loss_ker, argnums=(0, 1))(x, w)
    _close(gx_k, gx_r)
    _close(gw_k, gw_r)


def test_tower_parity(rng):
    """Full encode/decode tower: fused Pallas vs lax reference."""
    params = conv_mod.init_conv_vae_params(jax.random.key(0), ARCH)
    x = jnp.asarray(rng.uniform(0, 1, (16, 784)).astype(np.float32))
    mu_r, lv_r = conv_mod.encode_conv(params, x)
    mu_k, lv_k = kconv.encode_conv_fused(params, x)
    _close(mu_k, mu_r)
    _close(lv_k, lv_r)
    z = mu_r
    _close(kconv.decode_conv_fused(params, z), conv_mod.decode_conv(params, z))


def test_tower_grad_parity(rng):
    params = conv_mod.init_conv_vae_params(jax.random.key(1), ARCH)
    x = jnp.asarray(rng.uniform(0, 1, (8, 784)).astype(np.float32))

    def loss(encode, decode, p):
        mu, lv = encode(p, x)
        out = decode(p, mu)
        return jnp.mean(out**2) + jnp.mean(mu * lv)

    g_r = jax.grad(lambda p: loss(conv_mod.encode_conv, conv_mod.decode_conv, p))(params)
    g_k = jax.grad(lambda p: loss(kconv.encode_conv_fused, kconv.decode_conv_fused, p))(params)
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_k)):
        _close(b, a, rtol=5e-5, atol=5e-5)


def test_config4_train_step_learns(rng):
    """Config 4 end-to-end: conv tower via Pallas kernels in the train step."""
    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
    from vae_assoc_tpu.train.step import init_train_state, make_train_step

    traj_arch = dict(
        n_input=24, n_z=8, n_hidden_recog_1=32, n_hidden_recog_2=32,
        n_hidden_gener_1=32, n_hidden_gener_2=32,
    )
    img_arch = default_image_arch(n_z=8, hidden=64)
    cfg = AssocConfig(
        [
            ModalityConfig(
                "image", img_arch, recon="bernoulli", encoder="conv_pallas"
            ),
            ModalityConfig("trajectory", traj_arch, recon="gaussian"),
        ],
        assoc_lambda=1.0,
    )
    tc = TrainConfig(batch_size=16, learning_rate=2e-3, use_pallas=True)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 784)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32)),
    ]
    losses = []
    for _ in range(12):
        state, m = step(state, xs)
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0]
