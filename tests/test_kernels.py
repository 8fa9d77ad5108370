"""Pallas kernel parity vs the pure-jnp reference implementations.

SURVEY.md §4.2: every Pallas kernel is checked against its `jax.numpy`
reference (`models.networks`) — interpret mode on CPU here; the same tests
lower for real when run on TPU. Both forward values and VJP gradients must
match, including multi-tile batch accumulation of weight gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.kernels import mlp as kmlp
from vae_assoc_tpu.models import networks

ARCH = dict(
    n_input=36,
    n_z=6,
    n_hidden_recog_1=24,
    n_hidden_recog_2=20,
    n_hidden_gener_1=20,
    n_hidden_gener_2=24,
)


@pytest.fixture()
def params():
    return networks.init_mlp_vae_params(jax.random.key(3), ARCH)


@pytest.mark.parametrize("batch", [16, 24, 300])  # 24 → one padded tile of
# 32; 300 → multi-tile ceil-div grid (2×256 fwd / 3×128 bwd) with ragged tail
def test_encoder_forward_parity(params, rng, batch):
    x = jnp.asarray(rng.normal(size=(batch, ARCH["n_input"])).astype(np.float32))
    mu_r, lv_r = networks.encode_mlp(params, x)
    mu_k, lv_k = kmlp.encode_mlp_fused(params, x)
    np.testing.assert_allclose(mu_k, mu_r, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(lv_k, lv_r, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("batch", [16, 24, 300])
def test_decoder_forward_parity(params, rng, batch):
    z = jnp.asarray(rng.normal(size=(batch, ARCH["n_z"])).astype(np.float32))
    out_r = networks.decode_mlp(params, z)
    out_k = kmlp.decode_mlp_fused(params, z)
    np.testing.assert_allclose(out_k, out_r, rtol=1e-6, atol=1e-6)


def _assert_tree_close(a, b, rtol=5e-5, atol=1e-5):
    la, _ = jax.tree.flatten(a)
    lb, _ = jax.tree.flatten(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


@pytest.mark.parametrize("batch", [16, 24, 300])
def test_encoder_grad_parity(params, rng, batch):
    x = jnp.asarray(rng.normal(size=(batch, ARCH["n_input"])).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(batch, ARCH["n_z"])).astype(np.float32))

    def loss_ref(p, x):
        mu, lv = networks.encode_mlp(p, x)
        return jnp.sum((mu - t) ** 2) + jnp.sum(jnp.cos(lv))

    def loss_ker(p, x):
        mu, lv = kmlp.encode_mlp_fused(p, x)
        return jnp.sum((mu - t) ** 2) + jnp.sum(jnp.cos(lv))

    gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_k, gx_k = jax.grad(loss_ker, argnums=(0, 1))(params, x)
    # Generator weights don't participate: drop them from the ref tree too.
    _assert_tree_close(gp_k["recog"], gp_r["recog"])
    _assert_tree_close(gx_k, gx_r)


@pytest.mark.parametrize("batch", [16, 24, 300])
def test_decoder_grad_parity(params, rng, batch):
    z = jnp.asarray(rng.normal(size=(batch, ARCH["n_z"])).astype(np.float32))

    def loss_ref(p, z):
        return jnp.sum(jnp.tanh(networks.decode_mlp(p, z)))

    def loss_ker(p, z):
        return jnp.sum(jnp.tanh(kmlp.decode_mlp_fused(p, z)))

    gp_r, gz_r = jax.grad(loss_ref, argnums=(0, 1))(params, z)
    gp_k, gz_k = jax.grad(loss_ker, argnums=(0, 1))(params, z)
    _assert_tree_close(gp_k["gener"], gp_r["gener"])
    _assert_tree_close(gz_k, gz_r)


def test_bf16_policy_runs_and_tracks_fp32(params, rng):
    x = jnp.asarray(rng.normal(size=(16, ARCH["n_input"])).astype(np.float32))
    mu32, _ = kmlp.encode_mlp_fused(params, x)
    mu16, lv16 = kmlp.encode_mlp_fused(params, x, compute_dtype=jnp.bfloat16)
    assert mu16.dtype == jnp.float32  # fp32 accumulation/output
    assert np.all(np.isfinite(np.asarray(mu16)))
    np.testing.assert_allclose(mu16, mu32, rtol=0.1, atol=0.1)


def test_full_train_step_with_pallas_kernels(rng):
    """use_pallas end-to-end: the jitted train step learns with fused kernels."""
    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
    from vae_assoc_tpu.train.step import init_train_state, make_train_step

    cfg = AssocConfig(
        [
            ModalityConfig("image", ARCH, recon="bernoulli"),
            ModalityConfig("trajectory", ARCH, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    tc = TrainConfig(batch_size=16, use_pallas=True)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 36)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 36)).astype(np.float32)),
    ]
    losses = []
    for _ in range(15):
        state, m = step(state, xs)
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize(
    "batch,n_in,h1,h2,nz",
    [(13, 30, 33, 17, 7), (40, 100, 64, 48, 12), (8, 784, 500, 500, 20)],
)
def test_fuzz_shapes_forward_and_grad_parity(rng, batch, n_in, h1, h2, nz):
    """Awkward (non-power-of-two, non-128-multiple) dims exercise the
    whole-batch tile fallback and Mosaic lane padding."""
    arch = dict(
        n_input=n_in, n_z=nz, n_hidden_recog_1=h1, n_hidden_recog_2=h2,
        n_hidden_gener_1=h2, n_hidden_gener_2=h1,
    )
    params = networks.init_mlp_vae_params(jax.random.key(batch), arch)
    x = jnp.asarray(rng.normal(size=(batch, n_in)).astype(np.float32))
    mu_r, lv_r = networks.encode_mlp(params, x)
    mu_k, lv_k = kmlp.encode_mlp_fused(params, x)
    np.testing.assert_allclose(mu_k, mu_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(lv_k, lv_r, rtol=1e-5, atol=1e-5)

    def loss_ref(p):
        mu, lv = networks.encode_mlp(p, x)
        return jnp.sum(mu * mu) + jnp.sum(jnp.sin(lv))

    def loss_ker(p):
        mu, lv = kmlp.encode_mlp_fused(p, x)
        return jnp.sum(mu * mu) + jnp.sum(jnp.sin(lv))

    g_r = jax.grad(loss_ref)(params)["recog"]
    g_k = jax.grad(loss_ker)(params)["recog"]
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("batch", [4100, 10007])
def test_ragged_large_batch_at_reference_arch(rng, batch):
    """Production-sized batches that no power-of-two tile divides (10007 is
    prime) must tile via the ceil-div grid + masked last tile — NOT fall
    back to one whole-batch VMEM tile (which would exceed VMEM on TPU).
    Weight grads are the sharp edge: an unmasked ragged tile would add
    garbage rows into the accumulators."""
    arch = dict(
        n_input=784, n_z=20, n_hidden_recog_1=500, n_hidden_recog_2=500,
        n_hidden_gener_1=500, n_hidden_gener_2=500,
    )
    params = networks.init_mlp_vae_params(jax.random.key(0), arch)
    x = jnp.asarray(rng.normal(size=(batch, 784)).astype(np.float32))

    # The tile policy must actually tile (multi-step grid, bounded tile).
    tile = kmlp._batch_tile(batch)
    assert tile <= 256 and batch % tile != 0  # genuinely ragged

    mu_r, lv_r = networks.encode_mlp(params, x)
    mu_k, lv_k = kmlp.encode_mlp_fused(params, x)
    np.testing.assert_allclose(mu_k, mu_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(lv_k, lv_r, rtol=1e-5, atol=1e-5)

    def enc_loss(encode):
        def f(p):
            mu, lv = encode(p, x)
            return jnp.mean(mu * mu) + jnp.mean(jnp.sin(lv))

        return f

    g_r = jax.grad(enc_loss(networks.encode_mlp))(params)["recog"]
    g_k = jax.grad(enc_loss(kmlp.encode_mlp_fused))(params)["recog"]
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4)

    z = jnp.asarray(rng.normal(size=(batch, 20)).astype(np.float32))
    out_r = networks.decode_mlp(params, z)
    out_k = kmlp.decode_mlp_fused(params, z)
    np.testing.assert_allclose(out_k, out_r, rtol=1e-5, atol=1e-5)

    def dec_loss(decode):
        def f(p):
            return jnp.mean(jnp.tanh(decode(p, z)))

        return f

    g_r = jax.grad(dec_loss(networks.decode_mlp))(params)["gener"]
    g_k = jax.grad(dec_loss(kmlp.decode_mlp_fused))(params)["gener"]
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4)
