"""Conv-tower megakernel parity: forward values, full param gradients,
joint loss integration (VERDICT r3 #1).

Interpret mode on CPU (the same code lowers to Mosaic on TPU —
scripts/bench_conv_mega.py measures it there). ε is injected so the
megakernel and the jnp conv path see identical randomness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig
from vae_assoc_tpu.kernels.conv_mega import conv_tower_fused
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.models.conv import (
    decode_conv,
    encode_conv,
    init_conv_vae_params,
)
from vae_assoc_tpu.ops import losses

CONV_ARCH = dict(
    n_input=784, n_z=8, n_hidden_recog_1=48, n_hidden_recog_2=48,
    n_hidden_gener_1=48, n_hidden_gener_2=48,
)
MLP_ARCH = dict(
    n_input=36, n_z=8, n_hidden_recog_1=24, n_hidden_recog_2=20,
    n_hidden_gener_1=20, n_hidden_gener_2=24,
)


def _ref_terms(params, x, eps, kind):
    mu, lv = encode_conv(params, x)
    z = mu + jnp.exp(0.5 * lv) * eps
    r = decode_conv(params, z)
    if kind == "bernoulli":
        rec = losses.bernoulli_recon(x, logits=r)
    else:
        rec = losses.gaussian_recon(x, r)
    kl = losses.kl_divergence(mu, lv)
    return {"mu": mu, "lv": lv, "recon_term": rec, "kl_term": kl}


@pytest.mark.parametrize("kind", ["bernoulli", "gaussian"])
@pytest.mark.parametrize("batch", [16, 19])  # 19: ragged ceil-div grid
def test_conv_tower_forward_parity(rng, kind, batch):
    params = init_conv_vae_params(jax.random.key(0), CONV_ARCH)
    x = jnp.asarray(rng.uniform(0, 1, (batch, 784)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(batch, 8)).astype(np.float32))
    got = conv_tower_fused(params, x, kind=kind, eps=eps)
    want = _ref_terms(params, x, eps, kind)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )


@pytest.mark.parametrize("kind", ["bernoulli", "gaussian"])
def test_conv_tower_param_grad_parity(rng, kind):
    params = init_conv_vae_params(jax.random.key(1), CONV_ARCH)
    x = jnp.asarray(rng.uniform(0, 1, (16, 784)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    # Random mix over every output so all VJP paths carry signal.
    wmu = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    def total(fused):
        def f(p):
            o = (
                conv_tower_fused(p, x, kind=kind, eps=eps)
                if fused
                else _ref_terms(p, x, eps, kind)
            )
            return (
                jnp.mean(o["recon_term"]) + jnp.mean(o["kl_term"])
                + jnp.mean(o["mu"] @ wmu) + jnp.mean(jnp.sin(o["lv"]))
            )

        return f

    g_m = jax.grad(total(True))(params)
    g_r = jax.grad(total(False))(params)
    flat_m = jax.tree_util.tree_leaves_with_path(g_m)
    flat_r = jax.tree.leaves(g_r)
    for (path, a), b in zip(flat_m, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_conv_tower_ragged_grad_matches_truncated(rng):
    """Padded tail rows of a ragged grid must contribute nothing: grads at
    batch 19 equal grads of the same 19 rows run alone."""
    params = init_conv_vae_params(jax.random.key(2), CONV_ARCH)
    x = jnp.asarray(rng.uniform(0, 1, (19, 784)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(19, 8)).astype(np.float32))

    def total(p):
        o = conv_tower_fused(p, x, kind="bernoulli", eps=eps)
        return jnp.sum(o["recon_term"]) + jnp.sum(o["kl_term"])

    def total_ref(p):
        o = _ref_terms(p, x, eps, "bernoulli")
        return jnp.sum(o["recon_term"]) + jnp.sum(o["kl_term"])

    g_m = jax.tree.leaves(jax.grad(total)(params))
    g_r = jax.tree.leaves(jax.grad(total_ref)(params))
    for a, b in zip(g_m, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_mega_gate_accepts_conv():
    cfg = AssocConfig(
        [
            ModalityConfig("image", CONV_ARCH, recon="bernoulli", encoder="conv"),
            ModalityConfig("trajectory", MLP_ARCH, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    assert assoc_mod.mega_fallback_reason(cfg) is None


def test_assoc_loss_mega_conv_matches_jnp_path(rng):
    cfg = AssocConfig(
        [
            ModalityConfig("image", CONV_ARCH, recon="bernoulli", encoder="conv"),
            ModalityConfig("trajectory", MLP_ARCH, recon="gaussian"),
        ],
        assoc_lambda=0.7,
    )
    params = assoc_mod.init_assoc(jax.random.key(3), cfg)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 784)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 36)).astype(np.float32)),
    ]
    eps = [jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)) for _ in range(2)]
    t_m, m_m = assoc_mod.assoc_loss_fn(params, xs, cfg, eps=eps, use_pallas="mega")
    t_r, m_r = assoc_mod.assoc_loss_fn(params, xs, cfg, eps=eps, use_pallas=False)
    np.testing.assert_allclose(float(t_m), float(t_r), rtol=1e-4)
    for k in m_r:
        np.testing.assert_allclose(float(m_m[k]), float(m_r[k]), rtol=1e-4,
                                   err_msg=k)

    g_m = jax.grad(
        lambda p: assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas="mega")[0]
    )(params)
    g_r = jax.grad(
        lambda p: assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas=False)[0]
    )(params)
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_train_step_conv_mega_learns(rng):
    from vae_assoc_tpu.configs import TrainConfig
    from vae_assoc_tpu.train.step import init_train_state, make_train_step

    cfg = AssocConfig(
        [
            ModalityConfig("image", CONV_ARCH, recon="bernoulli", encoder="conv"),
            ModalityConfig("trajectory", MLP_ARCH, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    tc = TrainConfig(batch_size=16, use_pallas="mega")
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 784)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 36)).astype(np.float32)),
    ]
    hist = []
    for _ in range(10):
        state, m = step(state, xs)
        hist.append(float(m["total"]))
    assert np.isfinite(hist).all() and hist[-1] < hist[0]


def test_mega_routes_conv_encoder_by_field(rng, monkeypatch):
    """Under use_pallas='mega', encoder='conv' must reach conv_tower_xla
    (the measured round-4 winner) and encoder='conv_pallas' must reach the
    Pallas conv-tower megakernel (the explicit opt-in)."""
    from vae_assoc_tpu.kernels import conv_mega

    calls = []
    real_xla, real_fused = conv_mega.conv_tower_xla, conv_mega.conv_tower_fused
    monkeypatch.setattr(
        conv_mega, "conv_tower_xla",
        lambda *a, **k: calls.append("xla") or real_xla(*a, **k))
    monkeypatch.setattr(
        conv_mega, "conv_tower_fused",
        lambda *a, **k: calls.append("fused") or real_fused(*a, **k))

    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 784)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 36)).astype(np.float32)),
    ]
    eps = [jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)) for _ in range(2)]
    for encoder, expected in (("conv", "xla"), ("conv_pallas", "fused")):
        cfg = AssocConfig(
            [
                ModalityConfig("image", CONV_ARCH, recon="bernoulli", encoder=encoder),
                ModalityConfig("trajectory", MLP_ARCH, recon="gaussian"),
            ],
            assoc_lambda=0.5,
        )
        params = assoc_mod.init_assoc(jax.random.key(3), cfg)
        calls.clear()
        assoc_mod.assoc_loss_fn(params, xs, cfg, eps=eps, use_pallas="mega")
        # calls[0] (not ==): under shard_map-on-CPU conv_tower_fused itself
        # falls back to conv_tower_xla, appending a second entry.
        assert calls and calls[0] == expected, (encoder, calls)
