"""Forward-pass and joint-loss parity vs the numpy oracle, with injected ε.

These are the *relative-tolerance* sanity checks. The BASELINE.json:5
"bitwise-comparable losses at fp32 on CPU" contract itself is asserted in
tests/test_bitwise_parity.py (pinned reduction order, exact bit equality
for transcendental-free terms, tight measured ULP bounds elsewhere) and
documented with per-primitive evidence in docs/PARITY.md.
"""

import jax
import jax.numpy as jnp
import numpy as np

import oracle_np as oracle
from vae_assoc_tpu.configs import (
    AssocConfig,
    ModalityConfig,
    default_image_arch,
    default_traj_arch,
)
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.models import vae as vae_mod
from vae_assoc_tpu.models.networks import init_mlp_vae_params


def small_cfg():
    img = ModalityConfig("image", default_image_arch(n_z=5, hidden=32), recon="bernoulli")
    traj = ModalityConfig(
        "trajectory",
        default_traj_arch(n_timesteps=10, n_z=5, hidden=24),
        recon="gaussian",
    )
    return AssocConfig([img, traj], assoc_lambda=2.0)


def to_np(tree):
    return jax.tree.map(np.asarray, tree)


def test_single_vae_forward_parity(rng):
    cfg = small_cfg().modalities[0]
    params = init_mlp_vae_params(jax.random.key(0), cfg.arch)
    x = rng.random((8, 784)).astype(np.float32)
    eps = rng.normal(size=(8, 5)).astype(np.float32)

    out = vae_mod.vae_forward(params, jnp.array(x), cfg, eps=jnp.array(eps))
    p_np = to_np(params)
    zm, zlv = oracle.encode(p_np, x)
    z = oracle.reparam(zm, zlv, eps)
    recon = oracle.decode(p_np, z)

    np.testing.assert_allclose(np.asarray(out.z_mean), zm, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.z_logvar), zlv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.recon), recon, rtol=1e-4, atol=1e-4)


def test_joint_loss_parity(rng):
    cfg = small_cfg()
    params = assoc_mod.init_assoc(jax.random.key(1), cfg)
    xs = [
        rng.random((8, 784)).astype(np.float32),
        rng.normal(size=(8, 20)).astype(np.float32),
    ]
    eps = [rng.normal(size=(8, 5)).astype(np.float32) for _ in range(2)]

    total, metrics = assoc_mod.assoc_loss_fn(
        params,
        [jnp.array(x) for x in xs],
        cfg,
        eps=[jnp.array(e) for e in eps],
        parity_mode=True,
    )
    p_np = [to_np(p) for p in params["modalities"]]
    want_total, want_metrics = oracle.joint_loss(
        p_np, xs, eps, ["bernoulli", "gaussian"], cfg.assoc_lambda
    )
    np.testing.assert_allclose(float(total), want_total, rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics["recon_image"]), want_metrics["recon_0"], rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["recon_trajectory"]), want_metrics["recon_1"], rtol=1e-5
    )
    np.testing.assert_allclose(float(metrics["kl_image"]), want_metrics["kl_0"], rtol=1e-5)
    np.testing.assert_allclose(float(metrics["assoc"]), want_metrics["assoc"], rtol=1e-5)


def test_loss_jits_and_is_deterministic(rng):
    cfg = small_cfg()
    params = assoc_mod.init_assoc(jax.random.key(2), cfg)
    xs = [
        jnp.array(rng.random((8, 784)).astype(np.float32)),
        jnp.array(rng.normal(size=(8, 20)).astype(np.float32)),
    ]

    @jax.jit
    def f(p, xs, key):
        return assoc_mod.assoc_loss_fn(p, xs, cfg, key=key)[0]

    key = jax.random.key(7)
    a, b = float(f(params, xs, key)), float(f(params, xs, key))
    assert a == b


def test_cross_generate_shapes(rng):
    cfg = small_cfg()
    params = assoc_mod.init_assoc(jax.random.key(3), cfg)
    x_img = jnp.array(rng.random((4, 784)).astype(np.float32))
    traj = assoc_mod.cross_generate(params, x_img, cfg, "image", "trajectory")
    assert traj.shape == (4, 20)
    x_traj = jnp.array(rng.normal(size=(4, 20)).astype(np.float32))
    img = assoc_mod.cross_generate(params, x_traj, cfg, "trajectory", "image")
    assert img.shape == (4, 784)
    assert float(jnp.min(img)) >= 0.0 and float(jnp.max(img)) <= 1.0  # sigmoid output


def test_cross_generate_matches_oracle_path(rng):
    cfg = small_cfg()
    params = assoc_mod.init_assoc(jax.random.key(4), cfg)
    x_img = rng.random((4, 784)).astype(np.float32)
    got = assoc_mod.cross_generate(params, jnp.array(x_img), cfg, "image", "trajectory")
    p_np = [to_np(p) for p in params["modalities"]]
    z, _ = oracle.encode(p_np[0], x_img)
    want = oracle.decode(p_np[1], z)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
