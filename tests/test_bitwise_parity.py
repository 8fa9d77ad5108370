"""Bitwise fp32-CPU loss parity vs the numpy oracle (BASELINE.json:5).

Contract decomposition (full table: docs/PARITY.md):

- **Reduction skeleton — exactly bitwise.** `losses.ordered_sum/mean`
  (loop-carried scan, reciprocal-multiply mean) vs the oracle's
  `np.cumsum`-pinned versions: asserted equal to the bit here.
- **Transcendental-free terms — exactly bitwise end-to-end.** Gaussian
  reconstruction and the association term contain only sub/mul/add with a
  pinned order: asserted equal to the bit.
- **Transcendental terms — bitwise up to libm.** KL (exp) and Bernoulli
  (log) inherit numpy-libm vs XLA-elementwise differences of ≤4 ULP per
  element (measured, scripts/bitwise_probe.py); with pinned reductions the
  per-sample/scalar results land within a few ULP, asserted with tight
  measured bounds — not a loose rtol.
- **Forward MLP matmuls — documented exception.** BLAS blocked sgemm vs
  XLA's tiling reassociate differently (measured in the probe); the joint
  loss through the full forward pass is asserted to a tight ULP bound.
"""

import numpy as np
import jax
import jax.numpy as jnp

import oracle_np as oracle
from vae_assoc_tpu.configs import (
    AssocConfig,
    ModalityConfig,
    default_image_arch,
    default_traj_arch,
)
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.ops import losses


def ulp_dist(a, b):
    """Max distance in units-in-the-last-place between fp32 arrays."""
    a = np.atleast_1d(np.asarray(a, np.float32))
    b = np.atleast_1d(np.asarray(b, np.float32))
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    return int(np.max(np.abs(ai - bi)))


def assert_bitwise(got, want, what):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    same = got.view(np.uint32) == want.view(np.uint32)
    assert same.all(), f"{what}: {np.sum(~same)}/{same.size} bits differ, max ULP {ulp_dist(got, want)}"


def test_ordered_sum_bitwise(rng):
    for shape in [(8, 5), (64, 784), (3, 1), (17, 200)]:
        m = (rng.normal(size=shape) * 10).astype(np.float32)
        assert_bitwise(
            jax.jit(losses.ordered_sum)(m), oracle.ordered_sum(m), f"ordered_sum {shape}"
        )
        assert_bitwise(
            jax.jit(losses.ordered_mean)(m),
            oracle.ordered_mean(m),
            f"ordered_mean {shape}",
        )


def test_gaussian_recon_bitwise(rng):
    x = rng.normal(size=(64, 200)).astype(np.float32)
    xr = rng.normal(size=(64, 200)).astype(np.float32)
    got = jax.jit(lambda a, b: losses.gaussian_recon(a, b, ordered=True))(x, xr)
    assert_bitwise(got, oracle.gaussian_recon(x, xr), "gaussian_recon")


def test_assoc_loss_bitwise(rng):
    zs = [rng.normal(size=(64, 20)).astype(np.float32) for _ in range(3)]
    got = jax.jit(lambda *z: losses.assoc_loss(list(z), ordered=True))(*zs)
    assert_bitwise(got, oracle.assoc_term(zs), "assoc_loss (3 modalities)")


def test_kl_ulp_bound(rng):
    # exp() differs ≤2 ULP/element between numpy libm and XLA CPU (probe);
    # with pinned sums the per-sample KL lands within a few ULP. Measured 4.
    mu = rng.normal(size=(64, 20)).astype(np.float32)
    lv = rng.normal(size=(64, 20)).astype(np.float32)
    got = jax.jit(lambda a, b: losses.kl_divergence(a, b, ordered=True))(mu, lv)
    assert ulp_dist(got, oracle.kl(mu, lv)) <= 8


def test_bernoulli_given_probs_ulp_bound(rng):
    # log() differs ≤3 ULP/element (probe); measured 2 end-to-end.
    x = rng.uniform(0, 1, size=(64, 784)).astype(np.float32)
    p = rng.uniform(0, 1, size=(64, 784)).astype(np.float32)
    got = jax.jit(lambda a, b: losses.bernoulli_recon(a, probs=b, parity_mode=True))(
        x, p
    )
    assert ulp_dist(got, oracle.bernoulli_recon(x, p)) <= 8


def _small_cfg():
    img = ModalityConfig(
        "image", default_image_arch(n_z=5, hidden=32), recon="bernoulli"
    )
    traj = ModalityConfig(
        "trajectory",
        default_traj_arch(n_timesteps=10, n_z=5, hidden=24),
        recon="gaussian",
    )
    return AssocConfig([img, traj], assoc_lambda=2.0)


def test_joint_loss_full_forward_ulp():
    # Through the full forward pass (matmuls: the one documented-exception
    # primitive — BLAS vs XLA accumulation order), every scalar metric must
    # land within a tight ULP bound. Measured 0–1 ULP over these seeds.
    cfg = _small_cfg()
    key_to_metric = {
        "recon_image": "recon_0",
        "kl_image": "kl_0",
        "recon_trajectory": "recon_1",
        "kl_trajectory": "kl_1",
        "assoc": "assoc",
        "total": "total",
    }
    worst = 0
    for seed in range(5):
        rng = np.random.default_rng(seed)
        params = assoc_mod.init_assoc(jax.random.key(seed), cfg)
        xs = [
            rng.random((8, 784)).astype(np.float32),
            rng.normal(size=(8, 20)).astype(np.float32),
        ]
        eps = [rng.normal(size=(8, 5)).astype(np.float32) for _ in range(2)]
        total, mets = assoc_mod.assoc_loss_fn(
            params,
            [jnp.asarray(v) for v in xs],
            cfg,
            eps=[jnp.asarray(e) for e in eps],
            parity_mode=True,
        )
        p_np = [jax.tree.map(np.asarray, p) for p in params["modalities"]]
        want_total, want_m = oracle.joint_loss(
            p_np, xs, eps, ["bernoulli", "gaussian"], cfg.assoc_lambda
        )
        mets = dict(mets, total=total)
        for ours, theirs in key_to_metric.items():
            worst = max(worst, ulp_dist(float(mets[ours]), want_m[theirs]))
    assert worst <= 16, f"joint-loss metrics drifted to {worst} ULP from the oracle"


def test_parity_mode_is_differentiable(rng):
    # The pinned-order scan reductions must not break reverse-mode autodiff
    # (parity_mode also feeds the TF gradient-parity suite and TrainConfig).
    cfg = _small_cfg()
    params = assoc_mod.init_assoc(jax.random.key(9), cfg)
    xs = [
        jnp.asarray(rng.random((8, 784)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(8, 20)).astype(np.float32)),
    ]
    eps = [jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32)) for _ in range(2)]
    g = jax.grad(
        lambda p: assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, parity_mode=True)[0]
    )(params)
    flat = jax.tree.leaves(g)
    assert flat and all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in flat)
