"""β-VAE weight + KL/assoc annealing (TrainConfig.kl_beta /
kl_anneal_steps / assoc_warmup_steps).

The knobs rebuild the objective linearly from its logged terms
(train.step.apply_objective_weights — the same mechanism as the sweep's
runtime λ), so gradients are exact on every kernel path. Defaults must
leave the static objective byte-identical (parity surface).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import baseline_config
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.train.step import (
    apply_objective_weights,
    init_train_state,
    make_train_step,
    objective_weights,
)


def _cfg(**kw):
    return baseline_config(3, batch_size=16, **kw)


def _data(cfg, b=16, seed=0):
    r = np.random.RandomState(seed)
    return [
        jnp.asarray(r.rand(b, m.arch["n_input"]), jnp.float32)
        if m.recon == "bernoulli"
        else jnp.asarray(r.randn(b, m.arch["n_input"]), jnp.float32)
        for m in cfg.modalities
    ]


def _eps(cfg, b=16, seed=7):
    r = np.random.RandomState(seed)
    return [
        jnp.asarray(r.randn(b, m.arch["n_z"]), jnp.float32)
        for m in cfg.modalities
    ]


# ---------------------------------------------------------------------------
# objective_weights: the ramp math
# ---------------------------------------------------------------------------


def test_defaults_return_none():
    _, tc = _cfg()
    assert objective_weights(tc, jnp.int32(0)) is None
    assert objective_weights(tc, jnp.int32(999)) is None


@pytest.mark.parametrize(
    "step,expect_beta,expect_scale",
    [(0, 0.0, 0.0), (5, 1.0, 0.25), (10, 2.0, 0.5), (20, 2.0, 1.0), (99, 2.0, 1.0)],
)
def test_ramp_values(step, expect_beta, expect_scale):
    _, tc = _cfg(kl_beta=2.0, kl_anneal_steps=10, assoc_warmup_steps=20)
    kl_w, s = objective_weights(tc, jnp.int32(step))
    assert float(kl_w) == pytest.approx(expect_beta)
    assert float(s) == pytest.approx(expect_scale)


def test_ramp_counts_optimizer_updates_under_accumulation():
    # u = step // accum_steps: the ramp holds still within an accumulation
    # window and uses the same clock as the LR schedules.
    _, tc = _cfg(kl_anneal_steps=4, accum_steps=2)
    betas = [float(objective_weights(tc, jnp.int32(s))[0]) for s in range(10)]
    assert betas == pytest.approx([0, 0, 0.25, 0.25, 0.5, 0.5, 0.75, 0.75, 1, 1])


def test_negative_beta_rejected():
    _, tc = _cfg(kl_beta=-0.5)
    with pytest.raises(ValueError, match="kl_beta"):
        objective_weights(tc, jnp.int32(0))


# ---------------------------------------------------------------------------
# apply_objective_weights: objective algebra + gradient exactness
# ---------------------------------------------------------------------------


def test_static_beta_total_algebra():
    cfg, tc = _cfg(kl_beta=2.0)
    xs, eps = _data(cfg), _eps(cfg)
    state = init_train_state(cfg, tc)
    t0, m = assoc_mod.assoc_loss_fn(state.params, xs, cfg, eps=eps)
    t, m2 = apply_objective_weights(t0, m, cfg, tc, jnp.int32(0))
    manual = (
        m["recon_image"] + 2.0 * m["kl_image"]
        + m["recon_trajectory"] + 2.0 * m["kl_trajectory"]
        + cfg.assoc_lambda * m["assoc"]
    )
    np.testing.assert_allclose(float(t), float(manual), rtol=1e-6)
    assert float(m2["kl_beta_eff"]) == 2.0
    assert float(m2["assoc_scale_eff"]) == 1.0
    assert float(m2["total"]) == float(t)
    # Per-term metrics stay UNWEIGHTED.
    for k in ("kl_image", "kl_trajectory", "recon_image", "assoc"):
        assert float(m2[k]) == float(m[k])


def test_noop_at_defaults_is_identity():
    cfg, tc = _cfg()
    xs, eps = _data(cfg), _eps(cfg)
    state = init_train_state(cfg, tc)
    t0, m = assoc_mod.assoc_loss_fn(state.params, xs, cfg, eps=eps)
    t, m2 = apply_objective_weights(t0, m, cfg, tc, jnp.int32(3))
    assert t is t0 and m2 is m  # literally untouched, not recomputed


def test_grad_exactness_vs_manual_weighting():
    cfg, tc = _cfg(kl_beta=0.3, assoc_warmup_steps=8)
    xs, eps = _data(cfg), _eps(cfg)
    state = init_train_state(cfg, tc)
    step = jnp.int32(2)  # ramp s = 0.25

    def loss_knobs(p):
        t, m = assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps)
        t, _ = apply_objective_weights(t, m, cfg, tc, step)
        return t

    def loss_manual(p):
        _, m = assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps)
        return (
            m["recon_image"] + 0.3 * m["kl_image"]
            + m["recon_trajectory"] + 0.3 * m["kl_trajectory"]
            + 0.25 * cfg.assoc_lambda * m["assoc"]
        )

    g1 = jax.grad(loss_knobs)(state.params)
    g2 = jax.grad(loss_manual)(state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        g1, g2,
    )


def test_assoc_scale_equals_static_lambda():
    # Ramped λ at s=0.5 must gradient-match a config whose static
    # assoc_lambda is half — a cross-check through the static code path.
    import dataclasses

    cfg, tc = _cfg(assoc_warmup_steps=4)
    cfg_half = dataclasses.replace(cfg, assoc_lambda=cfg.assoc_lambda * 0.5)
    xs, eps = _data(cfg), _eps(cfg)
    state = init_train_state(cfg, tc)
    step = jnp.int32(2)

    def loss_ramped(p):
        t, m = assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps)
        return apply_objective_weights(t, m, cfg, tc, step)[0]

    def loss_static(p):
        return assoc_mod.assoc_loss_fn(p, xs, cfg_half, eps=eps)[0]

    g1 = jax.grad(loss_ramped)(state.params)
    g2 = jax.grad(loss_static)(state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g1, g2,
    )


@pytest.mark.parametrize("use_pallas", [True, "mega"])
def test_weighted_grads_match_jnp_path(use_pallas):
    # The rebuild-from-terms trick must be exactly as differentiable on
    # the Pallas paths (interpret mode here) as on the jnp path.
    cfg, tc = _cfg(kl_beta=1.7, assoc_warmup_steps=8)
    xs, eps = _data(cfg), _eps(cfg)
    state = init_train_state(cfg, tc)
    step = jnp.int32(4)  # s = 0.5

    def make_loss(up):
        def loss(p):
            t, m = assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas=up)
            return apply_objective_weights(t, m, cfg, tc, step)[0]
        return loss

    g_jnp = jax.grad(make_loss(False))(state.params)
    g_pal = jax.grad(make_loss(use_pallas))(state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
        g_jnp, g_pal,
    )


# ---------------------------------------------------------------------------
# End-to-end through the train step
# ---------------------------------------------------------------------------


def test_train_step_logs_ramp_and_trains():
    cfg, tc = _cfg(kl_anneal_steps=4, assoc_warmup_steps=4, steps_per_call=4)
    xs = _data(cfg)
    stacks = [jnp.broadcast_to(x, (4,) + x.shape) for x in xs]
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    state, metrics = step(state, stacks)
    # Scanned metrics stack per micro-step: the ramp must advance.
    np.testing.assert_allclose(
        np.asarray(metrics["kl_beta_eff"]), [0.0, 0.25, 0.5, 0.75], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(metrics["assoc_scale_eff"]), [0.0, 0.25, 0.5, 0.75], rtol=1e-6
    )
    assert np.all(np.isfinite(np.asarray(metrics["total"])))
    assert int(state.step) == 4


def test_default_step_metrics_have_no_ramp_keys():
    cfg, tc = _cfg()
    state = init_train_state(cfg, tc)
    _, metrics = make_train_step(cfg, tc)(state, _data(cfg))
    assert "kl_beta_eff" not in metrics and "assoc_scale_eff" not in metrics


def test_beta_zero_freezes_kl_direction():
    # With β=0 and λ·s=0 the update is driven by recon only: two inits
    # stepped with (β=0, warmup huge) vs a recon-only manual grad must
    # produce identical params.
    cfg, tc = _cfg(kl_beta=0.0, assoc_warmup_steps=10**6)
    xs = _data(cfg)
    state = init_train_state(cfg, tc)
    new_state, m = make_train_step(cfg, tc)(state, xs)
    assert float(m["kl_beta_eff"]) == 0.0
    # total must equal the recon sum exactly (KL and assoc weighted to 0).
    np.testing.assert_allclose(
        float(m["total"]),
        float(m["recon_image"] + m["recon_trajectory"]),
        rtol=1e-6,
    )
    assert int(new_state.step) == 1


def test_zero_layout_applies_annealing():
    # The ZeRO step body routes through the same shared helper.
    from vae_assoc_tpu.parallel import (
        init_zero_train_state,
        make_mesh,
        make_zero_train_step,
        shard_batch,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = make_mesh(4)
    cfg, tc = _cfg(kl_beta=2.0)
    xs = _data(cfg)
    zstate = init_zero_train_state(cfg, tc, mesh)
    zstep = make_zero_train_step(cfg, tc, mesh)
    _, zm = zstep(zstate, shard_batch(mesh, xs))

    state = init_train_state(cfg, tc)
    _, m = make_train_step(cfg, tc)(state, xs)
    # Same global batch, same seed: ε folding differs (per-shard streams),
    # so compare the weight plumbing, not the stochastic terms.
    assert float(zm["kl_beta_eff"]) == float(m["kl_beta_eff"]) == 2.0
    manual = (
        zm["recon_image"] + 2.0 * zm["kl_image"]
        + zm["recon_trajectory"] + 2.0 * zm["kl_trajectory"]
        + cfg.assoc_lambda * zm["assoc"]
    )
    np.testing.assert_allclose(float(zm["total"]), float(manual), rtol=1e-5)


def test_driver_anneal_flags_end_to_end(tmp_path):
    """--kl-beta/--kl-anneal-steps/--assoc-warmup-steps reach the
    TrainConfig and the ramp metrics land in the JSONL."""
    import os
    import subprocess
    import sys

    from vae_assoc_tpu.utils.logging import read_jsonl

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    metrics = tmp_path / "metrics.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "32", "--epochs", "2", "--kl-beta", "0.5",
         "--kl-anneal-steps", "4", "--assoc-warmup-steps", "4",
         "--metrics", str(metrics)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    recs = [r for r in read_jsonl(str(metrics)) if "kl_beta_eff" in r]
    assert recs, "ramp metrics missing from JSONL"
    betas = [r["kl_beta_eff"] for r in recs]
    assert betas[0] < betas[-1] <= 0.5 + 1e-6, betas
