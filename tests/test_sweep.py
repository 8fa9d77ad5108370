"""Vectorized multi-model training (train/sweep.py): E models in one
vmapped program. The reference trains one model per script invocation
(SURVEY.md §3.1); the sweep axis (seed, learning_rate, assoc_lambda) is
rebuild-added production surface.

Core contracts tested here:
- a sweep member equals the standalone run with the same seed (vmap only
  reassociates the batched contractions — tight allclose, not bitwise);
- per-model lr with the baseline value is BITWISE-equal to the plain
  path (lr·(−t) == −(lr·t), see step._one_step);
- per-model λ equals a standalone run with cfg(assoc_lambda=λ);
- select_model yields a plain TrainState that flows through eval and
  orbax checkpointing unchanged.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.train import eval as eval_mod
from vae_assoc_tpu.train import sweep as sw
from vae_assoc_tpu.train.step import init_train_state, make_train_step
from vae_assoc_tpu.utils.logging import read_jsonl

TINY = dict(
    n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
    n_hidden_gener_1=16, n_hidden_gener_2=16,
)


def tiny_cfg(assoc_lambda=0.5):
    return AssocConfig(
        [ModalityConfig("image", TINY, recon="bernoulli"),
         ModalityConfig("trajectory", TINY, recon="gaussian")],
        assoc_lambda=assoc_lambda,
    )


def _xs(rng, n=32):
    return [rng.uniform(0, 1, (n, 24)).astype(np.float32),
            rng.normal(size=(n, 24)).astype(np.float32)]


def _leaves_allclose(a, b, **kw):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_member_matches_standalone_run(rng):
    """Each sweep member's trajectory equals the standalone run with the
    same seed: identical init, identical ε stream, identical updates (up
    to vmap's batched-contraction reassociation)."""
    cfg, tc = tiny_cfg(), TrainConfig(batch_size=16)
    xs = _xs(rng, 16)
    state = sw.init_sweep_state(cfg, tc, [3, 7])
    step = sw.make_sweep_step(cfg, tc)
    for _ in range(4):
        state, metrics = step(state, xs)
    for i, seed in enumerate((3, 7)):
        ref = init_train_state(cfg, tc, jax.random.key(seed))
        f = make_train_step(cfg, tc)
        for _ in range(4):
            ref, ref_m = f(ref, xs)
        np.testing.assert_allclose(
            float(metrics["total"][i]), float(ref_m["total"]), rtol=1e-5
        )
        _leaves_allclose(
            sw.select_model(state, i).params, ref.params,
            rtol=1e-4, atol=1e-6,
        )


def test_vary_lr_bitwise_vs_plain_and_matches_standalone(rng):
    """lr scaling contract: the vary-lr member running the BASELINE lr is
    bitwise-identical to the plain sweep path, and a member with a
    different lr matches the standalone run using that lr."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=16, learning_rate=1e-3)
    xs = _xs(rng, 16)

    plain = sw.make_sweep_step(cfg, tc)(sw.init_sweep_state(cfg, tc, [0, 1]), xs)
    lrs = jnp.asarray([1e-3, 5e-3], jnp.float32)
    vary = sw.make_sweep_step(cfg, tc, vary_lr=True)(
        sw.init_sweep_state(cfg, tc, [0, 1]), xs, lrs
    )
    for pl, vl in zip(
        jax.tree.leaves(sw.select_model(plain[0], 0).params),
        jax.tree.leaves(sw.select_model(vary[0], 0).params),
    ):
        np.testing.assert_array_equal(np.asarray(pl), np.asarray(vl))

    ref = init_train_state(cfg, tc, jax.random.key(1))
    tc_fast = TrainConfig(batch_size=16, learning_rate=5e-3)
    ref, _ = make_train_step(cfg, tc_fast)(ref, xs)
    _leaves_allclose(
        sw.select_model(vary[0], 1).params, ref.params, rtol=1e-4, atol=1e-6
    )


def test_vary_assoc_matches_standalone_config(rng):
    """A member with runtime λ equals the standalone run whose cfg bakes
    that λ in statically — gradients through the rebuilt objective are
    exact (total is linear in the logged terms)."""
    tc = TrainConfig(batch_size=16)
    cfg = tiny_cfg(assoc_lambda=0.5)
    xs = _xs(rng, 16)
    lams = jnp.asarray([0.5, 4.0], jnp.float32)
    state = sw.init_sweep_state(cfg, tc, [0, 1])
    step = sw.make_sweep_step(cfg, tc, vary_assoc=True)
    for _ in range(3):
        state, metrics = step(state, xs, lams)
    ref = init_train_state(tiny_cfg(4.0), tc, jax.random.key(1))
    f = make_train_step(tiny_cfg(4.0), tc)
    for _ in range(3):
        ref, ref_m = f(ref, xs)
    np.testing.assert_allclose(
        float(metrics["total"][1]), float(ref_m["total"]), rtol=1e-5
    )
    _leaves_allclose(
        sw.select_model(state, 1).params, ref.params, rtol=1e-4, atol=1e-6
    )


def test_sweep_with_grad_clip_and_accumulation(rng):
    """The production optimizer options flow through the vmapped step:
    MultiSteps accumulators and clip state carry the model axis, params
    hold still on non-boundary micro-steps, and a member matches its
    standalone accumulating run."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=16, grad_clip_norm=1.0, accum_steps=2)
    xs = _xs(rng, 16)
    state = sw.init_sweep_state(cfg, tc, [0, 1])
    step = sw.make_sweep_step(cfg, tc)
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, _ = step(state, xs)  # micro-step 1 of 2: params must hold still
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(p0))
    state, _ = step(state, xs)  # boundary: one Adam update applies
    assert not np.array_equal(np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(p0))
    ref = init_train_state(cfg, tc, jax.random.key(1))
    f = make_train_step(cfg, tc)
    for _ in range(2):
        ref, _ = f(ref, xs)
    _leaves_allclose(
        sw.select_model(state, 1).params, ref.params, rtol=1e-4, atol=1e-6
    )


def test_vary_lr_rejects_schedules():
    cfg, tc = tiny_cfg(), TrainConfig(
        batch_size=16, lr_schedule="cosine", decay_steps=10
    )
    with pytest.raises(ValueError, match="constant"):
        sw.make_sweep_step(cfg, tc, vary_lr=True)


def test_extras_validation(rng):
    cfg, tc = tiny_cfg(), TrainConfig(batch_size=16)
    xs = _xs(rng, 16)
    state = sw.init_sweep_state(cfg, tc, [0, 1, 2])
    step = sw.make_sweep_step(cfg, tc, vary_lr=True)
    with pytest.raises(ValueError, match="hyperparameter array"):
        step(state, xs)  # missing lrs
    with pytest.raises(ValueError, match=r"shape \(3,\)"):
        step(state, xs, jnp.ones((2,), jnp.float32))
    with pytest.raises(ValueError, match="duplicate seeds"):
        sw.init_sweep_state(cfg, tc, [0, 0])


def test_sweep_loop_scan_and_selection(rng):
    """sweep_loop with steps_per_call>1: every model learns, history carries
    the model axis, and select_model's winner flows through eval + orbax."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=16, steps_per_call=2)
    data = _xs(rng, 128)
    state, history = sw.sweep_loop(
        cfg, tc, data, seeds=[0, 1, 2], epochs=6,
        assoc_lambdas=[0.5, 1.0, 2.0],
    )
    assert history[0]["total"].shape == (3,)
    assert np.all(history[-1]["total"] < history[0]["total"])
    best = int(np.argmin(history[-1]["total"]))
    winner = sw.select_model(state, best)
    m = eval_mod.eval_metrics(winner.params, data, cfg, batch_size=64)
    assert np.isfinite(m["image->trajectory"])

    from vae_assoc_tpu.utils import checkpoint as ckpt
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ckpt.save(d, winner)
        restored = ckpt.restore(d, init_train_state(cfg, tc))
        _leaves_allclose(restored.params, winner.params, rtol=0, atol=0)


def test_sweep_forces_xla_path(rng):
    """use_pallas configs run the sweep on the XLA path (module docstring):
    the step must trace and run without kernel errors, matching the plain
    jnp sweep exactly."""
    cfg = tiny_cfg()
    xs = _xs(rng, 16)
    s_pl, m_pl = sw.make_sweep_step(cfg, TrainConfig(batch_size=16, use_pallas="mega"))(
        sw.init_sweep_state(cfg, TrainConfig(batch_size=16, use_pallas="mega"), [0, 1]), xs
    )
    s_np, m_np = sw.make_sweep_step(cfg, TrainConfig(batch_size=16))(
        sw.init_sweep_state(cfg, TrainConfig(batch_size=16), [0, 1]), xs
    )
    np.testing.assert_array_equal(
        np.asarray(m_pl["total"]), np.asarray(m_np["total"])
    )


def test_conv_modality_sweep(rng):
    """The conv image branch (config-4 family) under the sweep: vmapped
    conv towers trace and learn (XLA batches the per-model filters), and a
    member matches its standalone run. use_pallas configs route to the XLA
    path (module docstring), so this is the config-4 spelling verbatim."""
    from vae_assoc_tpu.configs import baseline_config

    cfg, tc = baseline_config(4, batch_size=16)
    assert tc.use_pallas  # the declared config; _sweep_tc routes it to XLA
    xs = [rng.uniform(0, 1, (16, 784)).astype(np.float32),
          rng.normal(size=(16, 200)).astype(np.float32)]
    state = sw.init_sweep_state(cfg, tc, [0, 1])
    step = sw.make_sweep_step(cfg, tc)
    first = last = None
    for _ in range(4):
        state, m = step(state, xs)
        if first is None:
            first = np.asarray(m["total"])
        last = np.asarray(m["total"])
    assert np.all(last < first), (first, last)

    import dataclasses

    tc_ref = dataclasses.replace(tc, use_pallas=False)
    ref = init_train_state(cfg, tc_ref, jax.random.key(1))
    f = make_train_step(cfg, tc_ref)
    for _ in range(4):
        ref, ref_m = f(ref, xs)
    np.testing.assert_allclose(
        float(last[1]), float(ref_m["total"]), rtol=1e-5
    )


def test_sweep_state_checkpoints_whole(rng, tmp_path):
    """The full E-model sweep state is one pytree: orbax saves/restores it
    unchanged (all E members), so a sweep can kill-and-resume like any
    single-model run."""
    from vae_assoc_tpu.utils import checkpoint as ckpt

    cfg, tc = tiny_cfg(), TrainConfig(batch_size=16)
    xs = _xs(rng, 16)
    state = sw.init_sweep_state(cfg, tc, [0, 1, 2])
    state, _ = sw.make_sweep_step(cfg, tc)(state, xs)
    d = str(tmp_path / "sweep_ckpt")
    ckpt.save(d, state)
    template = sw.init_sweep_state(cfg, tc, [0, 1, 2])
    restored = ckpt.restore(d, template)
    # Typed PRNG keys can't pass through np.asarray — compare key data.
    as_data = lambda s: s._replace(rng=jax.random.key_data(s.rng))
    _leaves_allclose(as_data(restored), as_data(state), rtol=0, atol=0)
    # Restored state trains on: one more step advances every member.
    restored, m = sw.make_sweep_step(cfg, tc)(restored, xs)
    np.testing.assert_array_equal(np.asarray(restored.step), [2, 2, 2])


# -- DP composition ------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh():
    from vae_assoc_tpu.parallel import make_mesh

    return make_mesh(len(jax.devices()))


def test_dp_sweep_gradient_matches_single_device(mesh, rng):
    """shard_map(vmap(grad)) == vmap(grad) on the same global batch, same
    explicit ε per model: the DP×sweep composition's psum'd per-shard
    gradients must equal each model's single-device gradient."""
    from jax.sharding import PartitionSpec as P

    cfg = tiny_cfg()
    E, B = 3, 32
    params = jax.vmap(
        lambda k: assoc_mod.init_assoc(k, cfg)
    )(jnp.stack([jax.random.key(s) for s in (0, 1, 2)]))
    xs = [
        jnp.asarray(rng.uniform(0, 1, (B, 24)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 24)).astype(np.float32)),
    ]
    eps = [
        jnp.asarray(rng.normal(size=(E, B, 4)).astype(np.float32))
        for _ in range(2)
    ]

    def loss(p, xs, eps):
        return assoc_mod.assoc_loss_fn(p, list(xs), cfg, eps=list(eps))[0]

    g_ref = jax.vmap(jax.grad(loss), in_axes=(0, None, 0))(params, xs, eps)

    def dp_grads(p, xs, eps):
        g = jax.vmap(
            lambda p, eps: jax.grad(
                lambda p: jax.lax.pmean(loss(p, xs, eps), "data")
            )(p),
            in_axes=(0, 0),
        )(p, eps)
        return g

    g_dp = jax.jit(
        jax.shard_map(
            dp_grads,
            mesh=mesh,
            in_specs=(P(), P("data"), P(None, "data")),
            out_specs=P(),
        )
    )(params, xs, eps)

    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )


def test_dp_sweep_step_learns_with_per_model_lambda(mesh, rng):
    """The full DP×sweep train step (scan + vary_assoc) over the mesh:
    every model's loss decreases, params stay replicated across shards,
    and per-model steps advance in lockstep."""
    from vae_assoc_tpu.parallel.mesh import shard_batch

    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32, steps_per_call=2)
    state = sw.init_dp_sweep_state(cfg, tc, mesh, [0, 1, 2])
    step = sw.make_dp_sweep_step(cfg, tc, mesh, vary_assoc=True)
    lams = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)
    first = last = None
    for i in range(8):
        xs = shard_batch(
            mesh,
            [rng.uniform(0, 1, (2, 32, 24)).astype(np.float32),
             rng.normal(size=(2, 32, 24)).astype(np.float32)],
            leading_scan_axis=True,
        )
        state, metrics = step(state, xs, lams)
        totals = np.asarray(metrics["total"]).mean(axis=0)  # [N,E] -> [E]
        if first is None:
            first = totals
        last = totals
    assert totals.shape == (3,)
    assert np.all(last < first), (first, last)
    w = state.params["modalities"][0]["recog"]["h1"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    np.testing.assert_array_equal(np.asarray(state.step), [16, 16, 16])

    # The winner extracts to a plain single-model state, as on one device.
    winner = sw.select_model(state, int(np.argmin(last)))
    assert winner.params["modalities"][0]["recog"]["h1"]["w"].ndim == 2


# -- driver surface ------------------------------------------------------------


def _driver_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    return env


def test_driver_sweep_end_to_end(tmp_path):
    """--sweep-seeds with per-model lambdas and held-out selection: per-model
    JSONL records, winner announced by val_total, winner checkpointed."""
    metrics = tmp_path / "m.jsonl"
    ckpt_dir = tmp_path / "ckpt"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "192",
         "--batch-size", "32", "--epochs", "3", "--sweep-seeds", "3",
         "--sweep-lambdas", "0.5", "1.0", "2.0", "--val-frac", "0.25",
         "--metrics", str(metrics), "--ckpt-dir", str(ckpt_dir)],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "sweep: 3 models in one vmapped program" in out.stdout
    assert "sweep winner: model" in out.stdout and "by val_total" in out.stdout
    recs = read_jsonl(str(metrics))
    train_recs = [r for r in recs if "grad_norm" in r]
    assert sorted({int(r["model"]) for r in train_recs}) == [0, 1, 2]
    assert len(train_recs) == 9  # 3 models x 3 epochs
    val_recs = [r for r in recs if "val_total" in r]
    assert len(val_recs) == 3 and all("model" in r for r in val_recs)
    assert ckpt_dir.is_dir()
    assert "checkpoint saved" in out.stdout


def test_sweep_loop_throughput_keys(rng):
    """samples_per_sec is the PER-MODEL rate (comparable with a
    single-model train_loop run); the E-model aggregate is the separate
    sweep_model_samples_per_sec key — per-model JSONL records must never
    read E× inflated."""
    cfg, tc = tiny_cfg(), TrainConfig(batch_size=16)
    data = _xs(rng, 64)
    _, history = sw.sweep_loop(cfg, tc, data, seeds=[0, 1, 2, 3], epochs=1)
    h = history[0]
    np.testing.assert_allclose(
        h["sweep_model_samples_per_sec"], 4 * h["samples_per_sec"]
    )


def test_driver_sweep_lambda_selection_is_lambda_independent(tmp_path):
    """Without --val-frac, a λ sweep must NOT select by `total` (a small λ
    down-weights its own assoc term, so argmin(total) would just pick the
    smallest λ): the driver scores by the λ-independent recon+KL terms."""
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "32", "--epochs", "2", "--sweep-seeds", "2",
         "--sweep-lambdas", "0.01", "10.0"],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "by final train recon+KL (lambda-independent)" in out.stdout


def test_driver_sweep_flag_validation(tmp_path):
    base = [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
            "--config", "3"]
    out = subprocess.run(
        base + ["--sweep-seeds", "2", "--fused"],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode != 0 and "incompatible with --fused" in out.stderr
    out = subprocess.run(
        base + ["--sweep-seeds", "3", "--sweep-lrs", "1e-3", "1e-2"],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode != 0 and "one value per model" in out.stderr
    out = subprocess.run(
        base + ["--sweep-lrs", "1e-3"],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode != 0 and "require --sweep-seeds" in out.stderr
    out = subprocess.run(
        base + ["--sweep-seeds", "2", "--epochs", "0"],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode != 0 and "--epochs >= 1" in out.stderr
    out = subprocess.run(
        base + ["--sweep-seeds", "2", "--sweep-lrs", "1e-3", "1e-2",
                "--lr-schedule", "cosine", "--decay-steps", "10"],
        env=_driver_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode != 0 and "constant LR schedule" in out.stderr
