"""EMA weight averaging (TrainConfig.ema_decay): exact math vs a manual
trajectory, zero-cost default (opt_state tree unchanged when off), boundary
semantics under gradient accumulation, checkpoint round-trip, and layout
composition (FSDP GSPMD sharding, shard_map ZeRO gather) — the EMA lives in
the optimizer state as a params-shaped leaf, so every re-layout must treat
it exactly like Adam's moments."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import (
    AssocConfig,
    ModalityConfig,
    TrainConfig,
    config_from_dict,
    config_to_dict,
)
from vae_assoc_tpu.train.step import (
    EmaState,
    ema_params,
    eval_params,
    init_train_state,
    make_train_step,
)

TINY = dict(
    n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
    n_hidden_gener_1=16, n_hidden_gener_2=16,
)


def _cfg():
    return AssocConfig(
        [ModalityConfig("image", TINY, recon="bernoulli"),
         ModalityConfig("trajectory", TINY, recon="gaussian")],
        assoc_lambda=0.5,
    )


def _batches(rng, n=8):
    return [jnp.asarray(rng.uniform(0, 1, (n, 24)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(n, 24)).astype(np.float32))]


def _np_leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def _find_ema_states(opt_state):
    leaves = jax.tree.leaves(
        opt_state, is_leaf=lambda s: isinstance(s, EmaState)
    )
    return [s for s in leaves if isinstance(s, EmaState)]


def test_ema_matches_manual_trajectory(rng):
    """Debiased EMA after N steps equals the hand-computed average of the
    post-update param trajectory."""
    d = 0.9
    cfg = _cfg()
    tc = TrainConfig(batch_size=8, ema_decay=d)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = _batches(rng)
    manual = [np.zeros_like(x) for x in _np_leaves(state.params)]
    for t in range(1, 6):
        state, _ = step(state, xs)
        manual = [d * e + (1 - d) * p
                  for e, p in zip(manual, _np_leaves(state.params))]
        got = _np_leaves(ema_params(tc, state.opt_state))
        corr = 1.0 - d ** t
        for g, m in zip(got, manual):
            np.testing.assert_allclose(g, m / corr, rtol=1e-6, atol=1e-7)
    # eval_params returns the debiased EMA once updates have run, and the
    # EMA genuinely differs from the live params.
    ev = _np_leaves(eval_params(tc, state))
    for g, e in zip(got, ev):
        np.testing.assert_array_equal(g, e)
    assert any(not np.allclose(a, b)
               for a, b in zip(ev, _np_leaves(state.params)))


def test_ema_off_keeps_opt_state_tree():
    """ema_decay=0 (the default) must not change the optimizer state tree:
    existing checkpoints restore unchanged and no EmaState appears."""
    cfg = _cfg()
    s_off = init_train_state(cfg, TrainConfig())
    s_on = init_train_state(cfg, TrainConfig(ema_decay=0.99))
    assert not _find_ema_states(s_off.opt_state)
    assert len(_find_ema_states(s_on.opt_state)) == 1
    base = jax.tree.structure(
        init_train_state(cfg, TrainConfig()).opt_state
    )
    assert jax.tree.structure(s_off.opt_state) == base


def test_ema_params_none_when_off():
    cfg = _cfg()
    tc = TrainConfig()
    state = init_train_state(cfg, tc)
    assert ema_params(tc, state.opt_state) is None
    # eval_params falls back to the live params (same objects).
    assert eval_params(tc, state) is state.params


def test_eval_params_before_first_update_falls_back():
    """count == 0: the raw EMA is the zero tree, so eval_params must return
    the live params instead of zeros."""
    cfg = _cfg()
    tc = TrainConfig(ema_decay=0.999)
    state = init_train_state(cfg, tc)
    ev = eval_params(tc, state)
    for a, b in zip(_np_leaves(ev), _np_leaves(state.params)):
        np.testing.assert_array_equal(a, b)


def test_ema_advances_only_on_accumulation_boundary(rng):
    """With accum_steps=3 the EMA stage sits inside MultiSteps: its count
    advances once per optimizer update, and the average tracks the params
    actually applied at each boundary."""
    d = 0.8
    cfg = _cfg()
    tc = TrainConfig(batch_size=8, accum_steps=3, ema_decay=d)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = _batches(rng)
    counts, boundary_params = [], []
    for i in range(1, 7):
        state, _ = step(state, xs)
        counts.append(int(_find_ema_states(state.opt_state)[0].count))
        if i % 3 == 0:
            boundary_params.append(_np_leaves(state.params))
    assert counts == [0, 0, 1, 1, 1, 2]
    manual = [np.zeros_like(x) for x in boundary_params[0]]
    for bp in boundary_params:
        manual = [d * e + (1 - d) * p for e, p in zip(manual, bp)]
    corr = 1.0 - d ** len(boundary_params)
    for g, m in zip(_np_leaves(ema_params(tc, state.opt_state)), manual):
        np.testing.assert_allclose(g, m / corr, rtol=1e-6, atol=1e-7)


def test_ema_checkpoint_roundtrip(rng, tmp_path):
    from vae_assoc_tpu.utils import checkpoint as ckpt

    cfg = _cfg()
    tc = TrainConfig(batch_size=8, ema_decay=0.95)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = _batches(rng)
    for _ in range(3):
        state, _ = step(state, xs)
    ckpt.save(str(tmp_path), state)
    restored = ckpt.restore(str(tmp_path), init_train_state(cfg, tc))
    for a, b in zip(_np_leaves(ema_params(tc, state.opt_state)),
                    _np_leaves(ema_params(tc, restored.opt_state))):
        np.testing.assert_array_equal(a, b)


def test_ema_config_roundtrip_and_back_compat():
    cfg = _cfg()
    tc = TrainConfig(ema_decay=0.999)
    _, tc2 = config_from_dict(config_to_dict(cfg, tc))
    assert tc2 == tc
    d = config_to_dict(cfg, TrainConfig())
    del d["train"]["ema_decay"]  # round-3-and-earlier snapshot
    _, tc3 = config_from_dict(d)
    assert tc3 == TrainConfig()


def test_ema_invalid_decay_rejected():
    from vae_assoc_tpu.train.step import make_optimizer

    with pytest.raises(ValueError, match="ema_decay"):
        make_optimizer(TrainConfig(ema_decay=1.0))


def test_ema_rejected_with_per_model_lrs():
    from vae_assoc_tpu.train.sweep import make_sweep_step

    with pytest.raises(ValueError, match="ema_decay"):
        make_sweep_step(_cfg(), TrainConfig(ema_decay=0.9), vary_lr=True)


def test_ema_shards_like_params_under_fsdp(rng):
    """FSDP layout: the EMA accumulator is a params-shaped opt-state leaf,
    so `shard_opt_state_like` must give it its param's sharding; the step
    must then run and keep the EMA finite."""
    from vae_assoc_tpu.parallel import mesh as mesh_mod
    from vae_assoc_tpu.parallel.fsdp import (
        init_fsdp_train_state,
        make_fsdp_train_step,
    )

    cfg = _cfg()
    tc = TrainConfig(batch_size=16, ema_decay=0.9, use_pallas=False)
    mesh = mesh_mod.make_mesh(8)
    state = init_fsdp_train_state(cfg, tc, mesh)
    es = _find_ema_states(state.opt_state)[0]
    for e, p in zip(jax.tree.leaves(es.ema), jax.tree.leaves(state.params)):
        assert e.sharding == p.sharding
    step = make_fsdp_train_step(cfg, tc, mesh)
    xs = mesh_mod.shard_batch(mesh, _batches(rng, 16))
    for _ in range(2):
        state, m = step(state, xs)
    got = _np_leaves(ema_params(tc, state.opt_state))
    assert all(np.all(np.isfinite(g)) for g in got)
    assert any(np.any(g != 0) for g in got)


def test_ema_zero_layout_matches_dp(rng):
    """shard_map ZeRO: the flat-sharded EMA gathers back to the plain-DP
    EMA after the same batches (the EMA of shards is the shard of the
    EMA — elementwise; both layouts draw identical per-shard ε streams)."""
    from vae_assoc_tpu.parallel import (
        gather_zero_train_state,
        init_dp_train_state,
        init_zero_train_state,
        make_dp_train_step,
        make_mesh,
        make_zero_train_step,
        shard_batch,
    )

    cfg = _cfg()
    tc = TrainConfig(batch_size=32, ema_decay=0.9, use_pallas=False)
    mesh = make_mesh(8)
    z_state = init_zero_train_state(cfg, tc, mesh)
    z_step = make_zero_train_step(cfg, tc, mesh)
    dp_state = init_dp_train_state(cfg, tc, mesh)
    dp_step = make_dp_train_step(cfg, tc, mesh)

    for _ in range(3):
        xs = _batches(rng, 32)
        z_state, _ = z_step(z_state, shard_batch(mesh, xs))
        dp_state, _ = dp_step(dp_state, shard_batch(mesh, xs))
    z_full = gather_zero_train_state(z_state, cfg, tc)
    for a, b in zip(_np_leaves(ema_params(tc, z_full.opt_state)),
                    _np_leaves(ema_params(tc, dp_state.opt_state))):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
