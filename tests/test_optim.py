"""Production optimizer options (TrainConfig lr_schedule / warmup_steps /
decay_steps / grad_clip_norm / accum_steps): schedule values, clipping
semantics, accumulation boundaries, config round-trip, checkpoint resume,
and composition with the FSDP/TP GSPMD layouts (the generic
`shard_opt_state_like` must re-lay whatever state tree the optimizer
builds)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_assoc_tpu.configs import (
    AssocConfig,
    ModalityConfig,
    TrainConfig,
    config_from_dict,
    config_to_dict,
)
from vae_assoc_tpu.train.step import (
    init_train_state,
    lr_schedule_fn,
    make_optimizer,
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


def _leaves(params):
    return [np.asarray(x) for x in jax.tree.leaves(params)]


# -- schedules ---------------------------------------------------------------

def test_lr_schedule_constant_stays_plain_float():
    """Default config must keep the plain-float LR: the optimizer state
    tree (and so round-2 checkpoints) stays byte-identical."""
    assert lr_schedule_fn(TrainConfig()) == TrainConfig().learning_rate


def test_lr_schedule_warmup_cosine_values():
    tc = TrainConfig(learning_rate=1e-2, lr_schedule="cosine",
                     warmup_steps=10, decay_steps=100, lr_end_factor=0.1)
    s = lr_schedule_fn(tc)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 5e-3, rtol=1e-6)   # mid-warmup
    np.testing.assert_allclose(float(s(10)), 1e-2, rtol=1e-6)  # peak
    np.testing.assert_allclose(float(s(110)), 1e-3, rtol=1e-5)  # floor
    assert float(s(10)) > float(s(60)) > float(s(110))  # monotone decay


def test_lr_schedule_validation():
    with pytest.raises(ValueError, match="decay_steps"):
        lr_schedule_fn(TrainConfig(lr_schedule="cosine"))
    with pytest.raises(ValueError, match="unknown lr_schedule"):
        lr_schedule_fn(TrainConfig(lr_schedule="polynomial"))


def test_cosine_schedule_trains(rng):
    cfg = _cfg()
    tc = TrainConfig(batch_size=8, lr_schedule="cosine", warmup_steps=3,
                     decay_steps=100)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = _batches(rng)
    first = None
    for _ in range(20):
        state, m = step(state, xs)
        first = first if first is not None else float(m["total"])
    assert float(m["total"]) < first


# -- clipping ----------------------------------------------------------------

def test_grad_clip_matches_reference_chain():
    """make_optimizer(clip) is exactly chain(clip_by_global_norm, adam)."""
    tc = TrainConfig(grad_clip_norm=0.5)
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    grads = {"w": jnp.full((4, 3), 7.0), "b": jnp.full((3,), -2.0)}
    ours, ref = make_optimizer(tc), optax.chain(
        optax.clip_by_global_norm(0.5),
        optax.adam(tc.learning_rate, b1=tc.adam_b1, b2=tc.adam_b2,
                   eps=tc.adam_eps),
    )
    u1, _ = ours.update(grads, ours.init(params), params)
    u2, _ = ref.update(grads, ref.init(params), params)
    for a, b in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_norm_metric_stays_raw_under_clip(rng):
    """The logged grad_norm is the PRE-clip norm — the observability
    signal clipping exists to monitor."""
    cfg = _cfg()
    tc = TrainConfig(batch_size=8, grad_clip_norm=1e-6)
    state = init_train_state(cfg, tc)
    state, m = make_train_step(cfg, tc)(state, _batches(rng))
    assert float(m["grad_norm"]) > 1.0  # raw norm, orders above the clip


# -- accumulation ------------------------------------------------------------

def test_accum_updates_only_on_boundary(rng):
    cfg = _cfg()
    tc = TrainConfig(batch_size=8, accum_steps=4)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = _batches(rng)
    init = _leaves(state.params)
    for i in range(1, 9):
        state, _ = step(state, xs)
        changed = any(not np.array_equal(a, b)
                      for a, b in zip(init, _leaves(state.params)))
        assert changed == (i >= 4), f"micro-step {i}: changed={changed}"
    assert int(state.step) == 8  # step counts micro-steps


def test_accum_composes_with_fused_scan(rng):
    """steps_per_call scan over micro-steps: 8 scanned micro-steps with
    accum 4 == 2 optimizer updates, same params as the eager loop."""
    cfg = _cfg()
    tc_scan = TrainConfig(batch_size=8, accum_steps=4, steps_per_call=8)
    tc_eager = TrainConfig(batch_size=8, accum_steps=4)
    xs = _batches(rng)
    stacks = [jnp.broadcast_to(x, (8,) + x.shape) for x in xs]

    s_scan = init_train_state(cfg, tc_scan)
    s_scan, _ = make_train_step(cfg, tc_scan)(s_scan, stacks)

    s_eager = init_train_state(cfg, tc_eager)
    step = make_train_step(cfg, tc_eager)
    for _ in range(8):
        s_eager, _ = step(s_eager, xs)
    for a, b in zip(_leaves(s_scan.params), _leaves(s_eager.params)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


# -- config + checkpoint round-trips ----------------------------------------

def test_config_roundtrip_new_fields():
    cfg = _cfg()
    tc = TrainConfig(lr_schedule="cosine", warmup_steps=7, decay_steps=77,
                     lr_end_factor=0.2, grad_clip_norm=2.5, accum_steps=3)
    _, tc2 = config_from_dict(config_to_dict(cfg, tc))
    assert tc2 == tc


def test_config_back_compat_old_dicts_load():
    """Round-2 model_config.json files predate the new fields — they must
    load with the defaults (fixed-LR Adam, no clip, no accumulation)."""
    d = config_to_dict(_cfg(), TrainConfig())
    for k in ("lr_schedule", "warmup_steps", "decay_steps",
              "lr_end_factor", "grad_clip_norm", "accum_steps"):
        del d["train"][k]
    _, tc = config_from_dict(d)
    assert tc == TrainConfig()


def test_checkpoint_resume_mid_accumulation(rng, tmp_path):
    """Orbax save/restore of the MultiSteps state mid-accumulation: the
    restored run's params track the uninterrupted run exactly (the grad
    accumulator and mini_step counter survive the round-trip)."""
    from vae_assoc_tpu.utils import checkpoint as ckpt

    cfg = _cfg()
    tc = TrainConfig(batch_size=8, accum_steps=3)
    step = make_train_step(cfg, tc)
    xs = _batches(rng)

    state = init_train_state(cfg, tc)
    state, _ = step(state, xs)  # mini_step 1 of 3: accumulator non-zero
    ckpt.save(str(tmp_path), state)
    cont, _ = step(state, xs)
    cont, _ = step(cont, xs)  # boundary: params updated

    restored = ckpt.restore(str(tmp_path), init_train_state(cfg, tc))
    resumed, _ = step(restored, xs)
    resumed, _ = step(resumed, xs)
    for a, b in zip(_leaves(cont.params), _leaves(resumed.params)):
        np.testing.assert_array_equal(a, b)


# -- composition with the GSPMD layouts --------------------------------------

def test_fsdp_shards_accumulators_and_trains(rng):
    """FSDP with schedule+clip+accum: `shard_opt_state_like` must re-lay
    the MultiSteps tree — accumulators sharded exactly like their params,
    counts replicated — and the step must run and learn."""
    from vae_assoc_tpu.parallel import mesh as mesh_mod
    from vae_assoc_tpu.parallel.fsdp import (
        init_fsdp_train_state,
        make_fsdp_train_step,
    )

    cfg = _cfg()
    tc = TrainConfig(batch_size=16, lr_schedule="cosine", warmup_steps=2,
                     decay_steps=50, grad_clip_norm=5.0, accum_steps=2)
    mesh = mesh_mod.make_mesh(8)
    state = init_fsdp_train_state(cfg, tc, mesh)
    for a, p in zip(jax.tree.leaves(state.opt_state.acc_grads),
                    jax.tree.leaves(state.params)):
        assert a.sharding == p.sharding
    step = make_fsdp_train_step(cfg, tc, mesh)
    xs = mesh_mod.shard_batch(mesh, _batches(rng, 16))
    first = None
    for _ in range(12):
        state, m = step(state, xs)
        first = first if first is not None else float(m["total"])
    assert np.isfinite(float(m["total"])) and float(m["total"]) < first


def test_tp_with_schedule_and_clip(rng):
    """TP layout with a schedule: the extra ScaleByScheduleState leaves
    replicate; the step runs on a (data=4, model=2) mesh."""
    from vae_assoc_tpu.parallel import mesh as mesh_mod
    from vae_assoc_tpu.parallel.tp import (
        init_tp_train_state,
        make_tp_train_step,
        shard_tp_batch,
    )

    cfg = _cfg()
    tc = TrainConfig(batch_size=16, lr_schedule="cosine", warmup_steps=1,
                     decay_steps=50, grad_clip_norm=5.0, use_pallas=False)
    mesh = mesh_mod.make_mesh(8, model_axis="model", model_parallel=2)
    state = init_tp_train_state(cfg, tc, mesh)
    step = make_tp_train_step(cfg, tc, mesh)
    xs = shard_tp_batch(mesh, _batches(rng, 16))
    for _ in range(3):
        state, m = step(state, xs)
    assert np.isfinite(float(m["total"]))
