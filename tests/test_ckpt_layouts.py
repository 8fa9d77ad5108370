"""Checkpoint layout portability: a checkpoint written under one
parallelism layout (DP-replicated, TP, FSDP) must restore under any other.

This is the production property behind "scaling is a config change": users
move between single-chip, DP, TP, and FSDP runs without converting
checkpoints. orbax stores the logical (global) arrays, so the sharding at
save time must be invisible at restore time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.parallel import (
    init_fsdp_train_state,
    make_fsdp_train_step,
    make_mesh,
    make_tp_train_step,
    shard_batch,
    shard_tp_batch,
)
from vae_assoc_tpu.parallel.fsdp import shard_fsdp_train_state
from vae_assoc_tpu.parallel.tp import shard_tp_train_state
from vae_assoc_tpu.train.step import init_train_state, make_train_step
from vae_assoc_tpu.utils import checkpoint as ckpt

N_DEV = 8


def tiny_cfg():
    arch = dict(
        n_input=24,
        n_z=4,
        n_hidden_recog_1=16,
        n_hidden_recog_2=16,
        n_hidden_gener_1=16,
        n_hidden_gener_2=16,
    )
    return AssocConfig(
        [
            ModalityConfig("image", arch, recon="bernoulli"),
            ModalityConfig("trajectory", dict(arch), recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )


def batches(rng, n=32):
    return [
        rng.uniform(0, 1, (n, 24)).astype(np.float32),
        rng.normal(size=(n, 24)).astype(np.float32),
    ]


def assert_states_equal(a, b):
    assert int(jax.device_get(a.step)) == int(jax.device_get(b.step))
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(a.opt_state), jax.tree.leaves(b.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_sharded_restore_single(tmp_path, rng):
    """Steps under FSDP → save → restore single-device: bit-identical
    logical state, and training continues."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32)
    mesh = make_mesh(N_DEV)
    state = init_fsdp_train_state(cfg, tc, mesh)
    step = make_fsdp_train_step(cfg, tc, mesh)
    for _ in range(2):
        state, _ = step(state, shard_batch(mesh, batches(rng)))
    ckpt.save(str(tmp_path / "c"), state)

    restored = ckpt.restore(str(tmp_path / "c"), init_train_state(cfg, tc))
    assert_states_equal(restored, state)
    _, m = make_train_step(cfg, tc)(restored, [jnp.asarray(x) for x in batches(rng)])
    assert np.isfinite(float(m["total"]))


def test_save_single_restore_into_tp_and_fsdp(tmp_path, rng):
    """Single-device checkpoint → restore → re-lay onto TP and FSDP meshes:
    the next step's loss matches the single-device continuation."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    for _ in range(2):
        state, _ = step(state, [jnp.asarray(x) for x in batches(rng)])
    ckpt.save(str(tmp_path / "c"), state)

    xs = batches(rng)
    _, m_ref = step(ckpt.restore(str(tmp_path / "c"), init_train_state(cfg, tc)),
                    [jnp.asarray(x) for x in xs])

    tp_mesh = make_mesh(N_DEV, model_axis="model", model_parallel=2)
    tp_state = shard_tp_train_state(
        tp_mesh, ckpt.restore(str(tmp_path / "c"), init_train_state(cfg, tc)), cfg, tc
    )
    _, m_tp = make_tp_train_step(cfg, tc, tp_mesh)(
        tp_state, shard_tp_batch(tp_mesh, xs)
    )
    np.testing.assert_allclose(float(m_ref["total"]), float(m_tp["total"]), rtol=2e-5)

    mesh = make_mesh(N_DEV)
    f_state = shard_fsdp_train_state(
        mesh, ckpt.restore(str(tmp_path / "c"), init_train_state(cfg, tc)), cfg, tc
    )
    _, m_f = make_fsdp_train_step(cfg, tc, mesh)(f_state, shard_batch(mesh, xs))
    np.testing.assert_allclose(float(m_ref["total"]), float(m_f["total"]), rtol=2e-5)


def test_tp_fsdp_layout_roundtrip(tmp_path, rng):
    """The round-3 combined TP×FSDP layout is checkpoint-portable both
    ways: single-device ckpt re-lays onto the combined mesh (next-step
    loss matches), and a ckpt written mid-TP×FSDP-run restores
    bit-identical on a single device."""
    from vae_assoc_tpu.parallel import make_tp_fsdp_train_step
    from vae_assoc_tpu.parallel.tp_fsdp import shard_tp_fsdp_train_state

    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    for _ in range(2):
        state, _ = step(state, [jnp.asarray(x) for x in batches(rng)])
    ckpt.save(str(tmp_path / "c"), state)

    xs = batches(rng)
    _, m_ref = step(
        ckpt.restore(str(tmp_path / "c"), init_train_state(cfg, tc)),
        [jnp.asarray(x) for x in xs],
    )

    mesh2 = make_mesh(N_DEV, model_axis="model", model_parallel=2)
    cf_state = shard_tp_fsdp_train_state(
        mesh2, ckpt.restore(str(tmp_path / "c"), init_train_state(cfg, tc)),
        cfg, tc,
    )
    cf_step = make_tp_fsdp_train_step(cfg, tc, mesh2)
    cf_state, m_cf = cf_step(cf_state, shard_tp_batch(mesh2, xs))
    np.testing.assert_allclose(
        float(m_ref["total"]), float(m_cf["total"]), rtol=2e-5
    )

    # And back: save the 2-D-sharded state, restore single-device.
    ckpt.save(str(tmp_path / "c2"), cf_state)
    restored = ckpt.restore(str(tmp_path / "c2"), init_train_state(cfg, tc))
    assert_states_equal(restored, cf_state)
    _, m = make_train_step(cfg, tc)(
        restored, [jnp.asarray(x) for x in batches(rng)]
    )
    assert np.isfinite(float(m["total"]))
