"""TrainConfig.remat — per-tower `jax.checkpoint` rematerialization.

The knob must be semantically invisible (same losses, same gradients,
same training trajectory — remat only changes WHAT the backward pass
saves vs recomputes) while actually being present in the compiled
program (a `remat` call in the jaxpr). Coverage:

- gradient equality vs the non-remat step, jnp and composable-Pallas
  paths, deep towers and conditional models;
- the jaxpr contains the checkpoint exactly when enabled;
- multi-step training trajectories match;
- DP shard_map composition on the 8-virtual-device mesh;
- driver flag plumbing (--remat) incl. the --pipeline loud reject.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.train.step import init_train_state, make_train_step


def deep_arch(depth, hidden, n_in, n_z=6):
    d = dict(n_input=n_in, n_z=n_z)
    for k in range(1, depth + 1):
        d[f"n_hidden_recog_{k}"] = hidden
        d[f"n_hidden_gener_{k}"] = hidden
    return d


def deep_cfg(depth=4, hidden=24, n_cond=0):
    return AssocConfig(
        [
            ModalityConfig(
                "image", deep_arch(depth, hidden, 20), recon="bernoulli",
                n_cond=n_cond,
            ),
            ModalityConfig(
                "trajectory", deep_arch(depth, hidden, 14), recon="gaussian",
                n_cond=n_cond,
            ),
        ],
        assoc_lambda=1.5,
    )


def _batches(rng, cfg, b=16):
    xs = [
        rng.uniform(0, 1, (b, m.arch["n_input"])).astype(np.float32)
        if m.recon == "bernoulli"
        else rng.normal(size=(b, m.arch["n_input"])).astype(np.float32)
        for m in cfg.modalities
    ]
    if cfg.n_cond > 0:
        xs.append(rng.integers(0, cfg.n_cond, (b,)).astype(np.int32))
    return xs


def _grad_fn(cfg, *, remat, use_pallas=False):
    def f(params, xs, key):
        total, _ = assoc_mod.assoc_loss_fn(
            params, xs, cfg, key=key, use_pallas=use_pallas, remat=remat
        )
        return total

    return jax.grad(f)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_remat_grads_equal(rng, use_pallas):
    """remat changes what the backward saves, not what it computes: the
    gradients match the non-remat step exactly (same ops, same ε)."""
    cfg = deep_cfg()
    tc = TrainConfig(batch_size=16)
    state = init_train_state(cfg, tc)
    xs = _batches(rng, cfg)
    key = jax.random.key(7)
    g0 = jax.jit(_grad_fn(cfg, remat=False, use_pallas=use_pallas))(
        state.params, xs, key
    )
    g1 = jax.jit(_grad_fn(cfg, remat=True, use_pallas=use_pallas))(
        state.params, xs, key
    )
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_remat_conditional_grads_equal(rng):
    cfg = deep_cfg(n_cond=5)
    tc = TrainConfig(batch_size=16)
    state = init_train_state(cfg, tc)
    xs = _batches(rng, cfg)
    key = jax.random.key(3)
    g0 = jax.jit(_grad_fn(cfg, remat=False))(state.params, xs, key)
    g1 = jax.jit(_grad_fn(cfg, remat=True))(state.params, xs, key)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_remat_present_in_jaxpr(rng):
    """The checkpoint is real: the traced grad contains a remat call when
    (and only when) the knob is on."""
    cfg = deep_cfg(depth=3)
    tc = TrainConfig(batch_size=8)
    state = init_train_state(cfg, tc)
    xs = _batches(rng, cfg, b=8)
    key = jax.random.key(0)
    on = str(jax.make_jaxpr(_grad_fn(cfg, remat=True))(state.params, xs, key))
    off = str(jax.make_jaxpr(_grad_fn(cfg, remat=False))(state.params, xs, key))
    assert "remat" in on
    assert "remat" not in off


def test_remat_training_trajectory(rng):
    """Multi-step trajectories match: TrainConfig.remat threads through
    make_train_step (and its lru_cache keys on it)."""
    cfg = deep_cfg()
    xs_seq = [_batches(rng, cfg) for _ in range(3)]
    finals = []
    for remat in (False, True):
        tc = TrainConfig(batch_size=16, learning_rate=1e-3, remat=remat)
        state = init_train_state(cfg, tc)
        step = make_train_step(cfg, tc)
        for xs in xs_seq:
            state, m = step(state, xs)
        finals.append((jax.device_get(state.params), jax.device_get(m)))
    np.testing.assert_allclose(finals[0][1]["total"], finals[1][1]["total"],
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(finals[0][0]), jax.tree.leaves(finals[1][0])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_remat_dp_shard_map(rng):
    """remat composes with the DP shard_map step: same trajectory as the
    non-remat DP step on the same sharded batches."""
    from vae_assoc_tpu.parallel import (
        init_dp_train_state,
        make_dp_train_step,
        make_mesh,
        shard_batch,
    )

    cfg = deep_cfg()
    mesh = make_mesh(4)
    xs_seq = [_batches(rng, cfg, b=32) for _ in range(2)]
    finals = []
    for remat in (False, True):
        tc = TrainConfig(batch_size=32, learning_rate=1e-3, remat=remat)
        state = init_dp_train_state(cfg, tc, mesh)
        step = make_dp_train_step(cfg, tc, mesh)
        for xs in xs_seq:
            state, m = step(state, shard_batch(mesh, xs))
        finals.append(jax.device_get(m))
    np.testing.assert_allclose(finals[0]["total"], finals[1]["total"],
                               rtol=1e-6)
    np.testing.assert_allclose(finals[0]["grad_norm"], finals[1]["grad_norm"],
                               rtol=1e-5)


def test_driver_remat_flag(tmp_path):
    """--remat end-to-end in a subprocess; --remat × --pipeline rejects."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "64",
         "--batch-size", "32", "--epochs", "2", "--depth", "4",
         "--hidden", "32", "--remat",
         "--metrics", str(tmp_path / "m.jsonl")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--epochs", "1", "--remat", "--pipeline", "2"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode != 0
    assert "no tower boundary" in out.stderr
