"""Training integration tests (SURVEY.md §4.4): overfit-a-tiny-subset runs."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_assoc_tpu.configs import (
    AssocConfig,
    ModalityConfig,
    TrainConfig,
    default_image_arch,
    default_traj_arch,
)
from vae_assoc_tpu.train import init_train_state, make_train_step, train_loop


def tiny_cfg(assoc_lambda=1.0):
    img = ModalityConfig("image", default_image_arch(n_z=4, hidden=32))
    traj = ModalityConfig(
        "trajectory", default_traj_arch(n_timesteps=8, n_z=4, hidden=24), recon="gaussian"
    )
    return AssocConfig([img, traj], assoc_lambda=assoc_lambda)


def tiny_data(rng, n=64):
    imgs = (rng.random((n, 784)) > 0.7).astype(np.float32)
    trajs = rng.normal(size=(n, 16)).astype(np.float32)
    return [imgs, trajs]


def test_train_step_decreases_loss(rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    data = tiny_data(rng, 32)
    xs = [jnp.array(d) for d in data]
    first = None
    for i in range(60):
        state, metrics = step(state, xs)
        if first is None:
            first = float(metrics["total"])
    last = float(metrics["total"])
    assert last < first, f"loss did not decrease: {first} -> {last}"
    assert int(state.step) == 60


def test_multi_step_scan_matches_loop(rng):
    """steps_per_call=4 scan == 4 sequential single steps (same data order)."""
    cfg = tiny_cfg()
    data = tiny_data(rng, 32)
    xs1 = [jnp.array(d) for d in data]

    tc1 = TrainConfig(batch_size=32, steps_per_call=1)
    s1 = init_train_state(cfg, tc1)
    f1 = make_train_step(cfg, tc1)
    for _ in range(4):
        s1, m1 = f1(s1, xs1)

    tc4 = TrainConfig(batch_size=32, steps_per_call=4)
    s4 = init_train_state(cfg, tc4)
    f4 = make_train_step(cfg, tc4)
    stacked = [jnp.broadcast_to(x, (4,) + x.shape) for x in xs1]
    s4, m4 = f4(s4, stacked)

    assert int(s4.step) == int(s1.step) == 4
    # Identical init/RNG/data ⇒ identical final params.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(m4["total"][-1]), float(m1["total"]), rtol=2e-5)


def test_train_loop_overfits_tiny_subset(rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=16, learning_rate=2e-3)
    data = tiny_data(rng, 64)
    state, history = train_loop(cfg, tc, data, epochs=20, shuffle=True)
    assert history[-1]["total"] < history[0]["total"] * 0.9
    assert history[-1]["samples_per_sec"] > 0


def test_donation_and_purity(rng):
    """The jitted step is pure: same inputs → same outputs across fresh states."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=8)
    data = [jnp.array(d[:8]) for d in tiny_data(rng, 8)]
    s_a = init_train_state(cfg, tc)
    s_b = init_train_state(cfg, tc)
    f = make_train_step(cfg, tc)
    _, m_a = f(s_a, data)
    _, m_b = f(s_b, data)
    assert float(m_a["total"]) == float(m_b["total"])
