"""Data-parallel correctness on the 8-virtual-device CPU mesh.

The JAX idiom for validating multi-device sharding without a cluster
(SURVEY.md §4.3): `--xla_force_host_platform_device_count=8` (set in
conftest), then assert (1) the shard_map DP gradient equals the
single-device gradient on the same global batch with the same ε, (2) the
full DP train step runs, keeps params replicated/synced, and learns, and
(3) batches actually stay sharded across devices.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.parallel import (
    dp_train_loop,
    init_dp_train_state,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)

N_DEV = 8


def tiny_cfg(k=2):
    archs = [
        dict(
            n_input=24,
            n_z=4,
            n_hidden_recog_1=16,
            n_hidden_recog_2=16,
            n_hidden_gener_1=16,
            n_hidden_gener_2=16,
        )
        for _ in range(k)
    ]
    mods = [
        ModalityConfig("image", archs[0], recon="bernoulli"),
    ]
    if k == 2:
        mods.append(ModalityConfig("trajectory", archs[1], recon="gaussian"))
    return AssocConfig(mods, assoc_lambda=0.5)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == N_DEV, "conftest must fake 8 CPU devices"
    return make_mesh(N_DEV)


def test_dp_gradient_matches_single_device(mesh, rng):
    """psum'd per-shard gradients == single-device gradient, same global ε."""
    cfg = tiny_cfg()
    params = assoc_mod.init_assoc(jax.random.key(0), cfg)
    B = 32
    xs = [
        jnp.asarray(rng.uniform(0, 1, (B, 24)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 24)).astype(np.float32)),
    ]
    eps = [
        jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32)) for _ in range(2)
    ]

    def loss(p, xs, eps):
        return assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps)[0]

    g_ref = jax.grad(loss)(params, xs, eps)

    def shard_loss_grad(p, xs, eps):
        # vma-native DP: pmean the loss, then grad — the backward pass
        # all-reduces cotangents of the invariant params automatically.
        return jax.grad(
            lambda p: jax.lax.pmean(loss(p, list(xs), list(eps)), "data")
        )(p)

    g_dp = jax.jit(
        jax.shard_map(
            shard_loss_grad,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
        )
    )(params, xs, eps)

    flat_ref, _ = jax.tree.flatten(g_ref)
    flat_dp, _ = jax.tree.flatten(g_dp)
    for a, b in zip(flat_ref, flat_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_dp_step_runs_and_stays_synced(mesh, rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=64, learning_rate=1e-3)
    state = init_dp_train_state(cfg, tc, mesh)
    step_fn = make_dp_train_step(cfg, tc, mesh)
    xs = shard_batch(
        mesh,
        [
            rng.uniform(0, 1, (64, 24)).astype(np.float32),
            rng.normal(size=(64, 24)).astype(np.float32),
        ],
    )
    losses = []
    for _ in range(20):
        state, metrics = step_fn(state, xs)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0], f"DP training did not reduce loss: {losses}"
    # Params replicated: every device shard holds identical values.
    w = state.params["modalities"][0]["recog"]["h1"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    assert int(state.step) == 20


def test_dp_scan_steps_per_call(mesh, rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32, steps_per_call=4)
    state = init_dp_train_state(cfg, tc, mesh)
    step_fn = make_dp_train_step(cfg, tc, mesh)
    xs = shard_batch(
        mesh,
        [
            rng.uniform(0, 1, (4, 32, 24)).astype(np.float32),
            rng.normal(size=(4, 32, 24)).astype(np.float32),
        ],
        leading_scan_axis=True,
    )
    state, metrics = step_fn(state, xs)
    assert metrics["total"].shape == (4,)
    assert int(state.step) == 4


def test_batches_stay_sharded(mesh, rng):
    """Inputs must be split over devices, not gathered (SURVEY.md §4.3)."""
    x = rng.normal(size=(64, 24)).astype(np.float32)
    (xd,) = shard_batch(mesh, [x])
    assert len(xd.addressable_shards) == N_DEV
    for s in xd.addressable_shards:
        assert s.data.shape == (64 // N_DEV, 24)
    np.testing.assert_array_equal(np.asarray(xd), x)


def test_dp_train_loop_learns(mesh, rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=64, steps_per_call=2, learning_rate=3e-3)
    data = [
        rng.uniform(0, 1, (256, 24)).astype(np.float32),
        rng.normal(size=(256, 24)).astype(np.float32),
    ]
    state, history = dp_train_loop(cfg, tc, data, mesh, epochs=8)
    assert history[-1]["total"] < history[0]["total"]
    assert "samples_per_sec_per_chip" in history[-1]


def test_mesh_2d_hook():
    mesh = make_mesh(8, model_axis="model", model_parallel=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)


def test_dp_gradient_matches_single_device_megakernel(mesh, rng):
    """The tower-megakernel loss path (use_pallas='mega') under shard_map:
    psum'd per-shard gradients == single-device gradient, same global ε.

    Coverage note (be precise about what this exercises): off-TPU, the
    megakernel wrapper detects shard_map and routes to its identical-math
    jnp fallback (kernels.mlp._shardmap_interpret) — so on the CPU test
    mesh this validates the fallback semantics plus the vma/psum grad
    plumbing, NOT the compiled pallas_call boundary. The real
    shard_map × Mosaic composition is executed on TPU by
    scripts/smoke_dp_tpu.py, which asserts the compiled HLO contains the
    Pallas custom-calls."""
    cfg = tiny_cfg()
    params = assoc_mod.init_assoc(jax.random.key(1), cfg)
    B = 32
    xs = [
        jnp.asarray(rng.uniform(0, 1, (B, 24)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 24)).astype(np.float32)),
    ]
    eps = [
        jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32)) for _ in range(2)
    ]

    def loss(p, xs, eps):
        return assoc_mod.assoc_loss_fn(p, list(xs), cfg, eps=list(eps),
                                       use_pallas="mega")[0]

    g_ref = jax.grad(loss)(params, xs, eps)

    def dp_grad(p, xs, eps):
        g = jax.grad(lambda p: jax.lax.pmean(loss(p, xs, eps), "data"))(p)
        # Kernel custom-VJPs return per-shard grads (vma still varying):
        # reduce them exactly as train.step._one_step does.
        return jax.tree.map(
            lambda g, p: jax.lax.psum(g, tuple(jax.typeof(g).vma - jax.typeof(p).vma))
            if jax.typeof(g).vma - jax.typeof(p).vma
            else g,
            g,
            p,
        )

    g_dp = jax.jit(
        jax.shard_map(
            dp_grad,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
        )
    )(params, xs, eps)

    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_dp_gradient_with_fused_loss_kernel(mesh, rng):
    """use_pallas=True (fused mlp + loss kernels) under shard_map + grad.

    Regression: the fused-loss shard_map fallback gate used to live inside
    the custom_vjp PRIMAL, which jax.grad bypasses (it traces the fwd rule
    directly) — so grad-under-shard_map on CPU evaluated the interpret
    pallas_call body under vma typing and crashed on the first mixed
    varying/invariant primitive. The gate now lives in a plain wrapper.
    Equality vs the single-device gradient doubles as fallback-math parity.
    """
    cfg = tiny_cfg()
    params = assoc_mod.init_assoc(jax.random.key(3), cfg)
    B = 32
    xs = [
        jnp.asarray(rng.uniform(0, 1, (B, 24)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 24)).astype(np.float32)),
    ]
    eps = [
        jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32)) for _ in range(2)
    ]

    def loss(p, xs, eps):
        return assoc_mod.assoc_loss_fn(p, list(xs), cfg, eps=list(eps),
                                       use_pallas=True)[0]

    g_ref = jax.grad(loss)(params, xs, eps)

    def dp_grad(p, xs, eps):
        return jax.grad(
            lambda p: jax.lax.pmean(loss(p, xs, eps), "data")
        )(p)

    g_dp = jax.jit(
        jax.shard_map(
            dp_grad,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
        )
    )(params, xs, eps)

    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_dp_step_with_megakernel_learns(mesh, rng):
    """DP train step with use_pallas='mega' learns. Same coverage note as
    test_dp_gradient_matches_single_device_megakernel: on the CPU mesh the
    kernels run their jnp shard_map fallback; the compiled Mosaic path
    under a mesh is covered on TPU by scripts/smoke_dp_tpu.py."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=64, use_pallas="mega")
    state = init_dp_train_state(cfg, tc, mesh)
    step = make_dp_train_step(cfg, tc, mesh)
    hist = []
    for i in range(12):
        xs = shard_batch(
            mesh,
            [
                rng.uniform(0, 1, (64, 24)).astype(np.float32),
                rng.normal(size=(64, 24)).astype(np.float32),
            ],
        )
        state, m = step(state, xs)
        hist.append(float(jax.device_get(m["total"])))
    assert np.isfinite(hist).all() and hist[-1] < hist[0]
