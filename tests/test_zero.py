"""shard_map ZeRO (parallel/zero.py) correctness on the 8-virtual-device CPU
mesh: sharded state + full-kernel compute, trajectory-equal to plain DP.

What CPU can and cannot cover (docs/PARALLEL.md): under shard_map on CPU the
Pallas wrappers route to their identical-math jnp twins, so the use_pallas
legs here exercise the fallback math plus the gather/scatter plumbing; the
real Mosaic lowering under this layout runs in `scripts/smoke_dp_tpu.py
--zero` on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.parallel import (
    gather_zero_train_state,
    init_dp_train_state,
    init_zero_train_state,
    make_dp_train_step,
    make_mesh,
    make_zero_train_step,
    shard_batch,
    shard_zero_train_state,
    zero_train_loop,
)
from vae_assoc_tpu.train.step import init_train_state

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


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == N_DEV, "conftest must fake 8 CPU devices"
    return make_mesh(N_DEV)


def _batches(rng, n=32, d=24):
    return [
        rng.uniform(0, 1, (n, d)).astype(np.float32),
        rng.normal(size=(n, d)).astype(np.float32),
    ]


def _run_pair(mesh, rng, cfg, tc, steps=3):
    """Run the DP step and the ZeRO step on identical batches; return both
    final states (ZeRO gathered back to full arrays) and metric lists."""
    dp_state = init_dp_train_state(cfg, tc, mesh)
    dp_step = make_dp_train_step(cfg, tc, mesh)
    z_state = init_zero_train_state(cfg, tc, mesh)
    z_step = make_zero_train_step(cfg, tc, mesh)
    dp_ms, z_ms = [], []
    for _ in range(steps):
        xs = _batches(rng)
        dp_state, m = dp_step(dp_state, shard_batch(mesh, xs))
        dp_ms.append(m)
        z_state, m = z_step(z_state, shard_batch(mesh, xs))
        z_ms.append(m)
    return dp_state, gather_zero_train_state(z_state, cfg, tc), dp_ms, z_ms


def test_zero_matches_dp_trajectory(mesh, rng):
    """Same ε stream (both fold the shard index), same gradient semantics —
    the two layouts must produce the same training trajectory."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    dp_state, z_full, dp_ms, z_ms = _run_pair(mesh, rng, cfg, tc)
    for dm, zm in zip(dp_ms, z_ms):
        np.testing.assert_allclose(
            float(dm["total"]), float(zm["total"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            float(dm["grad_norm"]), float(zm["grad_norm"]), rtol=2e-5
        )
    for a, b in zip(
        jax.tree.leaves(dp_state.params), jax.tree.leaves(z_full.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-6
        )


@pytest.mark.parametrize("use_pallas", [True, "mega"])
def test_zero_matches_dp_on_kernel_paths(mesh, rng, use_pallas):
    """The whole point of the layout: the fused-kernel paths run under ZeRO.
    On CPU the wrappers fall back to their jnp twins (module docstring), so
    this validates the all-gather→kernel→reduce-scatter plumbing; Mosaic
    execution is proven on TPU by smoke_dp_tpu.py --zero."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3, use_pallas=use_pallas)
    dp_state, z_full, dp_ms, z_ms = _run_pair(mesh, rng, cfg, tc, steps=2)
    for dm, zm in zip(dp_ms, z_ms):
        np.testing.assert_allclose(
            float(dm["total"]), float(zm["total"]), rtol=2e-5
        )
    for a, b in zip(
        jax.tree.leaves(dp_state.params), jax.tree.leaves(z_full.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-6
        )


def test_zero_state_actually_sharded(mesh):
    """Every param and Adam-moment leaf is a flat vector with disjoint
    1/8-size per-device shards — per-chip state memory really drops."""
    cfg = tiny_cfg()
    state = init_zero_train_state(cfg, TrainConfig(batch_size=32), mesh)
    w = state.params["modalities"][0]["recog"]["h1"]["w"]  # 24*16=384 flat
    assert w.shape == (384,)
    assert {s.data.shape for s in w.addressable_shards} == {(48,)}
    b = state.params["modalities"][0]["recog"]["out_mean"]["b"]  # 4 → pad 8
    assert b.shape == (8,)
    assert {s.data.shape for s in b.addressable_shards} == {(1,)}
    mu_w = state.opt_state[0].mu["modalities"][0]["recog"]["h1"]["w"]
    assert {s.data.shape for s in mu_w.addressable_shards} == {(48,)}
    nu_b = state.opt_state[0].nu["modalities"][0]["recog"]["out_mean"]["b"]
    assert {s.data.shape for s in nu_b.addressable_shards} == {(1,)}


def test_zero_gather_shard_roundtrip_bitwise(mesh):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32)
    full = init_train_state(cfg, tc)
    back = gather_zero_train_state(
        shard_zero_train_state(mesh, full, cfg, tc), cfg, tc
    )
    for tree_a, tree_b in ((full.params, back.params),
                           (full.opt_state, back.opt_state)):
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(full.step) == int(back.step)
    np.testing.assert_array_equal(
        jax.random.key_data(full.rng), jax.random.key_data(back.rng)
    )


def test_zero_step_emits_zero_collectives(mesh, rng):
    """The compiled step must contain the textbook ZeRO pair: weight
    all-gathers and gradient reduce-scatters."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32)
    state = init_zero_train_state(cfg, tc, mesh)
    xs = shard_batch(mesh, _batches(rng))
    hlo = (
        make_zero_train_step(cfg, tc, mesh)
        .lower(state, xs)
        .compile()
        .as_text()
    )
    assert "all-gather" in hlo, "expected weight all-gathers in the step HLO"
    assert "reduce-scatter" in hlo, "expected gradient reduce-scatters"


def test_zero_clip_and_accum_match_dp(mesh, rng):
    """grad_clip_norm (psum'd global norm) and accum_steps compose: the
    ZeRO trajectory still equals DP's, which clips the full gradient with
    stock optax after its all-reduce."""
    cfg = tiny_cfg()
    tc = TrainConfig(
        batch_size=32, learning_rate=1e-3, grad_clip_norm=0.05, accum_steps=2
    )
    dp_state, z_full, dp_ms, z_ms = _run_pair(mesh, rng, cfg, tc, steps=4)
    for dm, zm in zip(dp_ms, z_ms):
        np.testing.assert_allclose(
            float(dm["grad_norm"]), float(zm["grad_norm"]), rtol=2e-5
        )
    for a, b in zip(
        jax.tree.leaves(dp_state.params), jax.tree.leaves(z_full.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-6
        )


def test_zero_conv_tower(mesh, rng):
    """Flat-vector sharding never looks at array structure, so conv towers
    (HWIO kernels, dims the mesh size does not divide) shard too — a layout
    GSPMD FSDP can only replicate falls out for free."""
    arch = dict(
        n_input=784,
        n_z=4,
        n_hidden_recog_1=32,
        n_hidden_recog_2=32,
        n_hidden_gener_1=32,
        n_hidden_gener_2=32,
    )
    cfg = AssocConfig(
        [ModalityConfig("image", arch, recon="bernoulli", encoder="conv")]
    )
    tc = TrainConfig(batch_size=16, learning_rate=1e-3)
    dp_state = init_dp_train_state(cfg, tc, mesh)
    dp_step = make_dp_train_step(cfg, tc, mesh)
    z_state = init_zero_train_state(cfg, tc, mesh)
    z_step = make_zero_train_step(cfg, tc, mesh)
    xs = [rng.uniform(0, 1, (16, 784)).astype(np.float32)]
    dp_state, dm = dp_step(dp_state, shard_batch(mesh, xs))
    z_state, zm = z_step(z_state, shard_batch(mesh, xs))
    np.testing.assert_allclose(float(dm["total"]), float(zm["total"]), rtol=2e-5)
    # conv kernel [3,3,1,32]: 288 elems → 8×[36] disjoint flat shards.
    w = z_state.params["modalities"][0]["recog"]["conv1"]["w"]
    assert {s.data.shape for s in w.addressable_shards} == {(36,)}
    z_full = gather_zero_train_state(z_state, cfg, tc)
    for a, b in zip(
        jax.tree.leaves(dp_state.params), jax.tree.leaves(z_full.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-6
        )


def test_zero_scan_steps_match_single_calls(mesh, rng):
    """steps_per_call=2 (on-device scan) equals two steps_per_call=1 calls."""
    cfg = tiny_cfg()
    tc1 = TrainConfig(batch_size=32, learning_rate=1e-3)
    tc2 = TrainConfig(batch_size=32, learning_rate=1e-3, steps_per_call=2)
    xs = _batches(rng, n=64)

    s1 = init_zero_train_state(cfg, tc1, mesh)
    step1 = make_zero_train_step(cfg, tc1, mesh)
    for i in range(2):
        batch = [x[i * 32 : (i + 1) * 32] for x in xs]
        s1, _ = step1(s1, shard_batch(mesh, batch))

    s2 = init_zero_train_state(cfg, tc2, mesh)
    step2 = make_zero_train_step(cfg, tc2, mesh)
    stacked = [x.reshape(2, 32, -1) for x in xs]
    s2, m = step2(s2, shard_batch(mesh, stacked, leading_scan_axis=True))
    assert m["total"].shape == (2,)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_zero_checkpoint_resume_continuity(mesh, rng, tmp_path):
    """Gather → orbax save → restore → re-shard reproduces the
    uninterrupted run exactly (the layout is checkpoint-portable)."""
    from vae_assoc_tpu.utils import checkpoint as ckpt

    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    step = make_zero_train_step(cfg, tc, mesh)
    batches = [_batches(rng) for _ in range(4)]

    state = init_zero_train_state(cfg, tc, mesh)
    for xs in batches:
        state, _ = step(state, shard_batch(mesh, xs))
    want = gather_zero_train_state(state, cfg, tc)

    state = init_zero_train_state(cfg, tc, mesh)
    for xs in batches[:2]:
        state, _ = step(state, shard_batch(mesh, xs))
    ckpt.save(str(tmp_path), gather_zero_train_state(state, cfg, tc))
    restored = ckpt.restore(str(tmp_path), init_train_state(cfg, tc))
    state = shard_zero_train_state(mesh, restored, cfg, tc)
    for xs in batches[2:]:
        state, _ = step(state, shard_batch(mesh, xs))
    got = gather_zero_train_state(state, cfg, tc)

    assert int(got.step) == int(want.step) == 4
    for a, b in zip(jax.tree.leaves(want.params), jax.tree.leaves(got.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_zero_loop_learns(mesh, rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=3e-3)
    data = _batches(rng, n=128)
    history = []
    _, hist = zero_train_loop(
        cfg,
        tc,
        data,
        mesh,
        epochs=6,
        on_metrics=lambda e, m: history.append(m["total"]),
    )
    totals = [h["total"] for h in hist]
    assert totals[-1] < totals[0], f"no learning: {totals}"


def test_zero_rejects_non_data_mesh():
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32)
    mesh2d = make_mesh(8, model_axis="model", model_parallel=2)
    with pytest.raises(ValueError, match="1-D data mesh"):
        make_zero_train_step(cfg, tc, mesh2d)
