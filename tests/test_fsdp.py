"""FSDP (ZeRO-style param + optimizer-state sharding) correctness on the
8-virtual-device CPU mesh — the properties `parallel/fsdp.py` promises."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.parallel import (
    fsdp_param_specs,
    fsdp_train_loop,
    init_fsdp_train_state,
    make_fsdp_train_step,
    make_mesh,
    shard_batch,
)
from vae_assoc_tpu.train.step import init_train_state, make_train_step

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


def test_fsdp_step_matches_single_device(mesh, rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    ref_state = init_train_state(cfg, tc)
    ref_step = make_train_step(cfg, tc)
    f_state = init_fsdp_train_state(cfg, tc, mesh)
    f_step = make_fsdp_train_step(cfg, tc, mesh)

    for _ in range(3):
        xs = [
            rng.uniform(0, 1, (32, 24)).astype(np.float32),
            rng.normal(size=(32, 24)).astype(np.float32),
        ]
        ref_state, ref_m = ref_step(ref_state, [jnp.asarray(x) for x in xs])
        f_state, f_m = f_step(f_state, shard_batch(mesh, xs))
        np.testing.assert_allclose(float(ref_m["total"]), float(f_m["total"]), rtol=2e-5)

    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(f_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-6)


def test_fsdp_state_actually_sharded(mesh):
    """Weights and Adam moments hold disjoint per-device slices, so per-chip
    state memory really drops by the mesh size."""
    cfg = tiny_cfg()
    state = init_fsdp_train_state(cfg, TrainConfig(batch_size=32), mesh)
    w = state.params["modalities"][0]["recog"]["h1"]["w"]  # [24, 16]
    assert {s.data.shape for s in w.addressable_shards} == {(3, 16)}
    mu_w = state.opt_state[0].mu["modalities"][0]["recog"]["h1"]["w"]
    assert {s.data.shape for s in mu_w.addressable_shards} == {(3, 16)}
    # Decoder input layer [n_z=4, 16]: the *larger* dim (16) is the sharded one.
    g1 = state.params["modalities"][0]["gener"]["h1"]["w"]
    assert {s.data.shape for s in g1.addressable_shards} == {(4, 2)}


def test_fsdp_shardings_preserved_by_step(mesh, rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32)
    state = init_fsdp_train_state(cfg, tc, mesh)
    specs = fsdp_param_specs(cfg, N_DEV)

    def check(params):
        jax.tree.map(
            lambda x, s: _assert_sharded(x, NamedSharding(mesh, s)), params, specs
        )

    xs = shard_batch(
        mesh,
        [
            rng.uniform(0, 1, (32, 24)).astype(np.float32),
            rng.normal(size=(32, 24)).astype(np.float32),
        ],
    )
    state, _ = make_fsdp_train_step(cfg, tc, mesh)(state, xs)
    check(state.params)
    check(state.opt_state[0].mu)
    check(state.opt_state[0].nu)


def _assert_sharded(x, sharding):
    assert x.sharding.is_equivalent_to(sharding, x.ndim), (
        f"{x.shape}: {x.sharding} != {sharding}"
    )


def test_fsdp_step_emits_collectives(mesh, rng):
    """Sharded weights must be gathered/reduced somewhere in the step."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32)
    state = init_fsdp_train_state(cfg, tc, mesh)
    xs = shard_batch(
        mesh,
        [
            rng.uniform(0, 1, (32, 24)).astype(np.float32),
            rng.normal(size=(32, 24)).astype(np.float32),
        ],
    )
    from vae_assoc_tpu.train.step import make_train_step as mts

    base = mts(cfg, tc, jit=False)
    hlo = jax.jit(lambda s, xs: base(s, list(xs))).lower(state, xs).compile().as_text()
    assert any(c in hlo for c in ("all-gather", "all-reduce", "reduce-scatter")), (
        "FSDP step compiled without any collective"
    )


def test_fsdp_train_loop_learns(mesh, rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=64, steps_per_call=2, learning_rate=3e-3)
    data = [
        rng.uniform(0, 1, (256, 24)).astype(np.float32),
        rng.normal(size=(256, 24)).astype(np.float32),
    ]
    state, history = fsdp_train_loop(cfg, tc, data, mesh, epochs=8)
    assert history[-1]["total"] < history[0]["total"]


def test_fsdp_misuse_fails_loudly(mesh):
    cfg = tiny_cfg()
    with pytest.raises(ValueError, match="[Pp]allas"):
        make_fsdp_train_step(cfg, TrainConfig(batch_size=8, use_pallas=True), mesh)
    # encoder="conv" is supported since round 3; the Pallas-kernel conv
    # model path ("conv_pallas") still rejects loudly.
    pallas_conv_cfg = AssocConfig(
        [ModalityConfig("image", dict(
            n_input=784, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
            n_hidden_gener_1=16, n_hidden_gener_2=16), encoder="conv_pallas")],
        assoc_lambda=0.0,
    )
    with pytest.raises(ValueError, match="conv"):
        init_fsdp_train_state(pallas_conv_cfg, TrainConfig(batch_size=8), mesh)


def _conv_cfg():
    """Config-4 shape joint model: conv image tower + MLP trajectory."""
    img_arch = dict(
        n_input=784, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
        n_hidden_gener_1=16, n_hidden_gener_2=16,
    )
    traj_arch = dict(
        n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
        n_hidden_gener_1=16, n_hidden_gener_2=16,
    )
    return AssocConfig(
        [
            ModalityConfig("image", img_arch, recon="bernoulli", encoder="conv"),
            ModalityConfig("trajectory", traj_arch, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )


def test_fsdp_conv_tower_matches_single_device(mesh, rng):
    """Round 3: conv towers have FSDP sharding rules (channel/dense-dim
    splits) — scaled conv users keep sharding. Trajectory equality vs the
    single-device step, and the conv kernels really shard."""
    cfg = _conv_cfg()
    tc = TrainConfig(batch_size=16, learning_rate=1e-3)
    ref_state = init_train_state(cfg, tc)
    ref_step = make_train_step(cfg, tc)
    f_state = init_fsdp_train_state(cfg, tc, mesh)
    f_step = make_fsdp_train_step(cfg, tc, mesh)

    w = f_state.params["modalities"][0]["recog"]["conv1"]["w"]  # [3,3,1,32]
    assert {s.data.shape for s in w.addressable_shards} == {(3, 3, 1, 4)}
    d = f_state.params["modalities"][0]["recog"]["dense"]["w"]  # [3136, 16]
    assert {s.data.shape for s in d.addressable_shards} == {(392, 16)}

    for _ in range(2):
        xs = [
            rng.uniform(0, 1, (16, 784)).astype(np.float32),
            rng.normal(size=(16, 24)).astype(np.float32),
        ]
        ref_state, ref_m = ref_step(ref_state, [jnp.asarray(x) for x in xs])
        f_state, f_m = f_step(f_state, shard_batch(mesh, xs))
        np.testing.assert_allclose(
            float(ref_m["total"]), float(f_m["total"]), rtol=2e-5
        )
