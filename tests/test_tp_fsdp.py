"""Combined TP × FSDP layout correctness on the 8-virtual-device CPU mesh
— the properties `parallel/tp_fsdp.py` promises: Megatron model-axis
splits AND ZeRO data-axis splits in one spec tree, single-device-equal
training, both collective families in the compiled step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.parallel import (
    init_tp_fsdp_train_state,
    make_mesh,
    make_tp_fsdp_train_step,
    shard_tp_batch,
    tp_fsdp_param_specs,
    tp_fsdp_train_loop,
)
from vae_assoc_tpu.train.step import init_train_state, make_train_step

N_DEV = 8
MP = 2  # (data=4, model=2) mesh


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
    return make_mesh(N_DEV, model_axis="model", model_parallel=MP)


def test_specs_compose_both_axes(mesh):
    """h1 is split over BOTH axes (2-D shard), h2 row-parallel + data on the
    output dim, heads data-sharded — not replicated like TP alone."""
    specs = tp_fsdp_param_specs(tiny_cfg(), N_DEV // MP)
    t = specs["modalities"][0]
    assert t["recog"]["h1"]["w"] == P("data", "model")
    assert t["recog"]["h1"]["b"] == P("model")
    assert t["recog"]["h2"]["w"] == P("model", "data")
    assert t["recog"]["out_mean"]["w"] == P("data", None)  # [16, 4]: dim0
    assert t["gener"]["out"]["w"] == P(None, "data")  # [16, 24]: dim1 largest
    assert t["gener"]["h1"]["w"] == P("data", "model")  # [4, 16]: 4 % 4 = 0


def test_state_sharded_on_both_axes(mesh):
    """Disjoint 2-D slices: per-chip state memory drops by ~the full mesh
    size (the point of composing the layouts)."""
    cfg = tiny_cfg()
    state = init_tp_fsdp_train_state(cfg, TrainConfig(batch_size=32), mesh)
    w = state.params["modalities"][0]["recog"]["h1"]["w"]  # [24, 16]
    # data=4 on dim0, model=2 on dim1 → each shard [6, 8]
    assert {s.data.shape for s in w.addressable_shards} == {(6, 8)}
    mu_w = state.opt_state[0].mu["modalities"][0]["recog"]["h1"]["w"]
    assert {s.data.shape for s in mu_w.addressable_shards} == {(6, 8)}
    h2 = state.params["modalities"][0]["recog"]["h2"]["w"]  # [16, 16]
    assert {s.data.shape for s in h2.addressable_shards} == {(8, 4)}


def test_tp_fsdp_step_matches_single_device(mesh, rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    ref_state = init_train_state(cfg, tc)
    ref_step = make_train_step(cfg, tc)
    c_state = init_tp_fsdp_train_state(cfg, tc, mesh)
    c_step = make_tp_fsdp_train_step(cfg, tc, mesh)

    for _ in range(3):
        xs = [
            rng.uniform(0, 1, (32, 24)).astype(np.float32),
            rng.normal(size=(32, 24)).astype(np.float32),
        ]
        ref_state, ref_m = ref_step(ref_state, [jnp.asarray(x) for x in xs])
        c_state, c_m = c_step(c_state, shard_tp_batch(mesh, xs))
        np.testing.assert_allclose(
            float(ref_m["total"]), float(c_m["total"]), rtol=2e-5
        )

    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(c_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-6)


def test_tp_fsdp_shardings_preserved_by_step(mesh, rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32)
    state = init_tp_fsdp_train_state(cfg, tc, mesh)
    specs = tp_fsdp_param_specs(cfg, N_DEV // MP)

    def check(params):
        jax.tree.map(
            lambda x, s: _assert_sharded(x, NamedSharding(mesh, s)), params, specs
        )

    xs = shard_tp_batch(
        mesh,
        [
            rng.uniform(0, 1, (32, 24)).astype(np.float32),
            rng.normal(size=(32, 24)).astype(np.float32),
        ],
    )
    state, _ = make_tp_fsdp_train_step(cfg, tc, mesh)(state, xs)
    check(state.params)
    check(state.opt_state[0].mu)
    check(state.opt_state[0].nu)


def _assert_sharded(x, sharding):
    assert x.sharding.is_equivalent_to(sharding, x.ndim), (
        f"{x.shape}: {x.sharding} != {sharding}"
    )


def test_tp_fsdp_step_emits_collectives(mesh, rng):
    """Both families must appear: the model-axis partial-product all-reduce
    (row-parallel h2) and data-axis gather/scatter traffic for the sharded
    weights/moments."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=32)
    state = init_tp_fsdp_train_state(cfg, tc, mesh)
    xs = shard_tp_batch(
        mesh,
        [
            rng.uniform(0, 1, (32, 24)).astype(np.float32),
            rng.normal(size=(32, 24)).astype(np.float32),
        ],
    )
    base = make_train_step(cfg, tc, jit=False)
    hlo = jax.jit(lambda s, xs: base(s, list(xs))).lower(state, xs).compile().as_text()
    assert "all-reduce" in hlo, "no model-axis all-reduce in compiled step"
    assert any(c in hlo for c in ("all-gather", "reduce-scatter")), (
        "no data-axis gather/scatter in compiled step"
    )


def test_tp_fsdp_train_loop_learns(mesh, rng):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=64, steps_per_call=2, learning_rate=3e-3)
    data = [
        rng.uniform(0, 1, (256, 24)).astype(np.float32),
        rng.normal(size=(256, 24)).astype(np.float32),
    ]
    state, history = tp_fsdp_train_loop(cfg, tc, data, mesh, epochs=8)
    assert history[-1]["total"] < history[0]["total"]


def test_tp_fsdp_misuse_fails_loudly(mesh):
    cfg = tiny_cfg()
    # Must signpost the kernel-keeping --zero alternative (VERDICT r3 #6).
    with pytest.raises(ValueError, match="(?s)[Pp]allas.*--zero"):
        make_tp_fsdp_train_step(cfg, TrainConfig(batch_size=8, use_pallas=True), mesh)
    flat_mesh = make_mesh(N_DEV)
    with pytest.raises(ValueError, match="mesh"):
        init_tp_fsdp_train_state(cfg, TrainConfig(batch_size=8), flat_mesh)


def test_tp_fsdp_indivisible_dims_fall_back_per_leaf():
    """A dim the data axis doesn't divide keeps its TP placement (or
    replication for heads) for that leaf only."""
    arch = dict(
        n_input=22,  # 22 % 4 != 0 → h1 w keeps P(None, 'model')
        n_z=4,
        n_hidden_recog_1=16,
        n_hidden_recog_2=16,
        n_hidden_gener_1=16,
        n_hidden_gener_2=16,
    )
    cfg = AssocConfig(
        [ModalityConfig("image", arch, recon="bernoulli")], assoc_lambda=0.0
    )
    specs = tp_fsdp_param_specs(cfg, 4)
    t = specs["modalities"][0]
    assert t["recog"]["h1"]["w"] == P(None, "model")
    assert t["gener"]["out"]["w"] == P("data", None)  # [16, 22]: dim0 divisible
