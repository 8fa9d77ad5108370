"""shard_map tensor parallelism (parallel/tp_shard.py): trajectory equality
vs the single-device step, padding hygiene, HLO collectives, rejections.

Runs on the 8-virtual-CPU-device mesh (conftest). The pair blocks route
through kernels.mlp.decode_mlp_fused, which under shard_map-on-CPU falls
back to its identical-math jnp twin — the kernel bodies are parity-tested
in tests/test_kernels.py, and the TPU smoke script proves the Mosaic
lowering under the mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.parallel import tp_shard
from vae_assoc_tpu.train.step import init_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device mesh"
)


def _arch(depth: int, n_input: int = 36, width: int = 20, n_z: int = 6):
    """width=20 on an 8-device mesh pads to 24 — padding is exercised."""
    a = dict(n_input=n_input, n_z=n_z)
    for i in range(1, depth + 1):
        a[f"n_hidden_recog_{i}"] = width
        a[f"n_hidden_gener_{i}"] = width
    return a


def _cfg(depth: int = 2):
    return AssocConfig(
        [
            ModalityConfig("image", _arch(depth, 40), recon="bernoulli"),
            ModalityConfig("trajectory", _arch(depth, 36), recon="gaussian"),
        ],
        assoc_lambda=0.7,
    )


def _data(rng, n=16):
    return [
        jnp.asarray(rng.uniform(0, 1, (n, 40)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, 36)).astype(np.float32)),
    ]


def _run_pair(cfg, tc, xs, steps=4):
    """(single-device metrics+params, TP metrics+params) after `steps`."""
    mesh = tp_shard.make_tp_mesh(8)
    ref_state = init_train_state(cfg, tc)
    ref_step = make_train_step(cfg, tc)
    tp_state = tp_shard.shard_tp_train_state(mesh, init_train_state(cfg, tc), cfg, tc)
    tp_step = tp_shard.make_tp_train_step(cfg, tc, mesh)
    ref_ms, tp_ms = [], []
    for _ in range(steps):
        ref_state, m = ref_step(ref_state, xs)
        ref_ms.append(m)
        tp_state, mt = tp_step(tp_state, xs)
        tp_ms.append(mt)
    gathered = tp_shard.gather_tp_train_state(tp_state, cfg, tc)
    return ref_state, ref_ms, gathered, tp_ms


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_tp_trajectory_matches_single_device(depth):
    """Same seed → same ε stream → the TP trajectory equals the
    single-device jnp step at fp32-reassociation tolerance, for even
    pairing (2), the (h_last, out) decoder block (1, 3), and the
    column-split leftovers (3)."""
    rng = np.random.default_rng(depth)
    cfg = _cfg(depth)
    tc = TrainConfig(batch_size=16, use_pallas=False)
    xs = _data(rng)
    ref_state, ref_ms, gathered, tp_ms = _run_pair(cfg, tc, xs)
    for mr, mt in zip(ref_ms, tp_ms):
        for k in mr:
            np.testing.assert_allclose(
                float(mr[k]), float(mt[k]), rtol=2e-4, atol=2e-5, err_msg=k
            )
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(gathered.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_tp_kernel_path_runs_and_learns():
    """use_pallas=True routes blocks through decode_mlp_fused (jnp fallback
    under shard_map-on-CPU; Mosaic on TPU) — the step must run and learn."""
    rng = np.random.default_rng(0)
    cfg = _cfg(2)
    tc = TrainConfig(batch_size=16, use_pallas=True)
    mesh = tp_shard.make_tp_mesh(8)
    state = tp_shard.init_tp_train_state(cfg, tc, mesh)
    step = tp_shard.make_tp_train_step(cfg, tc, mesh)
    xs = _data(rng)
    hist = []
    for _ in range(8):
        state, m = step(state, xs)
        hist.append(float(m["total"]))
    assert np.isfinite(hist).all() and hist[-1] < hist[0]


def test_tp_shard_gather_roundtrip_bitwise():
    cfg = _cfg(2)
    tc = TrainConfig(batch_size=16)
    mesh = tp_shard.make_tp_mesh(8)
    state = init_train_state(cfg, tc)
    back = tp_shard.gather_tp_train_state(
        tp_shard.shard_tp_train_state(mesh, state, cfg, tc), cfg, tc
    )
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp_state_is_sharded_and_padded():
    cfg = _cfg(2)
    tc = TrainConfig(batch_size=16)
    mesh = tp_shard.make_tp_mesh(8)
    state = tp_shard.init_tp_train_state(cfg, tc, mesh)
    p0 = state.params["modalities"][0]
    # width 20 pads to 24; h1 col-sharded on the out dim, h2 row-sharded.
    assert p0["recog"]["h1"]["w"].shape == (40, 24)
    assert p0["recog"]["h2"]["w"].shape == (24, 20)
    spec1 = p0["recog"]["h1"]["w"].sharding.spec
    spec2 = p0["recog"]["h2"]["w"].sharding.spec
    assert tuple(spec1) == (None, tp_shard.AXIS)
    assert tuple(spec2) == (tp_shard.AXIS, None)
    # heads replicated
    assert not any(p0["recog"]["out_mean"]["w"].sharding.spec)
    # padded tail of the col shard is zero
    w = np.asarray(p0["recog"]["h1"]["w"])
    assert (w[:, 20:] == 0).all()


def test_tp_pads_stay_zero_after_training():
    """The _mask_pad_rows discipline: row-shard pad rows (and col pads)
    must stay exactly zero through real Adam updates, or the padded model
    would drift off the unpadded function."""
    rng = np.random.default_rng(1)
    cfg = _cfg(2)
    tc = TrainConfig(batch_size=16)
    mesh = tp_shard.make_tp_mesh(8)
    state = tp_shard.init_tp_train_state(cfg, tc, mesh)
    step = tp_shard.make_tp_train_step(cfg, tc, mesh)
    xs = _data(rng)
    for _ in range(5):
        state, _ = step(state, xs)
    p0 = state.params["modalities"][0]
    assert (np.asarray(p0["recog"]["h1"]["w"])[:, 20:] == 0).all()
    assert (np.asarray(p0["recog"]["h1"]["b"])[20:] == 0).all()
    assert (np.asarray(p0["recog"]["h2"]["w"])[20:, :] == 0).all()
    assert (np.asarray(p0["gener"]["h1"]["w"])[:, 20:] == 0).all()
    assert (np.asarray(p0["gener"]["h2"]["w"])[20:, :] == 0).all()


def test_tp_hlo_contains_collectives():
    cfg = _cfg(3)  # odd depth: pair psums AND a column-split all-gather
    tc = TrainConfig(batch_size=16)
    mesh = tp_shard.make_tp_mesh(8)
    state = tp_shard.init_tp_train_state(cfg, tc, mesh)
    step = tp_shard.make_tp_train_step(cfg, tc, mesh)
    xs = _data(np.random.default_rng(0))
    txt = step.lower(state, xs).compile().as_text()
    assert "all-reduce" in txt
    assert "all-gather" in txt


def test_tp_clip_accum_ema_compose():
    rng = np.random.default_rng(2)
    cfg = _cfg(2)
    tc = TrainConfig(
        batch_size=16, grad_clip_norm=0.5, accum_steps=2, ema_decay=0.9
    )
    xs = _data(rng)
    ref_state, ref_ms, gathered, tp_ms = _run_pair(cfg, tc, xs, steps=6)
    for mr, mt in zip(ref_ms, tp_ms):
        np.testing.assert_allclose(
            float(mr["grad_norm"]), float(mt["grad_norm"]), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            float(mr["total"]), float(mt["total"]), rtol=2e-4, atol=2e-5
        )
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(gathered.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_tp_train_loop_runs():
    cfg = _cfg(2)
    tc = TrainConfig(batch_size=8, steps_per_call=2)
    mesh = tp_shard.make_tp_mesh(8)
    rng = np.random.default_rng(3)
    data = [
        rng.uniform(0, 1, (64, 40)).astype(np.float32),
        rng.normal(size=(64, 36)).astype(np.float32),
    ]
    state, hist = tp_shard.tp_train_loop(cfg, tc, data, mesh, epochs=2)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["total"])
    gathered = tp_shard.gather_tp_train_state(state, cfg, tc)
    assert gathered.params["modalities"][0]["recog"]["h1"]["w"].shape == (40, 20)


def test_tp_rejections():
    mesh = tp_shard.make_tp_mesh(8)
    cfg = _cfg(2)
    conv_cfg = AssocConfig(
        [
            ModalityConfig(
                "image",
                dict(n_input=784, n_z=6, n_hidden_recog_1=20,
                     n_hidden_recog_2=20, n_hidden_gener_1=20,
                     n_hidden_gener_2=20),
                recon="bernoulli", encoder="conv",
            ),
        ],
        assoc_lambda=0.0,
    )
    with pytest.raises(ValueError, match="zero"):
        tp_shard.make_tp_train_step(conv_cfg, TrainConfig(batch_size=8), mesh)
    with pytest.raises(ValueError, match="parity"):
        tp_shard.make_tp_train_step(
            cfg, TrainConfig(batch_size=8, parity_mode=True), mesh
        )
    with pytest.raises(ValueError, match="remat"):
        tp_shard.make_tp_train_step(
            cfg, TrainConfig(batch_size=8, remat=True), mesh
        )
    # A foreign 2-D mesh (wrong axis names/order) is still rejected; the
    # supported 2-D layout is make_tp_mesh(..., data_parallel=D)'s
    # ('data','model').
    from jax.sharding import Mesh

    wrong = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("model", "data")
    )
    with pytest.raises(ValueError, match="mesh"):
        tp_shard.make_tp_train_step(cfg, TrainConfig(batch_size=8), wrong)
    with pytest.raises(ValueError, match="divisible"):
        tp_shard.make_tp_mesh(8, data_parallel=3)


# ---------------------------------------------------------------------------
# DP×TP on one 2-D ('data','model') mesh (round 5, VERDICT r4 #1)
# ---------------------------------------------------------------------------


def test_tp_dp_trajectory_matches_plain_dp():
    """The 2-D step at the same global batch equals plain DP: same data
    shards, same per-shard ε folding (axis_index('data')), so the
    trajectories agree at fp32-reassociation tolerance."""
    from vae_assoc_tpu.parallel import dp as dp_mod
    from vae_assoc_tpu.parallel import mesh as mesh_mod

    rng = np.random.default_rng(10)
    cfg = _cfg(2)
    tc = TrainConfig(batch_size=16, use_pallas=False)
    xs = _data(rng)

    dp_mesh = mesh_mod.make_mesh(2)
    dp_state = dp_mod.init_dp_train_state(cfg, tc, dp_mesh)
    dp_step = dp_mod.make_dp_train_step(cfg, tc, dp_mesh)

    mesh2 = tp_shard.make_tp_mesh(8, data_parallel=2)
    assert dict(mesh2.shape) == {"data": 2, "model": 4}
    tp_state = tp_shard.shard_tp_train_state(
        mesh2, init_train_state(cfg, tc), cfg, tc
    )
    tp_step = tp_shard.make_tp_train_step(cfg, tc, mesh2)

    dp_ms, tp_ms = [], []
    for _ in range(4):
        dp_state, m = dp_step(dp_state, mesh_mod.shard_batch(dp_mesh, xs))
        dp_ms.append(m)
        tp_state, mt = tp_step(
            tp_state, mesh_mod.shard_batch(mesh2, xs, batch_axes="data")
        )
        tp_ms.append(mt)
    for mr, mt in zip(dp_ms, tp_ms):
        for k in mr:
            np.testing.assert_allclose(
                float(mr[k]), float(mt[k]), rtol=2e-4, atol=2e-5, err_msg=k
            )
    gathered = tp_shard.gather_tp_train_state(tp_state, cfg, tc)
    for a, b in zip(
        jax.tree.leaves(dp_state.params), jax.tree.leaves(gathered.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_tp_dp_clip_accum_ema_compose_and_pads_stay_zero():
    """Production optimizer options on the 2-D mesh: grad_norm and totals
    match plain DP, and the pad-row masking discipline holds under real
    Adam updates with the data axis present."""
    from vae_assoc_tpu.parallel import dp as dp_mod
    from vae_assoc_tpu.parallel import mesh as mesh_mod

    rng = np.random.default_rng(11)
    cfg = _cfg(2)
    tc = TrainConfig(
        batch_size=16, grad_clip_norm=0.5, accum_steps=2, ema_decay=0.9
    )
    xs = _data(rng)
    dp_mesh = mesh_mod.make_mesh(2)
    dp_state = dp_mod.init_dp_train_state(cfg, tc, dp_mesh)
    dp_step = dp_mod.make_dp_train_step(cfg, tc, dp_mesh)
    mesh2 = tp_shard.make_tp_mesh(8, data_parallel=2)
    tp_state = tp_shard.shard_tp_train_state(
        mesh2, init_train_state(cfg, tc), cfg, tc
    )
    tp_step = tp_shard.make_tp_train_step(cfg, tc, mesh2)
    for _ in range(6):
        dp_state, mr = dp_step(dp_state, mesh_mod.shard_batch(dp_mesh, xs))
        tp_state, mt = tp_step(
            tp_state, mesh_mod.shard_batch(mesh2, xs, batch_axes="data")
        )
        np.testing.assert_allclose(
            float(mr["grad_norm"]), float(mt["grad_norm"]), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            float(mr["total"]), float(mt["total"]), rtol=2e-4, atol=2e-5
        )
    p0 = tp_state.params["modalities"][0]
    assert (np.asarray(p0["recog"]["h1"]["w"])[:, 20:] == 0).all()
    assert (np.asarray(p0["recog"]["h2"]["w"])[20:, :] == 0).all()
    gathered = tp_shard.gather_tp_train_state(tp_state, cfg, tc)
    for a, b in zip(
        jax.tree.leaves(dp_state.params), jax.tree.leaves(gathered.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_tp_dp_kernel_path_runs_and_learns():
    """use_pallas blocks + data axis + conditional model, all at once: the
    widened closed world composes on the 2-D mesh and learns."""
    from vae_assoc_tpu.parallel import mesh as mesh_mod

    rng = np.random.default_rng(12)
    n_cond = 3
    base = _cfg(2)
    cfg = AssocConfig(
        [dataclasses.replace(m, n_cond=n_cond) for m in base.modalities],
        assoc_lambda=base.assoc_lambda,
    )
    tc = TrainConfig(batch_size=16, use_pallas=True)
    mesh2 = tp_shard.make_tp_mesh(8, data_parallel=2)
    state = tp_shard.init_tp_train_state(cfg, tc, mesh2)
    step = tp_shard.make_tp_train_step(cfg, tc, mesh2)
    labels = rng.integers(0, n_cond, 16)
    xs = list(_data(rng)) + [jnp.asarray(np.eye(n_cond, dtype=np.float32)[labels])]
    xs = mesh_mod.shard_batch(mesh2, xs, batch_axes="data")
    hist = []
    for _ in range(8):
        state, m = step(state, xs)
        hist.append(float(m["total"]))
    assert np.isfinite(hist).all() and hist[-1] < hist[0]


def test_tp_conditional_matches_single_device():
    """Pure TP (replicated batch) with a conditional model equals the
    single-device step: the cond concat happens at the same call boundary
    (VERDICT r4 #4 — the n_cond rejection was structurally unnecessary)."""
    rng = np.random.default_rng(13)
    n_cond = 4
    base = _cfg(2)
    cfg = AssocConfig(
        [dataclasses.replace(m, n_cond=n_cond) for m in base.modalities],
        assoc_lambda=base.assoc_lambda,
    )
    tc = TrainConfig(batch_size=16, use_pallas=False)
    labels = rng.integers(0, n_cond, 16)
    cond = jnp.asarray(np.eye(n_cond, dtype=np.float32)[labels])
    xs = list(_data(rng)) + [cond]
    ref_state, ref_ms, gathered, tp_ms = _run_pair(cfg, tc, xs)
    for mr, mt in zip(ref_ms, tp_ms):
        for k in mr:
            np.testing.assert_allclose(
                float(mr[k]), float(mt[k]), rtol=2e-4, atol=2e-5, err_msg=k
            )
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(gathered.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_tp_nonsoftplus_transfer_matches_single_device():
    """A tanh-transfer modality rides tp_shard on the jnp block twin (the
    Pallas block kernels hard-code softplus); trajectory equality holds."""
    rng = np.random.default_rng(14)
    base = _cfg(2)
    cfg = AssocConfig(
        [dataclasses.replace(m, transfer="tanh") for m in base.modalities],
        assoc_lambda=base.assoc_lambda,
    )
    tc = TrainConfig(batch_size=16, use_pallas=True)  # falls back per modality
    xs = _data(rng)
    ref_state, ref_ms, gathered, tp_ms = _run_pair(cfg, tc, xs)
    for mr, mt in zip(ref_ms, tp_ms):
        np.testing.assert_allclose(
            float(mr["total"]), float(mt["total"]), rtol=2e-4, atol=2e-5
        )
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(gathered.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_tp_dp_train_loop_and_ckpt_roundtrip():
    """The epoch loop shards batches over the data axis; gather/shard
    round-trips bitwise on the 2-D mesh (checkpoint interop)."""
    cfg = _cfg(2)
    tc = TrainConfig(batch_size=8, steps_per_call=2)
    mesh2 = tp_shard.make_tp_mesh(8, data_parallel=2)
    rng = np.random.default_rng(15)
    data = [
        rng.uniform(0, 1, (64, 40)).astype(np.float32),
        rng.normal(size=(64, 36)).astype(np.float32),
    ]
    state, hist = tp_shard.tp_train_loop(cfg, tc, data, mesh2, epochs=2)
    assert len(hist) == 2 and np.isfinite(hist[-1]["total"])
    full = tp_shard.gather_tp_train_state(state, cfg, tc)
    back = tp_shard.gather_tp_train_state(
        tp_shard.shard_tp_train_state(mesh2, full, cfg, tc), cfg, tc
    )
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(back)):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
