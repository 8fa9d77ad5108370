"""Pipeline parallelism (parallel/pp.py) on the 8-virtual-device CPU mesh.

The PP step is plain XLA (no Pallas — check_pp rejects use_pallas), so CPU
covers the REAL compute path here, unlike the DP kernel tests: the ring
schedule, the ppermute shifts, the masked ingestion/capture, and the AD
reverse pipeline all execute exactly as they would on TPU (modulo Mosaic
codegen). Coverage:

- trajectory equality vs the single-device step (same seed/batches →
  same losses/params to float tolerance) across microbatch counts,
  steps_per_call scans, depths, clip/EMA, and conditional models;
- the compiled HLO contains collective-permute (the pipeline IS on the
  wire, not compiled away);
- the 'mid' leaves are genuinely stage-sharded (disjoint per-device
  shards, 1/S-sized);
- shard/gather round-trips bitwise, including the Adam moments, so
  checkpoint interop works mid-run;
- check_pp rejects every inexpressible config loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.parallel import mesh as mesh_mod
from vae_assoc_tpu.parallel import pp
from vae_assoc_tpu.train.step import init_train_state, make_train_step

N_DEV = 8


def deep_arch(depth, hidden, n_in, n_z=6):
    d = dict(n_input=n_in, n_z=n_z)
    for k in range(1, depth + 1):
        d[f"n_hidden_recog_{k}"] = hidden
        d[f"n_hidden_gener_{k}"] = hidden
    return d


def deep_cfg(depth=5, hidden=24, n_cond=0):
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


@pytest.fixture(scope="module")
def mesh4():
    assert len(jax.devices()) == N_DEV, "conftest must fake 8 CPU devices"
    return pp.make_pp_mesh(4)


def _batches(rng, b=32, spc=None, cond_classes=0):
    shape = lambda d: (b, d) if spc is None else (spc, b, d)
    xs = [
        rng.uniform(0, 1, shape(20)).astype(np.float32),
        rng.normal(size=shape(14)).astype(np.float32),
    ]
    if cond_classes:
        one_hot = np.eye(cond_classes, dtype=np.float32)[
            rng.integers(0, cond_classes, shape(1)[:-1])
        ]
        xs.append(one_hot)
    return xs


def _run_both(mesh, cfg, tc, rng, steps=3, spc=None, n_micro=None, cond_classes=0):
    """Run PP and the single-device step on identical batches; return the
    final (gathered) PP state, the single-device state, and metric lists."""
    n = int(mesh.shape[pp.STAGE_AXIS])
    pstate = pp.init_pp_train_state(cfg, tc, mesh)
    pstep = pp.make_pp_train_step(cfg, tc, mesh, n_micro=n_micro)
    sstate = init_train_state(cfg, tc)
    sstep = make_train_step(cfg, tc)
    pms, sms = [], []
    for _ in range(steps):
        xs = _batches(rng, b=tc.batch_size, spc=spc, cond_classes=cond_classes)
        pstate, m = pstep(pstate, mesh_mod.replicate(mesh, tuple(xs)))
        pms.append(jax.device_get(m))
        sstate, m = sstep(sstate, xs)
        sms.append(jax.device_get(m))
    return pp.gather_pp_train_state(pstate, cfg, tc, n), sstate, pms, sms


def _assert_tree_close(a, b, rtol=3e-5, atol=1e-6):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# Trajectory equality vs the single-device step
# ---------------------------------------------------------------------------


def test_pp_step_equals_single_device(mesh4, rng):
    cfg = deep_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    g, s, pms, sms = _run_both(mesh4, cfg, tc, rng)
    for pm, sm in zip(pms, sms):
        np.testing.assert_allclose(pm["total"], sm["total"], rtol=1e-5)
        np.testing.assert_allclose(pm["assoc"], sm["assoc"], rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(pm["grad_norm"], sm["grad_norm"], rtol=1e-4)
    _assert_tree_close(g.params, s.params)
    assert int(g.step) == int(s.step) == 3


@pytest.mark.parametrize("n_micro", [4, 8, 16])
def test_pp_microbatch_counts_agree(mesh4, rng, n_micro):
    """The microbatch count is a schedule knob, not a math knob: every M
    gives the same step (the loss terms are per-sample means)."""
    cfg = deep_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    g, s, pms, sms = _run_both(mesh4, cfg, tc, rng, steps=2, n_micro=n_micro)
    np.testing.assert_allclose(pms[-1]["total"], sms[-1]["total"], rtol=1e-5)
    _assert_tree_close(g.params, s.params)


def test_pp_scan_steps_per_call(mesh4, rng):
    cfg = deep_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3, steps_per_call=3)
    g, s, pms, sms = _run_both(mesh4, cfg, tc, rng, steps=2, spc=3)
    assert pms[-1]["total"].shape == (3,)
    np.testing.assert_allclose(pms[-1]["total"], sms[-1]["total"], rtol=1e-5)
    _assert_tree_close(g.params, s.params)


def test_pp_two_stage_deeper_blocks(rng):
    """S=2 with 4 pipelined layers → 2 layers per stage block."""
    mesh = pp.make_pp_mesh(2)
    cfg = deep_cfg(depth=5)
    tc = TrainConfig(batch_size=16, learning_rate=1e-3)
    g, s, pms, sms = _run_both(mesh, cfg, tc, rng, steps=2)
    np.testing.assert_allclose(pms[-1]["total"], sms[-1]["total"], rtol=1e-5)
    _assert_tree_close(g.params, s.params)


def test_pp_asymmetric_depths(mesh4, rng):
    """Recognition and generator depths may differ (each needs its own
    divisibility); widths may differ per net too."""
    arch_img = dict(n_input=20, n_z=6)
    for k in range(1, 6):
        arch_img[f"n_hidden_recog_{k}"] = 24
    for k in range(1, 10):
        arch_img[f"n_hidden_gener_{k}"] = 16
    arch_tr = deep_arch(5, 32, 14)
    cfg = AssocConfig(
        [
            ModalityConfig("image", arch_img, recon="bernoulli"),
            ModalityConfig("trajectory", arch_tr, recon="gaussian"),
        ],
        assoc_lambda=1.0,
    )
    tc = TrainConfig(batch_size=16, learning_rate=1e-3)
    g, s, pms, sms = _run_both(mesh4, cfg, tc, rng, steps=2)
    np.testing.assert_allclose(pms[-1]["total"], sms[-1]["total"], rtol=1e-5)
    _assert_tree_close(g.params, s.params)


def test_pp_clip_and_ema(mesh4, rng):
    """Global-norm clipping uses the psum'd cross-stage norm and EMA state
    lays out/updates correctly on the stacked leaves."""
    cfg = deep_cfg()
    tc = TrainConfig(
        batch_size=32, learning_rate=1e-3, grad_clip_norm=1.0, ema_decay=0.9
    )
    g, s, pms, sms = _run_both(mesh4, cfg, tc, rng, steps=3)
    for pm, sm in zip(pms, sms):
        np.testing.assert_allclose(pm["total"], sm["total"], rtol=1e-5)
    _assert_tree_close(g.params, s.params)
    _assert_tree_close(g.opt_state, s.opt_state, rtol=1e-4, atol=1e-6)


def test_pp_conditional(mesh4, rng):
    """Conditional models: the cond rides as the trailing batch entry and
    concatenates at the (replicated) boundary layers."""
    cfg = deep_cfg(n_cond=4)
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    g, s, pms, sms = _run_both(mesh4, cfg, tc, rng, steps=2, cond_classes=4)
    np.testing.assert_allclose(pms[-1]["total"], sms[-1]["total"], rtol=1e-5)
    _assert_tree_close(g.params, s.params)


def test_pp_annealing(mesh4, rng):
    """β-VAE/annealing knobs flow through apply_objective_weights inside the
    shard_map body, same as every other layout."""
    cfg = deep_cfg()
    tc = TrainConfig(
        batch_size=32, learning_rate=1e-3, kl_beta=0.5, kl_anneal_steps=4
    )
    g, s, pms, sms = _run_both(mesh4, cfg, tc, rng, steps=3)
    for pm, sm in zip(pms, sms):
        np.testing.assert_allclose(pm["total"], sm["total"], rtol=1e-5)
        np.testing.assert_allclose(pm["kl_beta_eff"], sm["kl_beta_eff"], rtol=1e-6)
    _assert_tree_close(g.params, s.params)


# ---------------------------------------------------------------------------
# DP×PP: 2-D ('stage', 'data') mesh
# ---------------------------------------------------------------------------


def _run_dp_pp(mesh, cfg, tc, rng, steps=3, spc=None):
    n = int(mesh.shape[pp.STAGE_AXIS])
    pstate = pp.init_pp_train_state(cfg, tc, mesh)
    pstep = pp.make_pp_train_step(cfg, tc, mesh)
    pms = []
    batches = []
    for _ in range(steps):
        xs = _batches(rng, b=tc.batch_size, spc=spc)
        batches.append(xs)
        pstate, m = pstep(pstate, pp.shard_pp_batch(
            mesh, xs, leading_scan_axis=spc is not None))
        pms.append(jax.device_get(m))
    return pp.gather_pp_train_state(pstate, cfg, tc, n), pms, batches


def test_dp_pp_equals_pure_dp(rng):
    """DP×PP (2 stages × 4 data) reproduces the pure-DP step over the same
    4-way data mesh exactly: same per-data-shard ε fold, same loss-pmean
    gradient sync — the pipeline axis adds no math."""
    from vae_assoc_tpu.parallel import (
        init_dp_train_state,
        make_dp_train_step,
        make_mesh,
        shard_batch,
    )

    cfg = deep_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    mesh = pp.make_pp_mesh(2, data_parallel=4)
    g, pms, batches = _run_dp_pp(mesh, cfg, tc, rng, steps=3)
    dmesh = make_mesh(4)
    dstate = init_dp_train_state(cfg, tc, dmesh)
    dstep = make_dp_train_step(cfg, tc, dmesh)
    dms = []
    for xs in batches:
        dstate, m = dstep(dstate, shard_batch(dmesh, xs))
        dms.append(jax.device_get(m))
    for pm, dm in zip(pms, dms):
        np.testing.assert_allclose(pm["total"], dm["total"], rtol=1e-5)
        np.testing.assert_allclose(pm["grad_norm"], dm["grad_norm"], rtol=1e-4)
    _assert_tree_close(g.params, dstate.params)


def test_dp_pp_scan_and_state_layout(rng):
    """DP×PP with a steps_per_call scan: state still stage-sharded (mid
    leaves split over stage, replicated over data), metrics carry the scan
    axis, training advances."""
    cfg = deep_cfg()
    tc = TrainConfig(batch_size=16, learning_rate=1e-3, steps_per_call=2)
    mesh = pp.make_pp_mesh(4, data_parallel=2)
    pstate = pp.init_pp_train_state(cfg, tc, mesh)
    mid_w = pstate.params["modalities"][0]["recog"]["mid"]["w"]
    assert mid_w.shape == (4, 1, 24, 24)
    # 8 addressable shards (full mesh), but only 4 DISTINCT stage blocks —
    # each stage row's 2 data devices hold identical copies.
    assert len(mid_w.addressable_shards) == 8
    assert len({s.index[0].start for s in mid_w.addressable_shards}) == 4
    g, pms, _ = _run_dp_pp(mesh, cfg, tc, rng, steps=2, spc=2)
    assert pms[-1]["total"].shape == (2,)
    assert np.all(np.isfinite(pms[-1]["total"]))
    assert int(g.step) == 4


def test_dp_pp_batch_divisibility_errors():
    cfg = deep_cfg()
    mesh = pp.make_pp_mesh(2, data_parallel=4)
    with pytest.raises(ValueError, match="not divisible by the 4-way"):
        pp.make_pp_train_step(cfg, TrainConfig(batch_size=30), mesh)
    with pytest.raises(ValueError, match="per-data-shard batch"):
        pp.make_pp_train_step(cfg, TrainConfig(batch_size=12), mesh)
    with pytest.raises(ValueError, match="devices"):
        pp.make_pp_mesh(4, data_parallel=4)


# ---------------------------------------------------------------------------
# The pipeline is real: sharded state + collectives on the wire
# ---------------------------------------------------------------------------


def test_pp_mid_leaves_are_stage_sharded(mesh4):
    cfg = deep_cfg()
    tc = TrainConfig(batch_size=32)
    pstate = pp.init_pp_train_state(cfg, tc, mesh4)
    mid_w = pstate.params["modalities"][0]["recog"]["mid"]["w"]
    assert mid_w.shape == (4, 1, 24, 24)
    shards = mid_w.addressable_shards
    assert len(shards) == 4  # the 4-stage mesh
    sizes = {s.data.shape for s in shards}
    assert sizes == {(1, 1, 24, 24)}  # 1/S of the stacked leaf per device
    # Disjoint stage blocks: shard s holds layer h(2+s), nothing else.
    starts = sorted(s.index[0].start for s in shards)
    assert starts == [0, 1, 2, 3]
    # Boundary layers replicated: every device holds the full array.
    h1 = pstate.params["modalities"][0]["recog"]["h1"]["w"]
    assert all(s.data.shape == h1.shape for s in h1.addressable_shards)


def test_pp_hlo_contains_collective_permute(mesh4):
    cfg = deep_cfg()
    tc = TrainConfig(batch_size=32)
    pstate = pp.init_pp_train_state(cfg, tc, mesh4)
    pstep = pp.make_pp_train_step(cfg, tc, mesh4)
    xs = mesh_mod.replicate(
        mesh4,
        (
            jnp.zeros((32, 20), jnp.float32),
            jnp.zeros((32, 14), jnp.float32),
        ),
    )
    hlo = pstep.lower(pstate, xs).compile().as_text()
    assert "collective-permute" in hlo, "ring shifts compiled away?"
    assert "all-reduce" in hlo  # the masked psum broadcast + grad norms


def test_pp_shard_gather_roundtrip_bitwise(mesh4):
    cfg = deep_cfg()
    tc = TrainConfig(batch_size=32, learning_rate=1e-3, ema_decay=0.9)
    step = make_train_step(cfg, tc)

    def trained():
        # Deterministic twin: same init key, same batches. Two independent
        # copies are needed because shard_pp_train_state's device_put may
        # ALIAS same-device buffers (replicated leaves), so the donating
        # `step` below would delete the round-tripped state's shards if it
        # consumed the original.
        st = init_train_state(cfg, tc)
        r = np.random.default_rng(3)
        for _ in range(2):
            st, _ = step(st, _batches(r, b=32))
        return st

    state, twin = trained(), trained()
    pstate = pp.shard_pp_train_state(mesh4, twin, cfg, tc)
    back = pp.gather_pp_train_state(pstate, cfg, tc, 4)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # And the restored state continues training identically to the original.
    s1, m1 = step(state, _batches(np.random.default_rng(7), b=32))
    s2, m2 = step(back, _batches(np.random.default_rng(7), b=32))
    np.testing.assert_array_equal(
        np.asarray(m1["total"]), np.asarray(m2["total"])
    )


# ---------------------------------------------------------------------------
# Loud rejections
# ---------------------------------------------------------------------------


def test_pp_rejects_use_pallas(mesh4):
    tc = TrainConfig(batch_size=32, use_pallas=True)
    with pytest.raises(ValueError, match="Pallas"):
        pp.make_pp_train_step(deep_cfg(), tc, mesh4)


def test_pp_rejects_shallow_towers(mesh4):
    cfg = deep_cfg(depth=2)  # the reference arch: nothing to pipeline
    with pytest.raises(ValueError, match="depth"):
        pp.make_pp_train_step(cfg, TrainConfig(batch_size=32), mesh4)


def test_pp_rejects_nonuniform_widths(mesh4):
    arch = deep_arch(5, 24, 20)
    arch["n_hidden_recog_3"] = 16
    cfg = AssocConfig(
        [
            ModalityConfig("image", arch, recon="bernoulli"),
            ModalityConfig("trajectory", deep_arch(5, 24, 14), recon="gaussian"),
        ],
    )
    with pytest.raises(ValueError, match="homogeneous"):
        pp.make_pp_train_step(cfg, TrainConfig(batch_size=32), mesh4)


def test_pp_rejects_indivisible_depth(mesh4):
    cfg = deep_cfg(depth=6)  # 5 pipelined layers over 4 stages
    with pytest.raises(ValueError, match="not divisible"):
        pp.make_pp_train_step(cfg, TrainConfig(batch_size=32), mesh4)


def test_pp_rejects_conv(mesh4):
    from vae_assoc_tpu.configs import default_image_arch

    cfg = AssocConfig(
        [
            ModalityConfig(
                "image", default_image_arch(n_z=6), recon="bernoulli",
                encoder="conv",
            ),
            ModalityConfig("trajectory", deep_arch(5, 24, 14), recon="gaussian"),
        ],
    )
    with pytest.raises(ValueError, match="MLP"):
        pp.make_pp_train_step(cfg, TrainConfig(batch_size=32), mesh4)


def test_pp_rejects_bad_micro(mesh4):
    cfg = deep_cfg()
    with pytest.raises(ValueError, match="n_micro"):
        pp.make_pp_train_step(cfg, TrainConfig(batch_size=32), mesh4, n_micro=2)
    with pytest.raises(ValueError, match="divisible"):
        pp.make_pp_train_step(cfg, TrainConfig(batch_size=30), mesh4, n_micro=8)


def test_pp_rejects_wrong_mesh():
    from vae_assoc_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="stage"):
        pp.make_pp_train_step(deep_cfg(), TrainConfig(batch_size=32), make_mesh(4))
    with pytest.raises(ValueError, match=">= 2 stages"):
        pp.make_pp_train_step(
            deep_cfg(), TrainConfig(batch_size=32), pp.make_pp_mesh(1)
        )


# ---------------------------------------------------------------------------
# The loop
# ---------------------------------------------------------------------------


def test_pp_train_loop_learns(mesh4, rng):
    cfg = deep_cfg()
    tc = TrainConfig(batch_size=16, learning_rate=1e-3, steps_per_call=2)
    data = _batches(rng, b=64)
    state, history = pp.pp_train_loop(cfg, tc, data, mesh4, epochs=4)
    assert len(history) == 4
    assert history[-1]["total"] < history[0]["total"]
    assert np.isfinite(history[-1]["grad_norm"])


# ---------------------------------------------------------------------------
# The driver CLI
# ---------------------------------------------------------------------------


def test_driver_pipeline_flag(tmp_path):
    """`--pipeline S` end-to-end in a subprocess: deep towers stage-sharded,
    metrics JSONL written, checkpoint gathered to the plain layout; the
    layout-conflict and shallow-tower spellings exit loudly."""
    import os
    import subprocess
    import sys

    from vae_assoc_tpu.utils.logging import read_jsonl

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    metrics = tmp_path / "metrics.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "32", "--epochs", "2", "--depth", "5",
         "--hidden", "32", "--pipeline", "4", "--val-frac", "0.25",
         "--ckpt-dir", str(tmp_path / "ckpt"), "--metrics", str(metrics)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "pipeline-parallel over 4 stages" in out.stdout
    recs = read_jsonl(str(metrics))
    assert any("val_total" in r for r in recs), recs
    assert any("mse_image->trajectory" in r for r in recs), recs
    # Gathered checkpoint restores as a plain TrainState: the public loader
    # rebuilds the model from the directory alone (self-describing ckpt).
    from vae_assoc_tpu.api import AssocVariationalAutoEncoder

    loaded = AssocVariationalAutoEncoder.load(str(tmp_path / "ckpt"))
    z = loaded.transform([np.zeros((4, 784), np.float32),
                          np.zeros((4, 200), np.float32)])
    assert z[0].shape[0] == 4
    # DP×PP: --mesh 8 with --pipeline 2 = 2 stages × 4 data shards.
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "32", "--epochs", "1", "--depth", "5",
         "--hidden", "32", "--pipeline", "2", "--mesh", "8",
         "--pp-micro", "8"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert ("pipeline-parallel over 2 stages × 4 data shards, "
            "8 microbatches") in out.stdout
    for bad, msg in (
        (["--pipeline", "4", "--fsdp"], "owns the whole layout"),
        # --mesh with --pipeline means DP×PP: N must be a multiple of S > S.
        (["--pipeline", "4", "--mesh", "6"], "multiple of S"),
        (["--pipeline", "4", "--mesh", "4"], "multiple of S"),
        (["--pipeline", "4", "--use-pallas"], "jnp model path"),
        (["--pipeline", "1"], ">= 2 stages"),
        # Reference depth-2 towers: nothing to pipeline, check_pp says so.
        (["--pipeline", "4"], "depth"),
        (["--pp-micro", "4"], "only applies with --pipeline"),
        # config-3 batch 64 is not divisible by 5 microbatches; the driver
        # validates n_micro before data prep.
        (["--depth", "5", "--hidden", "32", "--pipeline", "4",
          "--pp-micro", "5"], "not divisible by n_micro=5"),
    ):
        args = [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
                "--config", "3", "--epochs", "1"] + bad
        out = subprocess.run(args, env=env, capture_output=True, text=True,
                             timeout=600)
        assert out.returncode != 0
        assert msg in out.stderr, (bad, out.stderr[-2000:])
