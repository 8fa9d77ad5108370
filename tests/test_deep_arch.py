"""Arbitrary-depth MLP towers (round 3).

The reference's arch dicts have exactly two hidden layers per net
(SURVEY.md §2.1); the rebuild generalizes the SAME key scheme to any depth
via contiguous ``n_hidden_recog_k`` / ``n_hidden_gener_k`` keys
(configs.validate_arch). These tests pin the whole surface:

  * validation semantics (contiguity, unknown keys loud, conv = depth 2);
  * depth-2 init stays bit-identical (checkpoint + golden-value compat);
  * the depth-generic fused Pallas kernels (kernels/mlp.py) match the jnp
    path — forward and VJP — at depths 1 and 3, ragged batches included
    (interpret mode here; Mosaic lowering via scripts/smoke_tpu.py);
  * the train step learns at depth 3 on the jnp, composable-kernel, and
    mega (which must FALL BACK to composable) paths;
  * every sharded layout — DP shard_map, TP, FSDP, TP×FSDP, ZeRO — matches
    the single-device trajectory with a depth-3 arch on the 8-device mesh;
  * config serialization round-trips deep archs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import (
    AssocConfig,
    ModalityConfig,
    TrainConfig,
    config_from_dict,
    config_to_dict,
    default_image_arch,
    gener_widths,
    recog_widths,
    validate_arch,
)
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.models import networks
from vae_assoc_tpu.train.step import init_train_state, make_train_step

N_DEV = 8


def deep_arch(depth=3, hidden=16, n_input=24, n_z=4):
    out = dict(n_input=n_input, n_z=n_z)
    for k in range(1, depth + 1):
        out[f"n_hidden_recog_{k}"] = hidden
        out[f"n_hidden_gener_{k}"] = hidden
    return out


def deep_cfg(depth=3, assoc_lambda=0.5, n_cond=0):
    return AssocConfig(
        [
            ModalityConfig("image", deep_arch(depth), recon="bernoulli", n_cond=n_cond),
            ModalityConfig(
                "trajectory", deep_arch(depth), recon="gaussian", n_cond=n_cond
            ),
        ],
        assoc_lambda=assoc_lambda,
    )


def _batches(rng, n=32, d=24):
    return [
        rng.uniform(0, 1, (n, d)).astype(np.float32),
        rng.normal(size=(n, d)).astype(np.float32),
    ]


# ---------------------------------------------------------------------------
# Validation
# ---------------------------------------------------------------------------


def test_validate_accepts_deep_and_reports_widths():
    arch = validate_arch(deep_arch(depth=4, hidden=8))
    assert recog_widths(arch) == (8, 8, 8, 8)
    assert gener_widths(arch) == (8, 8, 8, 8)


def test_validate_allows_asymmetric_depths():
    a = deep_arch(depth=2)
    a["n_hidden_gener_3"] = 16
    arch = validate_arch(a)
    assert len(recog_widths(arch)) == 2 and len(gener_widths(arch)) == 3


def test_validate_rejects_gap():
    a = deep_arch(depth=2)
    a["n_hidden_recog_4"] = 16  # no _3
    with pytest.raises(ValueError, match="contiguous"):
        validate_arch(a)


def test_validate_rejects_unknown_key():
    a = deep_arch(depth=2)
    a["n_hidden_recogn_1"] = 16  # typo — earlier versions dropped silently
    with pytest.raises(ValueError, match="unrecognized"):
        validate_arch(a)


def test_validate_requires_some_hidden():
    with pytest.raises(ValueError, match="n_hidden_gener"):
        validate_arch(
            dict(n_input=24, n_z=4, n_hidden_recog_1=16)
        )


def test_conv_rejects_deep_arch():
    with pytest.raises(ValueError, match="2-hidden-layer"):
        ModalityConfig("image", deep_arch(depth=3, n_input=784), encoder="conv")


def test_default_arch_depth_param():
    arch = validate_arch(default_image_arch(hidden=32, depth=3))
    assert recog_widths(arch) == (32, 32, 32)


# ---------------------------------------------------------------------------
# Init + params structure
# ---------------------------------------------------------------------------


def test_depth2_init_bit_identical_to_reference_layout():
    """The loop-based init must reproduce the original fixed-depth init
    bit-for-bit (same key-split count/order) so round-2 checkpoints and the
    bitwise-parity golden values stay valid."""
    arch = validate_arch(default_image_arch())
    key = jax.random.PRNGKey(0)
    p = networks.init_mlp_vae_params(key, arch)
    ks = jax.random.split(key, 7)
    sizes = [(784, 500), (500, 500), (500, 20), (500, 20), (20, 500), (500, 500), (500, 784)]
    leaves = [
        p["recog"]["h1"], p["recog"]["h2"], p["recog"]["out_mean"],
        p["recog"]["out_logvar"], p["gener"]["h1"], p["gener"]["h2"],
        p["gener"]["out"],
    ]
    for k, (n_in, n_out), leaf in zip(ks, sizes, leaves):
        np.testing.assert_array_equal(
            np.asarray(leaf["w"]),
            np.asarray(networks.xavier_uniform(k, n_in, n_out)),
        )


def test_deep_init_structure_and_conditional_widening():
    arch = validate_arch(deep_arch(depth=3))
    p = networks.init_mlp_vae_params(jax.random.PRNGKey(1), arch, n_cond=5)
    assert set(p["recog"]) == {"h1", "h2", "h3", "out_mean", "out_logvar"}
    assert set(p["gener"]) == {"h1", "h2", "h3", "out"}
    assert p["recog"]["h1"]["w"].shape == (24 + 5, 16)
    assert p["gener"]["h1"]["w"].shape == (4 + 5, 16)
    assert p["gener"]["out"]["w"].shape == (16, 24)


# ---------------------------------------------------------------------------
# Fused kernels: depth-generic parity (interpret mode on CPU)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("depth", [1, 3])
@pytest.mark.parametrize("batch", [32, 37])  # divisible + ragged
def test_fused_stack_parity_fwd_and_vjp(rng, depth, batch):
    from vae_assoc_tpu.kernels import mlp as kmlp

    arch = validate_arch(deep_arch(depth=depth, hidden=16))
    p = networks.init_mlp_vae_params(jax.random.PRNGKey(2), arch)
    x = jnp.asarray(rng.uniform(0, 1, (batch, 24)).astype(np.float32))

    def run(encode, decode, p):
        mu, lv = encode(p, x)
        out = decode(p, mu * 0.9 + lv * 0.1)
        return jnp.sum(mu**2) + jnp.sum(lv**2) * 0.5 + jnp.sum(out**2) * 1e-2

    l_j, g_j = jax.value_and_grad(
        lambda p: run(networks.encode_mlp, networks.decode_mlp, p)
    )(p)
    l_k, g_k = jax.value_and_grad(
        lambda p: run(kmlp.encode_mlp_fused, kmlp.decode_mlp_fused, p)
    )(p)
    np.testing.assert_allclose(float(l_j), float(l_k), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_j), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_deep_tile_cap_backs_off():
    """The VMEM planner's four regimes: (a) the depth-2 reference keeps its
    measured tiles under Mosaic's DEFAULT scoped limit (no vmem_limit_bytes
    request — the calibrated compilation is byte-identical); (b) moderately
    deeper stacks keep the full 256 tile but request a raised limit;
    (c) deeper/wider stacks back off the batch tile too; (d) stacks whose
    weights + grad accumulators overflow the planning budget return cap 0
    (route to XLA)."""
    from vae_assoc_tpu.kernels.mlp import (
        _stack_act_lanes,
        _stack_tile_cap,
        _stack_vmem_request,
    )

    def fake_flat(widths, n_z, heads):
        flat = []
        prev = widths[0]
        for w in widths[1:]:
            flat += [np.zeros((prev, w), np.float32), np.zeros((1, w), np.float32)]
            prev = w
        for _ in range(heads):
            flat += [np.zeros((prev, n_z), np.float32), np.zeros((1, n_z), np.float32)]
        return tuple(flat)

    # (a) Reference encoder (784/500/500 → 20×2 heads): cap ≥ 256 and NO
    # raised-limit request at the production tiles.
    ref = fake_flat((784, 500, 500), 20, heads=2)
    lanes = _stack_act_lanes(784, ref[:4:2], 20, heads=2)
    assert _stack_tile_cap(ref, lanes, accum=True) >= 256
    assert _stack_vmem_request(ref, lanes, 256, accum=True) is None
    assert _stack_vmem_request(ref, lanes, 256, accum=False) is None
    # (b) Depth 4 × 512: full 256 tile, but the backward estimate exceeds
    # the default scoped limit — a raised vmem_limit_bytes is requested
    # (this exact arch Mosaic-OOMed at 19.29 MiB under the default).
    mid = fake_flat((784, 512, 512, 512, 512), 20, heads=2)
    lanes = _stack_act_lanes(784, mid[:8:2], 20, heads=2)
    assert _stack_tile_cap(mid, lanes, accum=True) >= 256
    req = _stack_vmem_request(mid, lanes, 256, accum=True)
    assert req is not None and 20 * 2**20 < req <= 64 * 2**20
    # (c) Depth 6 × 640: weights + accumulators crowd the planning budget —
    # the cap backs off strictly between the 8-row floor and 256.
    wide = fake_flat((784, 640, 640, 640, 640, 640, 640), 20, heads=2)
    lanes = _stack_act_lanes(784, wide[:12:2], 20, heads=2)
    cap = _stack_tile_cap(wide, lanes, accum=True)
    assert 8 <= cap < 256
    assert _stack_vmem_request(wide, lanes, cap, accum=True) is not None
    # (d) A deep wide stack (784 + 6×1024): the weights + grad accumulators
    # alone overflow the budget — cap 0 means "no tile works, use XLA".
    deep = fake_flat((784, 1024, 1024, 1024, 1024, 1024, 1024), 64, heads=2)
    lanes = _stack_act_lanes(784, deep[:12:2], 64, heads=2)
    assert _stack_tile_cap(deep, lanes, accum=True) == 0


def test_vmem_overflow_arch_routes_to_xla(rng, monkeypatch):
    """An arch whose weights cannot stay VMEM-resident must route the public
    wrappers to the XLA path in EVERY mode (the CPU interpret kernels would
    happily run it, then real TPU would Mosaic-OOM — the gate keeps test and
    prod behavior identical). Proven by poisoning the kernel entry points:
    the giant arch must not touch them; the reference arch must."""
    from vae_assoc_tpu.kernels import mlp as kmlp

    giant = validate_arch(deep_arch(depth=6, hidden=1024, n_input=784, n_z=64))
    p_giant = networks.init_mlp_vae_params(jax.random.PRNGKey(0), giant)
    small = validate_arch(deep_arch(depth=2, hidden=32, n_input=24, n_z=4))
    p_small = networks.init_mlp_vae_params(jax.random.PRNGKey(0), small)

    def boom(*a, **k):
        raise AssertionError("kernel path taken")

    monkeypatch.setattr(kmlp, "_encode_fused", boom)
    monkeypatch.setattr(kmlp, "_decode_fused", boom)
    x = jnp.asarray(rng.uniform(0, 1, (16, 784)).astype(np.float32))
    mu, lv = kmlp.encode_mlp_fused(p_giant, x)
    out = kmlp.decode_mlp_fused(p_giant, mu)
    assert out.shape == (16, 784) and np.all(np.isfinite(np.asarray(out)))
    # Gradients flow through the XLA route too (the custom_vjp is bypassed).
    g = jax.grad(lambda p: jnp.sum(kmlp.encode_mlp_fused(p, x)[0] ** 2))(p_giant)
    assert np.isfinite(float(jnp.asarray(jax.tree.leaves(g)[0]).sum()))
    with pytest.raises(AssertionError, match="kernel path taken"):
        kmlp.encode_mlp_fused(
            p_small, jnp.asarray(rng.uniform(0, 1, (16, 24)).astype(np.float32))
        )


# ---------------------------------------------------------------------------
# Train step at depth 3: every kernel path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_pallas", [False, True, "mega"])
def test_deep_train_step_learns(rng, use_pallas):
    cfg = deep_cfg(depth=3)
    tc = TrainConfig(batch_size=32, learning_rate=2e-3, use_pallas=use_pallas)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [jnp.asarray(x) for x in _batches(rng)]
    first = last = None
    for _ in range(30):
        state, m = step(state, xs)
        if first is None:
            first = float(m["total"])
        last = float(m["total"])
    assert np.isfinite(last) and last < first


def test_mega_falls_back_to_composable_at_depth3(rng):
    """The tower megakernel is depth-2 by design; 'mega' on a deep arch
    must route through the depth-generic composable path with identical
    gradients (the documented fallback contract)."""
    cfg = deep_cfg(depth=3)
    xs = [jnp.asarray(x) for x in _batches(rng)]
    eps = [jnp.zeros((32, 4), jnp.float32)] * 2
    p = assoc_mod.init_assoc(jax.random.PRNGKey(3), cfg)

    def loss(p, up):
        return assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas=up)[0]

    l_t, g_t = jax.value_and_grad(lambda p: loss(p, True))(p)
    l_m, g_m = jax.value_and_grad(lambda p: loss(p, "mega"))(p)
    np.testing.assert_allclose(float(l_t), float(l_m), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_t), jax.tree.leaves(g_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_deep_conditional_train_step(rng):
    cfg = deep_cfg(depth=3, n_cond=3)
    tc = TrainConfig(batch_size=32, learning_rate=2e-3, use_pallas=True)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    cond = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 3, 32)), 3, dtype=jnp.float32
    )
    xs = [jnp.asarray(x) for x in _batches(rng)] + [cond]
    state, m = step(state, xs)
    assert np.isfinite(float(m["total"]))


# ---------------------------------------------------------------------------
# Sharded layouts at depth 3 (8-virtual-device CPU mesh)
# ---------------------------------------------------------------------------


def _leaf_allclose(a_tree, b_tree, rtol=3e-5, atol=1e-6):
    for a, b in zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


def test_deep_dp_gradient_matches_single_device(rng):
    """psum'd per-shard gradients == single-device gradient with the same
    injected ε (the DP *step* folds shard indices into its ε stream, so
    trajectory comparison is the wrong probe — same as test_parallel.py)."""
    from jax.sharding import PartitionSpec as P

    from vae_assoc_tpu.parallel import make_mesh

    cfg = deep_cfg(depth=3)
    mesh = make_mesh(N_DEV)
    params = assoc_mod.init_assoc(jax.random.key(0), cfg)
    xs = [jnp.asarray(x) for x in _batches(rng)]
    eps = [jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32)) for _ in range(2)]

    def loss(p, xs, eps):
        return assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas=True)[0]

    g_ref = jax.grad(loss)(params, xs, eps)
    g_dp = jax.jit(
        jax.shard_map(
            lambda p, xs, eps: jax.grad(
                lambda p: jax.lax.pmean(loss(p, list(xs), list(eps)), "data")
            )(p),
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
        )
    )(params, xs, eps)
    _leaf_allclose(g_ref, g_dp, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("layout", ["tp", "fsdp", "tp_fsdp"])
def test_deep_gspmd_layouts_match_single_device(rng, layout):
    from vae_assoc_tpu.parallel import make_mesh
    from vae_assoc_tpu.parallel.fsdp import init_fsdp_train_state, make_fsdp_train_step
    from vae_assoc_tpu.parallel.tp import (
        init_tp_train_state,
        make_tp_train_step,
        shard_tp_batch,
    )
    from vae_assoc_tpu.parallel.tp_fsdp import (
        init_tp_fsdp_train_state,
        make_tp_fsdp_train_step,
    )
    from vae_assoc_tpu.parallel import shard_batch

    cfg = deep_cfg(depth=3)
    tc = TrainConfig(batch_size=32, learning_rate=1e-3)
    if layout == "tp":
        mesh = make_mesh(N_DEV, model_axis="model", model_parallel=2)
        state = init_tp_train_state(cfg, tc, mesh)
        step = make_tp_train_step(cfg, tc, mesh)
        shard = lambda xs: shard_tp_batch(mesh, xs)  # noqa: E731
    elif layout == "fsdp":
        mesh = make_mesh(N_DEV)
        state = init_fsdp_train_state(cfg, tc, mesh)
        step = make_fsdp_train_step(cfg, tc, mesh)
        shard = lambda xs: shard_batch(mesh, xs)  # noqa: E731
    else:
        mesh = make_mesh(N_DEV, model_axis="model", model_parallel=2)
        state = init_tp_fsdp_train_state(cfg, tc, mesh)
        step = make_tp_fsdp_train_step(cfg, tc, mesh)
        shard = lambda xs: shard_tp_batch(mesh, xs)  # noqa: E731

    ref_state = init_train_state(cfg, tc)
    ref_step = make_train_step(cfg, tc)
    for _ in range(2):
        xs = _batches(rng)
        ref_state, rm = ref_step(ref_state, [jnp.asarray(x) for x in xs])
        state, m = step(state, shard(xs))
        np.testing.assert_allclose(float(rm["total"]), float(m["total"]), rtol=2e-5)
    _leaf_allclose(ref_state.params, state.params)


def test_deep_tp_shards_odd_layers(rng):
    """Depth-3 Megatron alternation: h1/h3 column-parallel, h2 row-parallel."""
    from jax.sharding import PartitionSpec as P

    from vae_assoc_tpu.parallel.tp import tp_param_specs

    specs = tp_param_specs(deep_cfg(depth=3))["modalities"][0]["recog"]
    assert specs["h1"]["w"] == P(None, "model")
    assert specs["h2"]["w"] == P("model", None)
    assert specs["h3"]["w"] == P(None, "model")


def test_deep_zero_matches_dp(rng):
    from vae_assoc_tpu.parallel import (
        gather_zero_train_state,
        init_dp_train_state,
        init_zero_train_state,
        make_dp_train_step,
        make_mesh,
        make_zero_train_step,
        shard_batch,
    )

    cfg = deep_cfg(depth=3)
    tc = TrainConfig(batch_size=32, learning_rate=1e-3, use_pallas=True)
    mesh = make_mesh(N_DEV)
    dp_state = init_dp_train_state(cfg, tc, mesh)
    dp_step = make_dp_train_step(cfg, tc, mesh)
    z_state = init_zero_train_state(cfg, tc, mesh)
    z_step = make_zero_train_step(cfg, tc, mesh)
    for _ in range(2):
        xs = _batches(rng)
        dp_state, dm = dp_step(dp_state, shard_batch(mesh, xs))
        z_state, zm = z_step(z_state, shard_batch(mesh, xs))
        np.testing.assert_allclose(float(dm["total"]), float(zm["total"]), rtol=2e-5)
    z_full = gather_zero_train_state(z_state, cfg, tc)
    _leaf_allclose(dp_state.params, z_full.params)


# ---------------------------------------------------------------------------
# Serialization + public API
# ---------------------------------------------------------------------------


def test_deep_config_roundtrip():
    cfg = deep_cfg(depth=4)
    tc = TrainConfig(batch_size=16)
    cfg2, tc2 = config_from_dict(config_to_dict(cfg, tc))
    assert cfg2 == cfg and tc2 == tc
    assert recog_widths(cfg2.modalities[0].arch) == (16, 16, 16)[:3] + (16,)


def test_driver_depth_flag(tmp_path):
    """`--depth 3 --hidden 24` trains end-to-end and records the deep arch
    in the self-describing checkpoint; `--depth` on the conv config exits
    loudly."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    )
    ckpt = tmp_path / "ckpt"
    out = subprocess.run(
        [
            sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
            "--config", "3", "--depth", "3", "--hidden", "24",
            "--n-samples", "128", "--batch-size", "32", "--epochs", "2",
            "--ckpt-dir", str(ckpt),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    import json

    raw = json.loads((ckpt / "model_config.json").read_text())
    arch = raw["modalities"][0]["arch"]
    assert arch["n_hidden_recog_3"] == 24 and "n_hidden_recog_4" not in arch

    bad = subprocess.run(
        [
            sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
            "--config", "4", "--depth", "3", "--n-samples", "64",
            "--epochs", "1",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert bad.returncode != 0
    assert "conv towers are fixed" in (bad.stderr + bad.stdout)


def test_deep_api_verbs(rng, tmp_path):
    from vae_assoc_tpu import api

    model = api.AssocVariationalAutoEncoder(
        [deep_arch(depth=3), deep_arch(depth=3)],
        recon_types=["bernoulli", "gaussian"],
        learning_rate=1e-3,
        batch_size=16,
        assoc_lambda=0.5,
    )
    xs = _batches(rng, n=16)
    c0 = model.partial_fit(xs)
    for _ in range(5):
        c = model.partial_fit(xs)
    assert np.isfinite(c) and c < c0 * 1.5
    zs = model.transform(xs)
    assert zs[0].shape == (16, 4)
    y = model.cross_generate(xs[0], 0, 1)
    assert y.shape == (16, 24)
    model.save_model(str(tmp_path / "deep"))
    m2 = api.AssocVariationalAutoEncoder.load(str(tmp_path / "deep"))
    _leaf_allclose(model.state.params, m2.state.params, rtol=0, atol=0)
