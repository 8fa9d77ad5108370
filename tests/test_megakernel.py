"""Tower megakernel parity: forward values, param gradients, joint loss.

Interpret mode on CPU (the same code lowers for real on TPU —
scripts/bench_megakernel.py measures it there). ε is injected so the
megakernel and the jnp reference see identical randomness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig
from vae_assoc_tpu.kernels.megakernel import vae_tower_fused
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.models import networks
from vae_assoc_tpu.models import vae as vae_mod
from vae_assoc_tpu.ops import losses

ARCH = dict(
    n_input=36, n_z=6, n_hidden_recog_1=24, n_hidden_recog_2=20,
    n_hidden_gener_1=20, n_hidden_gener_2=24,
)


def _ref_terms(params, x, eps, kind):
    cfg = ModalityConfig("m", ARCH, recon=kind)
    out = vae_mod.vae_forward(params, x, cfg, eps=eps)
    if kind == "bernoulli":
        rec = losses.bernoulli_recon(x, logits=out.recon)
    else:
        rec = losses.gaussian_recon(x, out.recon)
    kl = losses.kl_divergence(out.z_mean, out.z_logvar)
    return {"mu": out.z_mean, "lv": out.z_logvar, "recon_term": rec, "kl_term": kl}


@pytest.mark.parametrize("kind", ["bernoulli", "gaussian"])
@pytest.mark.parametrize("batch", [16, 37])  # 37: ragged ceil-div grid
def test_tower_forward_parity(rng, kind, batch):
    params = networks.init_mlp_vae_params(jax.random.key(0), ARCH)
    x = jnp.asarray(rng.uniform(0, 1, (batch, 36)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(batch, 6)).astype(np.float32))
    got = vae_tower_fused(params, x, kind=kind, eps=eps)
    want = _ref_terms(params, x, eps, kind)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5, err_msg=k
        )


@pytest.mark.parametrize("kind", ["bernoulli", "gaussian"])
@pytest.mark.parametrize("batch", [16, 37])
def test_tower_param_grad_parity(rng, kind, batch):
    params = networks.init_mlp_vae_params(jax.random.key(1), ARCH)
    x = jnp.asarray(rng.uniform(0, 1, (batch, 36)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(batch, 6)).astype(np.float32))
    # Random mix over every output so all VJP paths carry signal.
    wmu = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))

    def total_mega(p):
        o = vae_tower_fused(p, x, kind=kind, eps=eps)
        return (
            jnp.mean(o["recon_term"]) + jnp.mean(o["kl_term"])
            + jnp.mean(o["mu"] @ wmu) + jnp.mean(jnp.sin(o["lv"]))
        )

    def total_ref(p):
        o = _ref_terms(p, x, eps, kind)
        return (
            jnp.mean(o["recon_term"]) + jnp.mean(o["kl_term"])
            + jnp.mean(o["mu"] @ wmu) + jnp.mean(jnp.sin(o["lv"]))
        )

    g_m = jax.grad(total_mega)(params)
    g_r = jax.grad(total_ref)(params)
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_assoc_loss_mega_matches_jnp_path(rng):
    cfg = AssocConfig(
        [
            ModalityConfig("image", ARCH, recon="bernoulli"),
            ModalityConfig("trajectory", ARCH, recon="gaussian"),
        ],
        assoc_lambda=0.7,
    )
    params = assoc_mod.init_assoc(jax.random.key(2), cfg)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (24, 36)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(24, 36)).astype(np.float32)),
    ]
    eps = [jnp.asarray(rng.normal(size=(24, 6)).astype(np.float32)) for _ in range(2)]
    t_m, m_m = assoc_mod.assoc_loss_fn(params, xs, cfg, eps=eps, use_pallas="mega")
    t_r, m_r = assoc_mod.assoc_loss_fn(params, xs, cfg, eps=eps, use_pallas=False)
    np.testing.assert_allclose(float(t_m), float(t_r), rtol=1e-5)
    for k in m_r:
        np.testing.assert_allclose(float(m_m[k]), float(m_r[k]), rtol=1e-5, err_msg=k)

    g_m = jax.grad(
        lambda p: assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas="mega")[0]
    )(params)
    g_r = jax.grad(
        lambda p: assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas=False)[0]
    )(params)
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_train_step_with_megakernel_learns(rng):
    from vae_assoc_tpu.configs import TrainConfig
    from vae_assoc_tpu.train.step import init_train_state, make_train_step

    cfg = AssocConfig(
        [
            ModalityConfig("image", ARCH, recon="bernoulli"),
            ModalityConfig("trajectory", ARCH, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    tc = TrainConfig(batch_size=16, use_pallas="mega")
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 36)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 36)).astype(np.float32)),
    ]
    hist = []
    for _ in range(15):
        state, m = step(state, xs)
        hist.append(float(m["total"]))
    assert np.isfinite(hist).all() and hist[-1] < hist[0]


def test_mega_fallback_warns_with_reason(rng):
    """use_pallas='mega' on a config the megakernel cannot serve must warn
    (once per trace) instead of silently dropping to the composable
    kernels (VERDICT r3 weak #2) — and mega_fallback_reason is the one
    source for the gate."""
    import warnings

    deep_arch = dict(ARCH, n_hidden_recog_3=16)
    cfg = AssocConfig(
        [
            ModalityConfig("image", deep_arch, recon="bernoulli"),
            ModalityConfig("trajectory", ARCH, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    assert "depth-2" in assoc_mod.mega_fallback_reason(cfg)
    params = assoc_mod.init_assoc(jax.random.key(0), cfg)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 36)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 36)).astype(np.float32)),
    ]
    eps = [jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32)) for _ in range(2)]
    # Dedicated category (round-4 ADVICE): `-W error` processes can
    # whitelist exactly this documented fallback notice.
    with pytest.warns(assoc_mod.MegaFallbackWarning,
                      match="fell back to the composable"):
        assoc_mod.assoc_loss_fn(params, xs, cfg, eps=eps, use_pallas="mega")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # everything else is fatal...
        warnings.simplefilter("ignore", assoc_mod.MegaFallbackWarning)
        assoc_mod.assoc_loss_fn(params, xs, cfg, eps=eps, use_pallas="mega")

    # The mega-eligible config must NOT warn.
    cfg_ok = AssocConfig(
        [
            ModalityConfig("image", ARCH, recon="bernoulli"),
            ModalityConfig("trajectory", ARCH, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    assert assoc_mod.mega_fallback_reason(cfg_ok) is None
    params_ok = assoc_mod.init_assoc(jax.random.key(0), cfg_ok)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assoc_mod.assoc_loss_fn(params_ok, xs, cfg_ok, eps=eps, use_pallas="mega")


def test_mega_vmem_planner_tiers():
    """Round-5 VMEM plan (found by the MFU geometry map, where a
    hidden-2048 tower Mosaic-OOM'd at compile time): reference-scale
    towers keep their measured default-limit tiles; mid-size towers plan
    under a raised vmem_limit_bytes; towers whose weights outgrow the plan
    are gated to the composable fallback chain by mega_fallback_reason."""
    from vae_assoc_tpu.kernels import megakernel as mk

    def arch(n_input, hidden, n_z):
        return dict(n_input=n_input, n_z=n_z,
                    n_hidden_recog_1=hidden, n_hidden_recog_2=hidden,
                    n_hidden_gener_1=hidden, n_hidden_gener_2=hidden)

    # reference scale: bit-identical plan to round 4 (tile 256, no request)
    widths = (784, 500, 500, 20, 500, 500, 784)
    tile, req = mk._plan_tile(16384, mk._weight_bytes(widths), max(widths), 8)
    assert (tile, req) == (256, None)
    assert mk.tower_vmem_reason(arch(784, 500, 20)) is None

    # mid-size: feasible with a raised limit
    w1024 = (1024, 1024, 1024, 128, 1024, 1024, 1024)
    tile, req = mk._plan_tile(16384, mk._weight_bytes(w1024), max(w1024), 8)
    assert tile >= 8 and req is not None and req > 16 * 1024 * 1024
    assert req <= mk._VMEM_REQUEST_MAX
    assert mk.tower_vmem_reason(arch(1024, 1024, 128)) is None

    # wide: infeasible -> reason -> loud composable fallback that RUNS
    assert mk.tower_vmem_reason(arch(1024, 2048, 128)) is not None
    cfg_w = AssocConfig(
        [
            ModalityConfig("image", arch(64, 2048, 8), recon="bernoulli"),
            ModalityConfig("trajectory", arch(64, 2048, 8), recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    reason = assoc_mod.mega_fallback_reason(cfg_w)
    assert reason is not None and "VMEM" in reason
    params = assoc_mod.init_assoc(jax.random.key(0), cfg_w)
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.uniform(0, 1, (16, 64)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32)),
    ]
    eps = [jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)) for _ in range(2)]
    with pytest.warns(assoc_mod.MegaFallbackWarning, match="VMEM"):
        total, _ = assoc_mod.assoc_loss_fn(params, xs, cfg_w, eps=eps,
                                           use_pallas="mega")
    assert np.isfinite(float(total))
