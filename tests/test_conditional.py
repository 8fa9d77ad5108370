"""Conditional (label-conditioned) VAE — ModalityConfig.n_cond.

The condition vector is concatenated at the call boundary (encoder input,
decoder latent), so the width-agnostic kernel paths run unchanged; it
rides batch lists as ONE trailing entry (models/assoc.split_cond), so the
scan/shard/eval plumbing transports it without modification.
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
    default_traj_arch,
)
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.models import vae as vae_mod
from vae_assoc_tpu.train.step import init_train_state, make_train_step

N_COND = 4


def _cfg(hidden=32, n_cond=N_COND, **kw):
    return AssocConfig(
        [
            ModalityConfig("image", default_image_arch(hidden=hidden),
                           n_cond=n_cond),
            ModalityConfig("trajectory", default_traj_arch(hidden=hidden),
                           recon="gaussian", n_cond=n_cond),
        ],
        **kw,
    )


def _batch(b=16, seed=0, n_cond=N_COND):
    r = np.random.RandomState(seed)
    return [
        jnp.asarray(r.rand(b, 784), jnp.float32),
        jnp.asarray(r.randn(b, 200), jnp.float32),
        jnp.asarray(r.randint(0, n_cond, b), jnp.int32),
    ]


# ---------------------------------------------------------------------------
# Config + init surface
# ---------------------------------------------------------------------------


def test_config_validation():
    with pytest.raises(ValueError, match="n_cond"):
        ModalityConfig("image", default_image_arch(), n_cond=-1)
    with pytest.raises(ValueError, match="MLP towers"):
        ModalityConfig("image", default_image_arch(), encoder="conv", n_cond=3)
    with pytest.raises(ValueError, match="share n_cond"):
        AssocConfig([
            ModalityConfig("a", default_image_arch(), n_cond=3),
            ModalityConfig("b", default_image_arch(), n_cond=5),
        ])
    assert _cfg().n_cond == N_COND


def test_config_json_roundtrip():
    cfg = _cfg()
    cfg2, _ = config_from_dict(config_to_dict(cfg))
    assert cfg2 == cfg
    assert cfg2.n_cond == N_COND


def test_init_widths():
    params = assoc_mod.init_assoc(jax.random.key(0), _cfg(hidden=32))
    img = params["modalities"][0]
    assert img["recog"]["h1"]["w"].shape == (784 + N_COND, 32)
    assert img["gener"]["h1"]["w"].shape == (20 + N_COND, 32)
    # Output widths unchanged: recon compares against the RAW x.
    assert img["gener"]["out"]["w"].shape == (32, 784)


def test_prepare_cond():
    m = ModalityConfig("image", default_image_arch(), n_cond=3)
    # int labels -> one-hot
    c = vae_mod.prepare_cond(jnp.array([0, 2, 1]), m, 3)
    np.testing.assert_array_equal(np.asarray(c),
                                  [[1, 0, 0], [0, 0, 1], [0, 1, 0]])
    # already-encoded passes through as fp32
    c2 = vae_mod.prepare_cond(np.eye(3, dtype=np.float64), m, 3)
    assert c2.dtype == jnp.float32
    with pytest.raises(ValueError, match="conditional"):
        vae_mod.prepare_cond(None, m, 3)
    with pytest.raises(ValueError, match="got shape"):
        vae_mod.prepare_cond(jnp.ones((3, 5)), m, 3)
    with pytest.raises(ValueError, match="batch"):
        vae_mod.prepare_cond(jnp.array([0, 1]), m, 3)
    m0 = ModalityConfig("image", default_image_arch())
    with pytest.raises(ValueError, match="unconditional"):
        vae_mod.prepare_cond(jnp.array([0]), m0, 1)
    assert vae_mod.prepare_cond(None, m0, 7) is None


def test_split_cond_conventions():
    cfg = _cfg()
    xs = _batch()
    got, cond = assoc_mod.split_cond(xs, cfg)
    assert len(got) == 2 and cond is xs[2]
    got2, cond2 = assoc_mod.split_cond(xs[:2], cfg, cond=xs[2])
    assert cond2 is xs[2]
    with pytest.raises(ValueError, match="both"):
        assoc_mod.split_cond(xs, cfg, cond=xs[2])
    with pytest.raises(ValueError, match="conditional model"):
        assoc_mod.split_cond(xs[:2], cfg)
    cfg0 = AssocConfig([ModalityConfig("image", default_image_arch())])
    with pytest.raises(ValueError, match="unconditional"):
        assoc_mod.split_cond([xs[0]], cfg0, cond=xs[2])
    with pytest.raises(ValueError, match="expected 1 modality"):
        assoc_mod.split_cond([xs[0], xs[2]], cfg0)


# ---------------------------------------------------------------------------
# Training + semantics
# ---------------------------------------------------------------------------


def test_conditional_step_learns():
    cfg = _cfg()
    tc = TrainConfig(batch_size=16)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = _batch()
    totals = []
    for _ in range(60):
        state, m = step(state, xs)
        totals.append(float(m["total"]))
    # Random-noise data has a high entropy floor; assert a solid descent,
    # not a fit.
    assert totals[-1] < totals[0] * 0.85, totals[::20]
    assert totals[-1] < totals[10], totals[::20]


def test_condition_steers_generation():
    """Train on data where the label DETERMINES the image; the same latent
    decoded under different conditions must produce different outputs
    (the unconditional model structurally cannot)."""
    r = np.random.RandomState(0)
    b = 64
    labels = r.randint(0, 2, b)
    protos = np.stack([np.linspace(0, 1, 784) * 0.9 + 0.05,
                       np.linspace(1, 0, 784) * 0.9 + 0.05])
    imgs = protos[labels] + 0.01 * r.randn(b, 784)
    trajs = np.tile(labels[:, None].astype(np.float32) * 2 - 1, (1, 200))
    cfg = _cfg(hidden=64, n_cond=2, assoc_lambda=1.0)
    tc = TrainConfig(batch_size=b, learning_rate=3e-3)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [jnp.asarray(np.clip(imgs, 0, 1), jnp.float32),
          jnp.asarray(trajs, jnp.float32),
          jnp.asarray(labels, jnp.int32)]
    for _ in range(150):
        state, m = step(state, xs)
    z = jnp.zeros((1, cfg.n_z), jnp.float32)
    out0 = assoc_mod.generate(state.params, z, cfg, "image",
                              cond=jnp.array([0], jnp.int32))
    out1 = assoc_mod.generate(state.params, z, cfg, "image",
                              cond=jnp.array([1], jnp.int32))
    # The two class prototypes are anti-correlated ramps; the conditional
    # decodes must track them.
    c0 = np.corrcoef(np.asarray(out0)[0], protos[0])[0, 1]
    c1 = np.corrcoef(np.asarray(out1)[0], protos[1])[0, 1]
    assert c0 > 0.8 and c1 > 0.8, (c0, c1)
    assert float(jnp.mean(jnp.abs(out0 - out1))) > 0.1


@pytest.mark.parametrize("use_pallas", [True])
def test_conditional_kernel_parity(use_pallas):
    """Pallas kernels see pre-concatenated inputs + widened params — grads
    must match the jnp path with identical injected ε."""
    cfg = _cfg()
    params = assoc_mod.init_assoc(jax.random.key(1), cfg)
    xs = _batch()
    r = np.random.RandomState(3)
    eps = [jnp.asarray(r.randn(16, 20), jnp.float32) for _ in range(2)]

    def loss(p, up):
        t, _ = assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas=up)
        return t

    g_jnp = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, use_pallas))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
        g_jnp, g_pal,
    )


def test_mega_conditional_parity():
    """use_pallas='mega' now serves conditional configs directly (round 4:
    the cond widens the encoder input at the call boundary and the kernel
    re-reads its columns at the decoder concat point) — loss, metrics, AND
    param grads must match the jnp path with identical injected ε."""
    cfg = _cfg()
    params = assoc_mod.init_assoc(jax.random.key(1), cfg)
    xs = _batch()
    eps = [jnp.asarray(np.random.RandomState(3).randn(16, 20), jnp.float32)
           for _ in range(2)]
    # No fallback: the gate must accept the conditional config.
    assert assoc_mod.mega_fallback_reason(cfg) is None
    t_mega, m_mega = assoc_mod.assoc_loss_fn(
        params, xs, cfg, eps=eps, use_pallas="mega")
    t_ref, m_ref = assoc_mod.assoc_loss_fn(
        params, xs, cfg, eps=eps, use_pallas=False)
    np.testing.assert_allclose(float(t_mega), float(t_ref), rtol=1e-5)
    for k in m_ref:
        np.testing.assert_allclose(
            float(m_mega[k]), float(m_ref[k]), rtol=1e-5, err_msg=k)

    g_m = jax.grad(
        lambda p: assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas="mega")[0]
    )(params)
    g_r = jax.grad(
        lambda p: assoc_mod.assoc_loss_fn(p, xs, cfg, eps=eps, use_pallas=False)[0]
    )(params)
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_dp_shard_map_with_cond():
    """The trailing cond entry shards over the data mesh like any batch
    array; DP metrics == single-device metrics on the same global batch
    modulo per-shard ε (compare with injected-ε-free structural checks:
    identical cond plumbing -> finite, decreasing loss; grads synced)."""
    from vae_assoc_tpu.parallel import (
        init_dp_train_state,
        make_dp_train_step,
        make_mesh,
        shard_batch,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(8)
    cfg = _cfg()
    tc = TrainConfig(batch_size=32)
    dstate = init_dp_train_state(cfg, tc, mesh)
    dstep = make_dp_train_step(cfg, tc, mesh)
    xs = _batch(b=32)
    t0 = None
    for _ in range(5):
        dstate, m = dstep(dstate, shard_batch(mesh, xs))
        if t0 is None:
            t0 = float(m["total"])
    assert np.isfinite(float(m["total"]))
    assert float(m["total"]) < t0


# ---------------------------------------------------------------------------
# Eval + API + checkpoints
# ---------------------------------------------------------------------------


def test_eval_paths_with_cond():
    from vae_assoc_tpu.train import eval as eval_mod

    cfg = _cfg()
    params = assoc_mod.init_assoc(jax.random.key(0), cfg)
    xs = _batch(b=24)
    mse = eval_mod.evaluate(params, xs, cfg)
    assert set(mse) == {"image->image", "image->trajectory",
                        "trajectory->image", "trajectory->trajectory"}
    em = eval_mod.eval_metrics(params, xs, cfg, batch_size=16)
    assert np.isfinite(em["total"]) and "mse_image->trajectory" not in em
    mll = eval_mod.marginal_log_likelihood(params, xs, cfg, n_importance=8)
    for name in ("image", "trajectory"):
        assert mll[f"iwae_{name}"] >= mll[f"elbo_{name}"] - 1e-5
    labels = np.asarray(xs[2])
    rec = eval_mod.recognition_accuracy(params, xs, labels, cfg, k=3)
    assert "knn_image->trajectory" in rec


def test_api_roundtrip(tmp_path):
    from vae_assoc_tpu.api import AssocVariationalAutoEncoder

    model = AssocVariationalAutoEncoder(
        [default_image_arch(hidden=32), default_traj_arch(hidden=32)],
        recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"],
        n_cond=N_COND,
        batch_size=16,
    )
    xs = [np.asarray(a) for a in _batch()]
    c0 = model.partial_fit(xs)
    c1 = model.partial_fit(xs)
    assert np.isfinite(c0) and np.isfinite(c1)
    zs = model.transform(xs)
    assert zs[0].shape == (16, 20)
    gen = model.generate(cond=np.array([1, 2]))
    assert gen.shape == (2, 784)
    out = model.cross_generate(xs[0], "image", "trajectory", cond=xs[2])
    assert out.shape == (16, 200)
    recs = model.reconstruct(xs)
    assert recs[0].shape == (16, 784)
    recs_s = model.reconstruct(xs, sample=True)
    assert recs_s[1].shape == (16, 200)

    path = str(tmp_path / "ckpt")
    model.save_model(path)
    loaded = AssocVariationalAutoEncoder.load(path)
    assert loaded.config.n_cond == N_COND
    np.testing.assert_allclose(
        np.asarray(loaded.transform(xs)[0]), np.asarray(zs[0]), rtol=1e-6
    )


def test_single_modality_conditional():
    from vae_assoc_tpu.api import VariationalAutoencoder

    m = VariationalAutoencoder(default_image_arch(hidden=32), n_cond=3,
                               batch_size=8)
    X = np.random.RandomState(0).rand(8, 784).astype(np.float32)
    lab = np.arange(8) % 3
    c = m.partial_fit(X, cond=lab)
    assert np.isfinite(c)
    z = m.transform(X, cond=lab)
    assert z.shape == (8, 20)
    rec = m.reconstruct(X, cond=lab)
    assert rec.shape == (8, 784)


def test_checkpoint_resume_conditional(tmp_path):
    from vae_assoc_tpu.utils import checkpoint as ckpt

    cfg = _cfg()
    tc = TrainConfig(batch_size=16)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = _batch()
    state, _ = step(state, xs)
    ckpt.save(str(tmp_path), state)
    restored = ckpt.restore(str(tmp_path), init_train_state(cfg, tc))
    s_a, m_a = step(restored, xs)
    # Continue the original too: identical next-step losses.
    s_b, m_b = step(ckpt.restore(str(tmp_path), init_train_state(cfg, tc)), xs)
    assert float(m_a["total"]) == float(m_b["total"])


def test_driver_conditional_end_to_end(tmp_path):
    """--conditional: n_cond derived from the labels, cond rides through
    train/val/eval/plots; JSONL has the quality metrics."""
    import os
    import subprocess
    import sys

    from vae_assoc_tpu.utils.logging import read_jsonl

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    metrics = tmp_path / "metrics.jsonl"
    plots = tmp_path / "plots"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "96",
         "--batch-size", "32", "--epochs", "2", "--conditional",
         "--val-frac", "0.25", "--metrics", str(metrics),
         "--plots-dir", str(plots)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "conditional: n_cond=" in out.stdout
    recs = read_jsonl(str(metrics))
    assert [r for r in recs if "val_total" in r]
    assert [r for r in recs if "mse_image->trajectory" in r]
    assert (plots / "reconstructions.png").exists()


# ---------------------------------------------------------------------------
# Serving + export surfaces
# ---------------------------------------------------------------------------


def _predictor():
    from vae_assoc_tpu.serve import Predictor

    cfg = _cfg()
    params = assoc_mod.init_assoc(jax.random.key(0), cfg)
    return Predictor(params, cfg), cfg, params


def test_predictor_conditional_endpoints():
    pred, cfg, params = _predictor()
    xs = _batch(b=10)
    cond = np.asarray(xs[2])
    # cross_generate must equal the direct functional call.
    out = pred.cross_generate(np.asarray(xs[0]), "image", "trajectory",
                              cond=cond)
    direct = assoc_mod.cross_generate(
        params, xs[0], cfg, "image", "trajectory", cond=xs[2]
    )
    np.testing.assert_allclose(out, np.asarray(direct), rtol=1e-5, atol=1e-6)
    # transform with trailing labels entry.
    zs = pred.transform([np.asarray(xs[0]), np.asarray(xs[1]), cond])
    zd = assoc_mod.transform(params, xs, cfg)
    np.testing.assert_allclose(zs[0], np.asarray(zd[0]), rtol=1e-5, atol=1e-6)
    # generate with per-class cond.
    z = np.zeros((4, 20), np.float32)
    g = pred.generate(z, "image", cond=np.array([0, 1, 2, 3]))
    assert g.shape == (4, 784)
    # reconstruct passthrough.
    r = pred.reconstruct(np.asarray(xs[0]), "image", cond=cond)
    assert r.shape == (10, 784)
    # missing cond -> clear error.
    with pytest.raises(ValueError, match="needs `cond`"):
        pred.cross_generate(np.asarray(xs[0]), 0, 1)
    # unconditional predictor rejects cond.
    cfg0 = AssocConfig([ModalityConfig("image", default_image_arch(hidden=32))])
    from vae_assoc_tpu.serve import Predictor

    pred0 = Predictor(assoc_mod.init_assoc(jax.random.key(0), cfg0), cfg0)
    with pytest.raises(ValueError, match="unconditional"):
        pred0.cross_generate(np.asarray(xs[0]), 0, 0, cond=cond)


def test_predictor_conditional_warmup():
    pred, cfg, _ = _predictor()
    pred.warmup(buckets=(8,), all_endpoints=True)  # must not raise


def test_microbatcher_conditional():
    """Coalesced conditional requests == direct calls (the [x|cond] hstack
    round-trips), incl. min_batch zero-pad rows carrying a zero cond."""
    from vae_assoc_tpu.serve import MicroBatcher

    pred, cfg, params = _predictor()
    xs = _batch(b=12)
    x = np.asarray(xs[0])
    cond = np.asarray(xs[2])
    direct = np.asarray(assoc_mod.cross_generate(
        params, xs[0], cfg, 0, 1, cond=xs[2]))
    with MicroBatcher(pred, max_wait_ms=20.0, min_batch=16) as mb:
        f1 = mb.submit(x[:5], 0, 1, cond=cond[:5])
        f2 = mb.submit(x[5:], 0, 1, cond=cond[5:])
        np.testing.assert_allclose(f1.result(timeout=60), direct[:5],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(f2.result(timeout=60), direct[5:],
                                   rtol=1e-5, atol=1e-6)
        with pytest.raises(ValueError, match="needs `cond`"):
            mb.submit(x[:2], 0, 1)


def test_exported_predictor_conditional(tmp_path):
    """AOT export of a conditional model: every endpoint gains the cond
    arg, artifacts serve without model code, results match live serving."""
    from vae_assoc_tpu.export import ExportedPredictor, export_predictor

    pred, cfg, params = _predictor()
    out_dir = str(tmp_path / "artifact")
    manifest = export_predictor(pred, out_dir)
    assert manifest["config"]["modalities"][0]["n_cond"] == N_COND
    ep = ExportedPredictor.load(out_dir)
    assert ep.cfg.n_cond == N_COND
    xs = _batch(b=6)
    x, cond = np.asarray(xs[0]), np.asarray(xs[2])
    np.testing.assert_allclose(
        ep.cross_generate(x, "image", "trajectory", cond=cond),
        pred.cross_generate(x, "image", "trajectory", cond=cond),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        ep.transform([x, np.asarray(xs[1]), cond])[1],
        pred.transform([x, np.asarray(xs[1]), cond])[1],
        rtol=1e-4, atol=1e-5,
    )
    z = np.zeros((3, 20), np.float32)
    np.testing.assert_allclose(
        ep.generate(z, 0, cond=np.array([0, 1, 2])),
        pred.generate(z, 0, cond=np.array([0, 1, 2])),
        rtol=1e-4, atol=1e-5,
    )
    with pytest.raises(ValueError, match="needs `cond`"):
        ep.cross_generate(x, 0, 1)


def test_http_server_conditional():
    """ModelServer routes the 'cond' field end-to-end over HTTP."""
    import json
    import urllib.request

    from vae_assoc_tpu.serve_http import ModelServer

    pred, cfg, params = _predictor()
    server = ModelServer(pred, max_batch=32, min_batch=8, warm=False)
    port = server.start()
    try:
        xs = _batch(b=3)
        x = np.asarray(xs[0]).tolist()
        cond = np.asarray(xs[2]).tolist()

        def post(route, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{route}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        st, out = post("/v1/cross_generate",
                       {"inputs": x, "src": 0, "dst": 1, "cond": cond})
        assert st == 200, out
        direct = np.asarray(assoc_mod.cross_generate(
            params, xs[0], cfg, 0, 1, cond=xs[2]))
        np.testing.assert_allclose(np.asarray(out["outputs"]), direct,
                                   rtol=1e-4, atol=1e-5)
        st, out = post("/v1/transform",
                       {"inputs": [x, np.asarray(xs[1]).tolist()],
                        "cond": cond})
        assert st == 200, out
        st, out = post("/v1/cross_generate",
                       {"inputs": x, "src": 0, "dst": 1})
        assert st == 400 and "cond" in out["error"]
    finally:
        server.close()


# ---------------------------------------------------------------------------
# Composition with the parallel layouts / vmapped sweep / fused loop
# ---------------------------------------------------------------------------


def test_fused_loop_conditional():
    from vae_assoc_tpu.train.loop import train_loop_fused

    cfg = _cfg()
    tc = TrainConfig(batch_size=16, steps_per_call=2)
    r = np.random.RandomState(0)
    data = [r.rand(64, 784).astype(np.float32),
            r.randn(64, 200).astype(np.float32),
            np.eye(N_COND, dtype=np.float32)[r.randint(0, N_COND, 64)]]
    state, hist = train_loop_fused(cfg, tc, data, epochs=3)
    assert np.isfinite(hist[-1]["total"])
    assert hist[-1]["total"] < hist[0]["total"]


def test_sweep_conditional():
    """The model-axis vmap transports the trailing cond entry unchanged."""
    from vae_assoc_tpu.train.sweep import (
        init_sweep_state,
        make_sweep_step,
        select_model,
    )

    cfg = _cfg()
    tc = TrainConfig(batch_size=16)
    state = init_sweep_state(cfg, tc, seeds=[0, 1, 2])
    step = make_sweep_step(cfg, tc)
    xs = _batch()
    state, m = step(state, xs)
    assert m["total"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(m["total"])))
    one = select_model(state, 1)
    z = assoc_mod.transform(one.params, xs, cfg)
    assert z[0].shape == (16, 20)


def test_zero_layout_conditional():
    from vae_assoc_tpu.parallel import (
        init_zero_train_state,
        make_mesh,
        make_zero_train_step,
        shard_batch,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_mesh(4)
    cfg = _cfg()
    tc = TrainConfig(batch_size=16)
    zstate = init_zero_train_state(cfg, tc, mesh)
    zstep = make_zero_train_step(cfg, tc, mesh)
    xs = _batch(b=16)
    for _ in range(3):
        zstate, m = zstep(zstate, shard_batch(mesh, xs))
    assert np.isfinite(float(m["total"]))


def test_tp_and_fsdp_layouts_conditional():
    """GSPMD spec trees pattern-match layer names, not widths — the
    widened conditional h1 shards fine under TP and FSDP."""
    from vae_assoc_tpu.parallel import make_mesh
    from vae_assoc_tpu.parallel.fsdp import (
        init_fsdp_train_state,
        make_fsdp_train_step,
    )
    from vae_assoc_tpu.parallel.tp import (
        init_tp_train_state,
        make_tp_train_step,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = _cfg()
    tc = TrainConfig(batch_size=16, use_pallas=False)
    xs = _batch(b=16)

    mesh2d = make_mesh(8, model_axis="model", model_parallel=4)
    tstate = init_tp_train_state(cfg, tc, mesh2d)
    tstep = make_tp_train_step(cfg, tc, mesh2d)
    tstate, tm = tstep(tstate, xs)
    assert np.isfinite(float(tm["total"]))

    mesh1d = make_mesh(8)
    fstate = init_fsdp_train_state(cfg, tc, mesh1d)
    fstep = make_fsdp_train_step(cfg, tc, mesh1d)
    fstate, fm = fstep(fstate, xs)
    assert np.isfinite(float(fm["total"]))


def test_tp_fsdp_combined_conditional():
    from vae_assoc_tpu.parallel import make_mesh
    from vae_assoc_tpu.parallel.tp_fsdp import (
        init_tp_fsdp_train_state,
        make_tp_fsdp_train_step,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = _cfg()
    tc = TrainConfig(batch_size=16, use_pallas=False)
    mesh = make_mesh(8, model_axis="model", model_parallel=2)
    state = init_tp_fsdp_train_state(cfg, tc, mesh)
    step = make_tp_fsdp_train_step(cfg, tc, mesh)
    state, m = step(state, _batch(b=16))
    assert np.isfinite(float(m["total"]))


def test_http_statz_and_exported_server(tmp_path):
    """GET /statz observability + a conditional AOT artifact duck-typed
    into ModelServer (no model classes behind the endpoints)."""
    import json
    import urllib.request

    from vae_assoc_tpu.export import ExportedPredictor, export_predictor
    from vae_assoc_tpu.serve_http import ModelServer

    pred, cfg, params = _predictor()
    out_dir = str(tmp_path / "artifact")
    export_predictor(pred, out_dir)
    ep = ExportedPredictor.load(out_dir)
    server = ModelServer(ep, max_batch=16, min_batch=8, warm=True)
    port = server.start()
    try:
        def get(route):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{route}", timeout=60
            ) as r:
                return r.status, json.loads(r.read())

        st, out = get("/statz")
        assert st == 200
        assert out["n_cond"] == N_COND and out["min_batch"] == 8
        d0 = out["dispatches"]

        xs = _batch(b=3)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/cross_generate",
            data=json.dumps({
                "inputs": np.asarray(xs[0]).tolist(), "src": 0, "dst": 1,
                "cond": np.asarray(xs[2]).tolist(),
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        assert np.asarray(body["outputs"]).shape == (3, 200)
        st, out = get("/statz")
        assert out["dispatches"] == d0 + 1  # one coalesced device dispatch
    finally:
        server.close()


def test_driver_conditional_sweep_combo(tmp_path):
    """--conditional composes with --sweep-seeds: the trailing cond entry
    rides the vmapped sweep unchanged (broadcast across the model axis)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "96",
         "--batch-size", "32", "--epochs", "2", "--conditional",
         "--sweep-seeds", "2",
         "--metrics", str(tmp_path / "m.jsonl")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "conditional: n_cond=" in out.stdout
    assert "mse_image->trajectory" in out.stdout


def test_class_generation_grid_and_driver_plot(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from vae_assoc_tpu.utils import viz

    calls = []

    def decode(lab):
        calls.append(np.asarray(lab).copy())
        return np.clip(0.1 * lab[:, None] + np.zeros((lab.shape[0], 784)), 0, 1)

    fig = viz.class_generation_grid(decode, 3, samples_per_class=4)
    assert len(calls) == 1 and calls[0].shape == (12,)
    np.testing.assert_array_equal(calls[0], np.repeat(np.arange(3), 4))
    assert fig is not None

    # Driver --conditional writes the grid.
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    plots = tmp_path / "plots"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "64",
         "--batch-size", "32", "--epochs", "1", "--conditional",
         "--plots-dir", str(plots),
         "--metrics", str(tmp_path / "m.jsonl")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert (plots / "class_generation.png").exists()
    assert (plots / "latent_manifold.png").exists()
