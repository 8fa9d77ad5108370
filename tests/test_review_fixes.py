"""Regression tests for code-review findings (round 1 review pass)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import vae_assoc_tpu as vat
from vae_assoc_tpu.configs import TrainConfig

TINY = dict(
    n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
    n_hidden_gener_1=16, n_hidden_gener_2=16,
)


def test_driver_config2_runs(tmp_path):
    """Config 2 (trajectory-only) must feed trajectory features, not images."""
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "2", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "32", "--epochs", "1",
         "--plots-dir", str(tmp_path / "plots")],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "1 modality" in out.stdout


def test_predictor_survives_donated_train_step(rng):
    from vae_assoc_tpu.serve import Predictor

    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"]
    )
    pred = Predictor.from_model(model)
    x = rng.uniform(0, 1, (16, 24)).astype(np.float32)
    before = pred.cross_generate(x, 0, 1)
    # partial_fit donates the old state buffers; the predictor's snapshot
    # must remain valid and unchanged.
    model.partial_fit([x, rng.normal(size=(16, 24)).astype(np.float32)])
    after = pred.cross_generate(x, 0, 1)
    np.testing.assert_array_equal(before, after)


def test_partial_fit_with_steps_per_call_config(rng):
    """A fused-scan TrainConfig must not break the one-minibatch verb."""
    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"],
        train_config=TrainConfig(batch_size=16, steps_per_call=10),
    )
    xs = [
        rng.uniform(0, 1, (16, 24)).astype(np.float32),
        rng.normal(size=(16, 24)).astype(np.float32),
    ]
    c1 = model.partial_fit(xs)
    c2 = model.partial_fit(xs)
    assert np.isfinite(c1) and c2 < c1


def test_generate_draws_fresh_prior_samples():
    model = vat.VariationalAutoencoder(TINY)
    a = np.asarray(model.generate())
    b = np.asarray(model.generate())
    assert np.abs(a - b).max() > 1e-6, "prior samples must differ per call"


def test_double_async_save_joins_previous(rng, tmp_path):
    from vae_assoc_tpu.train.step import init_train_state, make_train_step
    from vae_assoc_tpu.utils import checkpoint as ckpt

    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig

    cfg = AssocConfig([ModalityConfig("x", TINY)], assoc_lambda=0.0)
    tc = TrainConfig(batch_size=8)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [rng.uniform(0, 1, (8, 24)).astype(np.float32)]
    td = str(tmp_path)
    state, _ = step(state, xs)
    ckpt.save(td, state, block=False)
    state, _ = step(state, xs)
    ckpt.save(td, state, block=False)  # must join the first save, not drop it
    ckpt.wait(td)
    restored = ckpt.restore(td, init_train_state(cfg, tc))
    assert int(restored.step) == 2


def test_uji_zero_point_sample_dropped(tmp_path):
    from vae_assoc_tpu.data import uji

    p = tmp_path / "z.txt"
    p.write_text(
        "WORD a w01\n NUMSTROKES 1\n  POINTS 0 # \n"
        "WORD b w01\n NUMSTROKES 1\n  POINTS 2 # 1 2 3 4\n"
    )
    got = uji.load_uji_files([str(p)], native="never")
    assert got["label_names"] == ["b"]
    assert got["points"].shape[0] == 1


def test_viz_trajectories_fewer_than_requested(rng):
    pytest.importorskip("matplotlib")
    from vae_assoc_tpu.utils import viz

    imgs = rng.uniform(0, 1, (4, 784)).astype(np.float32)
    trajs = rng.uniform(-1, 1, (4, 200)).astype(np.float32)
    assert viz.trajectories_over_images(imgs, trajs, n=8) is not None


def test_reconstruct_sample_mode(rng):
    """sample=True draws through z = mu + sigma*eps with fresh keys."""
    model = vat.VariationalAutoencoder(TINY)
    x = rng.uniform(0, 1, (8, 24)).astype(np.float32)
    mean1 = np.asarray(model.reconstruct(x))
    mean2 = np.asarray(model.reconstruct(x))
    np.testing.assert_array_equal(mean1, mean2)  # mean path deterministic
    s1 = np.asarray(model.reconstruct(x, sample=True))
    s2 = np.asarray(model.reconstruct(x, sample=True))
    assert np.abs(s1 - s2).max() > 1e-6  # sampled path varies per call
    assert s1.shape == mean1.shape
    assert 0.0 <= s1.min() and s1.max() <= 1.0


def test_save_model_is_self_describing(rng, tmp_path):
    """load() reconstructs model + config purely from the checkpoint dir."""
    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"], assoc_lambda=0.7,
        transfer_fct="relu", learning_rate=2e-3,
    )
    xs = [
        rng.uniform(0, 1, (16, 24)).astype(np.float32),
        rng.normal(size=(16, 24)).astype(np.float32),
    ]
    model.partial_fit(xs)
    model.save_model(str(tmp_path))
    loaded = vat.AssocVariationalAutoEncoder.load(str(tmp_path))
    assert loaded.config == model.config
    assert loaded.train_config == model.train_config
    np.testing.assert_array_equal(
        np.asarray(loaded.cross_generate(xs[0], "image", "trajectory")),
        np.asarray(model.cross_generate(xs[0], "image", "trajectory")),
    )
    with pytest.raises(FileNotFoundError, match="model_config"):
        vat.AssocVariationalAutoEncoder.load("/tmp/nope-nope-nope")


def test_single_modality_load_roundtrip(rng, tmp_path):
    """VariationalAutoencoder.load must work (round-2 review): the inherited
    classmethod reconstructs via cls([], model_config=...)."""
    m = vat.VariationalAutoencoder(TINY, batch_size=8)
    m.partial_fit(rng.uniform(0, 1, (8, 24)).astype(np.float32))
    m.save_model(str(tmp_path / "ck"))
    m2 = vat.VariationalAutoencoder.load(str(tmp_path / "ck"))
    assert isinstance(m2, vat.VariationalAutoencoder)
    x = rng.uniform(0, 1, (4, 24)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(m.reconstruct(x)), np.asarray(m2.reconstruct(x)), rtol=1e-6
    )
    # And the single-modality verb signature survives: plain arrays, no lists.
    assert np.asarray(m2.transform(x)).shape == (4, 4)


def test_serve_modality_names_hit_warm_compile_cache(rng):
    """String modality names must normalize to indices BEFORE the jit call,
    or a warmed server pays a fresh compile per name spelling."""
    from vae_assoc_tpu.serve import Predictor

    m = vat.AssocVariationalAutoEncoder(
        [TINY, dict(TINY)], recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"], batch_size=8,
    )
    pred = Predictor.from_model(m)
    x = rng.uniform(0, 1, (8, 24)).astype(np.float32)
    pred.cross_generate(x, 0, 1)
    n_compiles = pred._cross._cache_size()
    out_named = pred.cross_generate(x, "image", "trajectory")
    assert pred._cross._cache_size() == n_compiles, "string names recompiled"
    np.testing.assert_array_equal(out_named, pred.cross_generate(x, 0, 1))
    pred.generate(np.zeros((4, 4), np.float32), 1)
    n_compiles = pred._generate._cache_size()
    pred.generate(np.zeros((4, 4), np.float32), "trajectory")
    assert pred._generate._cache_size() == n_compiles


def test_chunked_training_does_not_replay_shuffle(rng, monkeypatch):
    """Round-2 review: each train_loop chunk must advance the shuffle
    stream (seeded with (seed, start_step)), not replay the seed-0
    permutations."""
    from vae_assoc_tpu.train.loop import train_loop
    from vae_assoc_tpu.train.step import init_train_state
    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig

    seeds = []
    real_default_rng = np.random.default_rng

    def spy(seed=None):
        seeds.append(seed)
        return real_default_rng(seed)

    monkeypatch.setattr(np.random, "default_rng", spy)

    cfg = AssocConfig([ModalityConfig("image", TINY)], assoc_lambda=0.0)
    tc = TrainConfig(batch_size=16)
    data = [rng.uniform(0, 1, (64, 24)).astype(np.float32)]
    state = init_train_state(cfg, tc)
    state, _ = train_loop(cfg, tc, data, epochs=1, state=state)
    state, _ = train_loop(cfg, tc, data, epochs=1, state=state)
    chunk_seeds = [s for s in seeds if isinstance(s, list)]
    assert len(chunk_seeds) == 2 and chunk_seeds[0] != chunk_seeds[1], chunk_seeds
    # Same (seed, start_step) -> same stream: what makes kill/resume exact.
    assert chunk_seeds[0] == [tc.seed, 0] and chunk_seeds[1][1] > 0, chunk_seeds


def test_reconstruction_grid_single_sample_and_mismatched_rows(rng):
    pytest.importorskip("matplotlib")
    from vae_assoc_tpu.utils import viz

    x = rng.uniform(0, 1, (1, 784)).astype(np.float32)
    fig = viz.reconstruction_grid(x, x)  # n=1: axes come back 1-D
    assert fig is not None
    x8 = rng.uniform(0, 1, (8, 784)).astype(np.float32)
    fig = viz.reconstruction_grid(x8, x8[:4])  # recon shorter than input
    assert fig is not None


def test_mega_path_falls_back_for_non_mlp_or_non_softplus(rng):
    """use_pallas='mega' with a conv or tanh modality must route through
    the composable path (which itself falls back), not crash in the
    MLP-only megakernel (round-2 review finding)."""
    import jax
    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig
    from vae_assoc_tpu.models import assoc as assoc_mod

    conv_arch = dict(TINY, n_input=784)
    for mod in (
        ModalityConfig("image", conv_arch, encoder="conv"),
        ModalityConfig("image", TINY, transfer="tanh"),
    ):
        cfg = AssocConfig([mod], assoc_lambda=0.0)
        params = assoc_mod.init_assoc(jax.random.key(0), cfg)
        x = rng.uniform(0, 1, (8, mod.arch["n_input"])).astype(np.float32)
        total_mega, _ = assoc_mod.assoc_loss_fn(
            params, [x], cfg, key=jax.random.key(1), use_pallas="mega"
        )
        total_ref, _ = assoc_mod.assoc_loss_fn(
            params, [x], cfg, key=jax.random.key(1), use_pallas=False
        )
        np.testing.assert_allclose(
            float(total_mega), float(total_ref), rtol=1e-5
        )


def test_grad_norm_metric_emitted(rng):
    """SURVEY §5 promises grad-norm among the first-class jitted metrics."""
    import jax
    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig
    from vae_assoc_tpu.train.step import init_train_state, make_train_step

    cfg = AssocConfig([ModalityConfig("image", TINY)], assoc_lambda=0.0)
    tc = TrainConfig(batch_size=8)
    state = init_train_state(cfg, tc)
    _, m = make_train_step(cfg, tc)(
        state, [rng.uniform(0, 1, (8, 24)).astype(np.float32)]
    )
    gn = float(jax.device_get(m["grad_norm"]))
    assert np.isfinite(gn) and gn > 0.0, gn
