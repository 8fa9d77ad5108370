"""On-device stroke augmentation (ops/augment.py) + the per-epoch
refresh hook (train_loop refresh_data) + driver --augment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.data.pipeline import PairedDataset, featurize_pairs
from vae_assoc_tpu.ops.augment import AugmentConfig, augment_strokes


def _strokes(b=8, p=64, seed=0):
    r = np.random.RandomState(seed)
    pts = r.randn(b, p, 2).astype(np.float32) * 50 + 500  # tablet-ish coords
    lengths = r.randint(p // 2, p + 1, b).astype(np.int32)
    return jnp.asarray(pts), jnp.asarray(lengths)


def test_config_validation():
    with pytest.raises(ValueError, match="max_rotate"):
        AugmentConfig(max_rotate=-1)
    with pytest.raises(ValueError, match="max_scale"):
        AugmentConfig(max_scale=1.5)
    AugmentConfig()  # defaults valid
    hash(AugmentConfig())  # hashable (static jit arg)


def test_deterministic_in_key():
    pts, lengths = _strokes()
    k = jax.random.key(3)
    a = augment_strokes(pts, lengths, k)
    b = augment_strokes(pts, lengths, k)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_strokes(pts, lengths, jax.random.key(4))
    assert float(jnp.max(jnp.abs(a - c))) > 1e-3


def test_identity_config_is_identity():
    pts, lengths = _strokes()
    cfg = AugmentConfig(max_rotate=0, max_shear=0, max_scale=0, point_jitter=0)
    out = augment_strokes(pts, lengths, jax.random.key(0), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-4)


def test_rotation_is_isometry():
    pts, lengths = _strokes(b=4, p=16)
    cfg = AugmentConfig(max_rotate=45, max_shear=0, max_scale=0, point_jitter=0)
    out = np.asarray(augment_strokes(pts, lengths, jax.random.key(7), cfg))
    src = np.asarray(pts)
    for i in range(4):
        d0 = np.linalg.norm(src[i, :, None] - src[i, None], axis=-1)
        d1 = np.linalg.norm(out[i, :, None] - out[i, None], axis=-1)
        np.testing.assert_allclose(d1, d0, rtol=1e-4, atol=1e-2)
        # ...and it actually rotated (unless θ drew ≈0 for every sample,
        # which the key was chosen to avoid).
    assert np.abs(out - src).max() > 1.0


def test_featurize_pairs_augmented_consistent_pair():
    """Image and trajectory must derive from the SAME deformed strokes:
    rasterizing the augmented-resampled curve correlates with the
    augmented image far better than with the clean image's deformation."""
    from vae_assoc_tpu.ops.rasterize import rasterize_trajectories
    from vae_assoc_tpu.ops.resample import normalize_and_flatten

    ds = PairedDataset.from_synthetic(16, seed=0)
    key = jax.random.key(11)
    cfg = AugmentConfig(max_rotate=30, point_jitter=0.0)
    imgs_a, trajs_a = ds.features(augment=cfg, augment_key=key)
    imgs_c, trajs_c = ds.features()
    # Augmentation reached both modalities.
    assert float(jnp.mean(jnp.abs(imgs_a - imgs_c))) > 1e-3
    assert float(jnp.mean(jnp.abs(trajs_a - trajs_c))) > 1e-3
    # Determinism in the key.
    imgs_a2, trajs_a2 = ds.features(augment=cfg, augment_key=key)
    np.testing.assert_array_equal(np.asarray(imgs_a), np.asarray(imgs_a2))
    np.testing.assert_array_equal(np.asarray(trajs_a), np.asarray(trajs_a2))
    # Geometric pairing: re-rasterizing the augmented trajectory curves
    # approximates the augmented image (same strokes), not the clean one.
    curves = np.asarray(trajs_a).reshape(16, -1, 2)
    redraw = np.asarray(rasterize_trajectories(jnp.asarray(curves), size=28))
    a = np.asarray(imgs_a).reshape(16, -1)
    c = np.asarray(imgs_c).reshape(16, -1)
    r = redraw.reshape(16, -1)
    corr_aug = np.mean([np.corrcoef(r[i], a[i])[0, 1] for i in range(16)])
    corr_clean = np.mean([np.corrcoef(r[i], c[i])[0, 1] for i in range(16)])
    assert corr_aug > corr_clean + 0.1, (corr_aug, corr_clean)
    # Clean features stay cached and untouched.
    np.testing.assert_array_equal(
        np.asarray(ds.features()[0]), np.asarray(imgs_c)
    )


def test_train_loop_refresh_hook():
    from vae_assoc_tpu.configs import baseline_config
    from vae_assoc_tpu.train.loop import train_loop

    cfg, tc = baseline_config(3, batch_size=16)
    r = np.random.RandomState(0)
    data = [r.rand(32, 784).astype(np.float32),
            r.randn(32, 200).astype(np.float32)]
    calls = []

    def refresh(e):
        calls.append(e)
        return [d + 0.001 * e for d in data]

    state, hist = train_loop(cfg, tc, data, epochs=3, refresh_data=refresh)
    assert calls == [0, 1, 2]
    assert np.isfinite(hist[-1]["total"])

    def bad_refresh(e):
        return [data[0][:16], data[1]]

    with pytest.raises(ValueError, match="original"):
        train_loop(cfg, tc, data, epochs=1, refresh_data=bad_refresh)


def test_driver_augment_end_to_end(tmp_path):
    import os
    import subprocess
    import sys

    from vae_assoc_tpu.utils.logging import read_jsonl

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    metrics = tmp_path / "metrics.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "vae_assoc_tpu.train.driver", "--cpu",
         "--config", "3", "--data", "synthetic", "--n-samples", "96",
         "--batch-size", "32", "--epochs", "2", "--augment",
         "--val-frac", "0.25", "--metrics", str(metrics)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "augment:" in out.stdout
    recs = read_jsonl(str(metrics))
    assert [r for r in recs if "val_total" in r]

    from vae_assoc_tpu.train import driver

    with pytest.raises(SystemExit, match="augment"):
        driver.main(["--config", "3", "--augment", "--fused",
                     "--epochs", "1"])


def test_features_key_without_config_raises():
    ds = PairedDataset.from_synthetic(8, seed=0)
    with pytest.raises(ValueError, match="augment_key given without"):
        ds.features(augment_key=jax.random.key(0))


def test_subset_matches_full_slice():
    ds = PairedDataset.from_synthetic(16, seed=0)
    idx = np.array([1, 3, 5, 8])
    sub = ds.subset(idx)
    assert len(sub) == 4
    np.testing.assert_array_equal(np.asarray(sub.labels),
                                  np.asarray(ds.labels)[idx])
    fi, ft = ds.features()
    si, st = sub.features()
    np.testing.assert_allclose(np.asarray(si), np.asarray(fi)[idx],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st), np.asarray(ft)[idx],
                               rtol=1e-6, atol=1e-6)


def test_latent_manifold_canvas():
    """viz.latent_manifold: one decode call, correct canvas geometry."""
    import matplotlib

    matplotlib.use("Agg")
    from vae_assoc_tpu.utils import viz

    calls = []

    def decode(z):
        calls.append(np.asarray(z).copy())
        # Encode z's swept coords into the 'image' so geometry is checkable.
        return np.clip(0.5 + 0.1 * z[:, :1] + np.zeros((z.shape[0], 784)), 0, 1)

    fig = viz.latent_manifold(decode, grid_n=5, n_z=20, dims=(0, 3))
    assert len(calls) == 1  # ONE decode for the whole canvas
    z = calls[0]
    assert z.shape == (25, 20)
    # Swept dims take the grid; all other coords stay at the prior mean.
    assert np.allclose(sorted(set(np.round(z[:, 0], 5))),
                       np.round(np.linspace(-2, 2, 5), 5))
    assert np.allclose(z[:, 1], 0) and np.allclose(z[:, 4:], 0)
    assert fig is not None
    with pytest.raises(ValueError, match="base"):
        viz.latent_manifold(decode, n_z=20, base=np.zeros(3))
