"""RBF trajectory parameterization + checkify input sanitizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from vae_assoc_tpu.ops import rbf
from vae_assoc_tpu.ops.resample import validate_strokes


def _smooth_trajs(rng, b=8, t=100):
    u = np.linspace(0, 1, t)
    phase = rng.uniform(0, 2 * np.pi, (b, 1))
    x = np.cos(2 * np.pi * u[None] + phase)
    y = np.sin(4 * np.pi * u[None] + phase) * 0.5
    return jnp.asarray(np.stack([x, y], -1).astype(np.float32))


def test_rbf_roundtrip_accuracy(rng):
    traj = _smooth_trajs(rng)
    w = rbf.fit_rbf(traj, n_centers=32)
    assert w.shape == (8, 64)
    rec = rbf.rbf_reconstruct(w, 100)
    err = float(jnp.max(jnp.abs(rec - traj)))
    assert err < 0.02, err  # smooth curves encode near-losslessly


def test_rbf_fixed_length_encoding_is_resolution_free(rng):
    """Weights fit at T=100 decode at any resolution (functional encoding)."""
    traj = _smooth_trajs(rng, t=100)
    w = rbf.fit_rbf(traj, n_centers=24)
    rec50 = rbf.rbf_reconstruct(w, 50)
    assert rec50.shape == (8, 50, 2)
    # Decoded coarse samples stay close to the underlying curve.
    np.testing.assert_allclose(
        np.asarray(rec50[:, ::49]), np.asarray(traj[:, ::99]), atol=0.05
    )


def test_rbf_jits_and_batches(rng):
    traj = _smooth_trajs(rng, b=32)
    w = jax.jit(lambda x: rbf.fit_rbf(x, n_centers=16))(traj)
    assert np.all(np.isfinite(np.asarray(w)))


# -- pipeline wiring (traj_encoding="rbf") -------------------------------------


def test_pipeline_rbf_encoding_end_to_end():
    """PairedDataset with traj_encoding='rbf': features are weight vectors
    of the configured width, and decode_trajectories inverts them back to
    (nearly) the resample encoding's curves — the two encodings describe
    the same underlying trajectories."""
    from vae_assoc_tpu.data.pipeline import PairedDataset

    ds_rbf = PairedDataset.from_synthetic(16, traj_encoding="rbf",
                                          rbf_centers=40)
    ds_res = PairedDataset.from_synthetic(16)
    assert ds_rbf.traj_features == 80 and ds_res.traj_features == 200
    imgs_r, w = ds_rbf.features()
    imgs_p, _ = ds_res.features()
    assert w.shape == (16, 80)
    # The image branch is encoding-independent.
    np.testing.assert_array_equal(np.asarray(imgs_r), np.asarray(imgs_p))
    curves = np.asarray(ds_rbf.decode_trajectories())
    ref = np.asarray(ds_res.trajectories_2d())
    assert curves.shape == ref.shape == (16, 100, 2)
    # 40 Gaussian bases track 100-point pen strokes closely (not exactly —
    # strokes have corners; the bound is what synthetic data achieves).
    assert float(np.max(np.abs(curves - ref))) < 0.2


def test_pipeline_rejects_unknown_encoding():
    from vae_assoc_tpu.data.pipeline import PairedDataset

    ds = PairedDataset.from_synthetic(4, traj_encoding="nope")
    with pytest.raises(ValueError, match="traj_encoding"):
        ds.features()


def test_driver_rbf_encoding(tmp_path):
    """--traj-encoding rbf trains config 3 end-to-end: the trajectory arch
    adapts to 2*centers, cross-modal eval runs in weight space, and the
    traj-over-image plot decodes the generated weights to curves."""
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
         "--config", "3", "--data", "synthetic", "--n-samples", "128",
         "--batch-size", "32", "--epochs", "2", "--traj-encoding", "rbf",
         "--rbf-centers", "30", "--plots-dir", str(plots)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "image->trajectory" in out.stdout
    assert (plots / "image_to_trajectory.png").exists()


def test_validate_strokes_ok(rng):
    pts = jnp.asarray(rng.normal(size=(4, 32, 2)).astype(np.float32))
    lengths = jnp.asarray([1, 16, 32, 8], jnp.int32)
    err, _ = checkify.checkify(validate_strokes)(pts, lengths)
    err.throw()  # no error


def test_validate_strokes_catches_bad_lengths(rng):
    pts = jnp.asarray(rng.normal(size=(4, 32, 2)).astype(np.float32))
    err, _ = checkify.checkify(validate_strokes)(
        pts, jnp.asarray([0, 16, 32, 8], jnp.int32)
    )
    with pytest.raises(checkify.JaxRuntimeError, match=">= 1"):
        err.throw()
    err, _ = checkify.checkify(validate_strokes)(
        pts, jnp.asarray([1, 16, 33, 8], jnp.int32)
    )
    with pytest.raises(checkify.JaxRuntimeError, match="capacity"):
        err.throw()


def test_validate_strokes_catches_nan_in_valid_region(rng):
    pts = np.asarray(rng.normal(size=(2, 16, 2)).astype(np.float32))
    pts[0, 3, 1] = np.nan
    err, _ = checkify.checkify(validate_strokes)(
        jnp.asarray(pts), jnp.asarray([8, 8], jnp.int32)
    )
    with pytest.raises(checkify.JaxRuntimeError, match="non-finite"):
        err.throw()
    # NaN in the padding region is fine (masked by length).
    pts[0, 3, 1] = 0.0
    pts[1, 12, 0] = np.nan
    err, _ = checkify.checkify(validate_strokes)(
        jnp.asarray(pts), jnp.asarray([8, 8], jnp.int32)
    )
    err.throw()
