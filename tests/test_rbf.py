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
