"""Banded-matmul conv kernel parity vs lax convs (interpret mode on CPU;
scripts/bench_conv.py measures the same ops on TPU)."""

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.kernels import conv_banded as cb
from vae_assoc_tpu.models import conv as mconv


def _assert_close(got, want, tol, what):
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < tol, f"{what}: max|err| {err:.3e}"


@pytest.mark.parametrize(
    "shape,wshape",
    [((8, 28, 28, 1), (3, 3, 1, 32)),
     ((8, 14, 14, 32), (3, 3, 32, 64)),
     ((8, 8, 8, 5), (3, 3, 5, 7)),  # odd channel counts
     ((7, 12, 12, 3), (3, 3, 3, 4))],  # ragged batch
)
def test_conv_s2_parity(rng, shape, wshape):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray((rng.normal(size=wshape) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(wshape[3],)).astype(np.float32))
    want = lax.conv_general_dilated(x, w, (2, 2), "SAME",
                                    dimension_numbers=mconv._DN) + b
    _assert_close(cb.conv3x3_s2(x, w, b), want, 1e-5, f"conv_s2 {shape}")


@pytest.mark.parametrize(
    "shape,wshape",
    [((8, 7, 7, 64), (3, 3, 64, 32)),
     ((8, 14, 14, 32), (3, 3, 32, 1)),
     ((7, 5, 5, 3), (3, 3, 3, 4))],
)
def test_convt_s2_parity(rng, shape, wshape):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray((rng.normal(size=wshape) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(wshape[3],)).astype(np.float32))
    want = lax.conv_transpose(x, w, (2, 2), "SAME",
                              dimension_numbers=mconv._DN) + b
    _assert_close(cb.convt3x3_s2(x, w, b), want, 1e-5, f"convt_s2 {shape}")


@pytest.mark.parametrize("transposed", [False, True])
def test_grad_parity(rng, transposed):
    if transposed:
        x = jnp.asarray(rng.normal(size=(8, 7, 7, 64)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 64, 32)) * 0.1).astype(np.float32))
        zero_b = jnp.zeros((32,), jnp.float32)
        ref = lambda x, w: jnp.sum(jnp.tanh(lax.conv_transpose(  # noqa: E731
            x, w, (2, 2), "SAME", dimension_numbers=mconv._DN)))
        got = lambda x, w: jnp.sum(jnp.tanh(cb.convt3x3_s2(x, w, zero_b)))  # noqa: E731
    else:
        x = jnp.asarray(rng.normal(size=(8, 14, 14, 32)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 32, 64)) * 0.1).astype(np.float32))
        zero_b = jnp.zeros((64,), jnp.float32)
        ref = lambda x, w: jnp.sum(jnp.tanh(lax.conv_general_dilated(  # noqa: E731
            x, w, (2, 2), "SAME", dimension_numbers=mconv._DN)))
        got = lambda x, w: jnp.sum(jnp.tanh(cb.conv3x3_s2(x, w, zero_b)))  # noqa: E731
    gx_r, gw_r = jax.grad(ref, (0, 1))(x, w)
    gx_g, gw_g = jax.grad(got, (0, 1))(x, w)
    _assert_close(gx_g, gx_r, 1e-4, "dx")
    _assert_close(gw_g, gw_r, 2e-4, "dw")


def test_full_tower_parity(rng):
    from vae_assoc_tpu.models.conv import decode_conv, encode_conv, init_conv_vae_params

    arch = dict(n_input=784, n_z=10, n_hidden_recog_1=64, n_hidden_recog_2=64,
                n_hidden_gener_1=64, n_hidden_gener_2=64)
    p = init_conv_vae_params(jax.random.key(0), arch)
    x = jnp.asarray(rng.uniform(0, 1, (8, 784)).astype(np.float32))
    mu_r, lv_r = encode_conv(p, x)
    mu_g, lv_g = cb.encode_conv_fused(p, x)
    _assert_close(mu_g, mu_r, 1e-5, "encode mu")
    _assert_close(lv_g, lv_r, 1e-5, "encode lv")
    z = jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32))
    _assert_close(cb.decode_conv_fused(p, z), decode_conv(p, z), 1e-4, "decode")


def test_conv_pallas_encoder_trains(rng):
    """The config-4 conv_pallas variant routes to the banded kernels and
    learns end-to-end."""
    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
    from vae_assoc_tpu.train.step import init_train_state, make_train_step

    arch = dict(n_input=784, n_z=8, n_hidden_recog_1=32, n_hidden_recog_2=32,
                n_hidden_gener_1=32, n_hidden_gener_2=32)
    cfg = AssocConfig(
        [ModalityConfig("image", arch, recon="bernoulli", encoder="conv_pallas")],
        assoc_lambda=0.0,
    )
    tc = TrainConfig(batch_size=16)
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [jnp.asarray(rng.uniform(0, 1, (16, 784)).astype(np.float32))]
    hist = []
    for _ in range(10):
        state, m = step(state, xs)
        hist.append(float(m["total"]))
    assert np.isfinite(hist).all() and hist[-1] < hist[0]


def test_band_mats_cache_safe_when_first_built_inside_jit(rng):
    """The lru-cached band matrices must never capture a trace's tracers:
    first use inside jit, then outside — order-dependent
    UnexpectedTracerError regression (caught by a reversed-order run)."""
    cb._band_mats_s2.cache_clear()
    cb._band_mats_t2.cache_clear()
    x = jnp.asarray(rng.normal(size=(8, 28, 28, 1)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 1, 8)) * 0.1).astype(np.float32))
    b = jnp.zeros((8,), jnp.float32)
    out1 = jax.jit(lambda x, w, b: cb.conv3x3_s2(x, w, b))(x, w, b)
    out2 = cb.conv3x3_s2(x, w, b)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-5
    )
