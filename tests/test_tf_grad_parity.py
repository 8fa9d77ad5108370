"""Gradient parity vs a TensorFlow oracle of the reference math.

The numpy oracle (oracle_np.py) pins forward values; this pins the FULL
backward pass: identical weights + identical ε in both frameworks, compare
∂cost/∂θ for every parameter of the joint model. TF implements the
reference's formulation (ε-clamped logs → parity_mode=True on our side).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig
from vae_assoc_tpu.models import assoc as assoc_mod

ARCH = dict(
    n_input=36, n_z=5, n_hidden_recog_1=24, n_hidden_recog_2=20,
    n_hidden_gener_1=20, n_hidden_gener_2=24,
)


def _tf_tower(np_p):
    """params["recog"/"gener"]["h1"/...]["w"/"b"] → same tree of tf.Variable."""
    return {
        part: {
            layer: {wb: tf.Variable(np.asarray(arr)) for wb, arr in wbs.items()}
            for layer, wbs in layers.items()
        }
        for part, layers in np_p.items()
    }


def _tf_forward(p, x, eps, recon_kind):
    def lin(layer, h):
        return tf.matmul(h, layer["w"]) + layer["b"]

    r, g = p["recog"], p["gener"]
    h = tf.nn.softplus(lin(r["h2"], tf.nn.softplus(lin(r["h1"], x))))
    mu, lv = lin(r["out_mean"], h), lin(r["out_logvar"], h)
    z = mu + tf.sqrt(tf.exp(lv)) * eps
    h = tf.nn.softplus(lin(g["h2"], tf.nn.softplus(lin(g["h1"], z))))
    out = lin(g["out"], h)
    if recon_kind == "bernoulli":
        xhat = tf.nn.sigmoid(out)
        recon = -tf.reduce_sum(
            x * tf.math.log(1e-10 + xhat)
            + (1.0 - x) * tf.math.log(1e-10 + 1.0 - xhat), 1)
    else:
        recon = tf.reduce_sum(tf.square(x - out), 1)
    kl = -0.5 * tf.reduce_sum(1.0 + lv - tf.square(mu) - tf.exp(lv), 1)
    return mu, tf.reduce_mean(recon) + tf.reduce_mean(kl)


def test_joint_gradient_parity_vs_tensorflow(rng):
    cfg = AssocConfig(
        [
            ModalityConfig("image", ARCH, recon="bernoulli"),
            ModalityConfig("trajectory", ARCH, recon="gaussian"),
        ],
        assoc_lambda=1.5,
    )
    params = assoc_mod.init_assoc(jax.random.key(0), cfg)
    xs_np = [
        rng.uniform(0.05, 0.95, (16, 36)).astype(np.float32),
        rng.normal(size=(16, 36)).astype(np.float32),
    ]
    eps_np = [rng.normal(size=(16, 5)).astype(np.float32) for _ in range(2)]

    # --- JAX side (parity_mode reproduces the reference's clamped-log CE)
    def loss(p):
        return assoc_mod.assoc_loss_fn(
            p, [jnp.asarray(x) for x in xs_np], cfg,
            eps=[jnp.asarray(e) for e in eps_np], parity_mode=True,
        )[0]

    g_jax = jax.grad(loss)(params)

    # --- TF side: same weights, same ε, reference math
    towers = [
        _tf_tower(np_p) for np_p in jax.tree.map(np.asarray, params)["modalities"]
    ]
    kinds = ["bernoulli", "gaussian"]
    with tf.GradientTape() as tape:
        cost = tf.constant(0.0)
        mus = []
        for t, x, e, kind in zip(towers, xs_np, eps_np, kinds):
            mu, c = _tf_forward(t, tf.constant(x), tf.constant(e), kind)
            mus.append(mu)
            cost = cost + c
        assoc = tf.reduce_mean(tf.reduce_sum(tf.square(mus[0] - mus[1]), 1))
        cost = cost + 1.5 * assoc
    flat_tf_vars = []
    flat_jax = []
    for ti, t in enumerate(towers):
        for part in ("recog", "gener"):
            for layer in sorted(t[part]):
                for wb in ("w", "b"):
                    flat_tf_vars.append(t[part][layer][wb])
                    flat_jax.append(
                        g_jax["modalities"][ti][part][layer][wb]
                    )
    g_tf = tape.gradient(cost, flat_tf_vars)
    assert len(g_tf) == len(flat_jax)
    for gt, gj in zip(g_tf, flat_jax):
        np.testing.assert_allclose(
            np.asarray(gj), gt.numpy(), rtol=5e-4, atol=5e-5
        )
