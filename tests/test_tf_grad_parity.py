"""Gradient parity vs a TensorFlow oracle of the reference math.

The numpy oracle (oracle_np.py) pins forward values; this pins the FULL
backward pass: identical weights + identical ε in both frameworks, compare
∂cost/∂θ for every parameter of the joint model. TF implements the
reference's formulation (ε-clamped logs → parity_mode=True on our side).

TF runs in a SUBPROCESS, not in-process: JAX and TensorFlow each bundle
their own LLVM/XLA, and co-residency destabilizes the CPU compiler — the
full suite once segfaulted inside `jax.grad`'s backend compile at exactly
this test (faulthandler stack: `backend_compile_and_load` under
`_scan_transpose_fancy`) while passing in isolation. Weights/inputs/ε go
out as an .npz, TF grads come back as an .npz; the main process never
imports tensorflow (even the skip check uses find_spec).
"""

import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig
from vae_assoc_tpu.models import assoc as assoc_mod

if importlib.util.find_spec("tensorflow") is None:  # no in-process import
    pytest.skip("tensorflow not installed", allow_module_level=True)

ARCH = dict(
    n_input=36, n_z=5, n_hidden_recog_1=24, n_hidden_recog_2=20,
    n_hidden_gener_1=20, n_hidden_gener_2=24,
)

# The oracle subprocess: rebuild the towers from the npz (keys
# m{ti}/{part}/{layer}/{wb}), run the reference math under GradientTape,
# write the gradients back under the same keys.
_TF_ORACLE = r"""
import sys
import numpy as np
import tensorflow as tf

inp = np.load(sys.argv[1])
kinds = ["bernoulli", "gaussian"]
towers = [{}, {}]
for key in inp.files:
    if not key.startswith("m"):
        continue
    ti, part, layer, wb = key.split("/")
    towers[int(ti[1:])].setdefault(part, {}).setdefault(layer, {})[wb] = (
        tf.Variable(inp[key])
    )


def lin(layer, h):
    return tf.matmul(h, layer["w"]) + layer["b"]


def forward(p, x, eps, recon_kind):
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


with tf.GradientTape() as tape:
    cost = tf.constant(0.0)
    mus = []
    for ti, (t, kind) in enumerate(zip(towers, kinds)):
        mu, c = forward(t, tf.constant(inp[f"x{ti}"]),
                        tf.constant(inp[f"eps{ti}"]), kind)
        mus.append(mu)
        cost = cost + c
    assoc = tf.reduce_mean(tf.reduce_sum(tf.square(mus[0] - mus[1]), 1))
    cost = cost + float(inp["assoc_lambda"]) * assoc

keys, tf_vars = [], []
for ti, t in enumerate(towers):
    for part in ("recog", "gener"):
        for layer in sorted(t[part]):
            for wb in ("w", "b"):
                keys.append(f"m{ti}/{part}/{layer}/{wb}")
                tf_vars.append(t[part][layer][wb])
grads = tape.gradient(cost, tf_vars)
np.savez(sys.argv[2], **{k: g.numpy() for k, g in zip(keys, grads)})
"""


def test_joint_gradient_parity_vs_tensorflow(rng, tmp_path):
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

    # --- TF side in a subprocess: same weights, same ε, reference math
    np_params = jax.tree.map(np.asarray, params)["modalities"]
    blob = {"assoc_lambda": np.float32(1.5)}
    for ti, (x, e) in enumerate(zip(xs_np, eps_np)):
        blob[f"x{ti}"] = x
        blob[f"eps{ti}"] = e
    for ti, tower in enumerate(np_params):
        for part, layers in tower.items():
            for layer, wbs in layers.items():
                for wb, arr in wbs.items():
                    blob[f"m{ti}/{part}/{layer}/{wb}"] = arr
    in_npz, out_npz = tmp_path / "in.npz", tmp_path / "out.npz"
    np.savez(in_npz, **blob)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the oracle imports only numpy + TF
    res = subprocess.run(
        [sys.executable, "-c", _TF_ORACLE, str(in_npz), str(out_npz)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    g_tf = np.load(out_npz)

    checked = 0
    for ti in range(2):
        for part in ("recog", "gener"):
            layers = g_jax["modalities"][ti][part]
            for layer in sorted(layers):
                for wb in ("w", "b"):
                    np.testing.assert_allclose(
                        np.asarray(layers[layer][wb]),
                        g_tf[f"m{ti}/{part}/{layer}/{wb}"],
                        rtol=5e-4, atol=5e-5,
                        err_msg=f"m{ti}/{part}/{layer}/{wb}",
                    )
                    checked += 1
    # 2 towers × (recog: h1,h2,out_mean,out_logvar + gener: h1,h2,out) × (w,b)
    assert checked == 28
