"""CPU TensorFlow oracle: the reference's math + training regime, timed.

The reference (`navigator8972/vae_assoc`) publishes no benchmark numbers
(BASELINE.json:13 `"published": {}`), so the ≥10× samples/sec/chip target
(BASELINE.json:5) is measured against this harness: a faithful TF
re-implementation of the reference's joint associative VAE — 2-hidden-layer
softplus MLP encoder/decoders per modality, reparameterized sampling,
ε-clamped Bernoulli CE + summed-square Gaussian recon + closed-form KL +
pairwise latent-mean-L2 association term, one Adam optimizer — trained with
per-minibatch host→graph feeds on CPU, exactly the reference's
Session.run/feed_dict regime (SURVEY.md §3.1-3.2) modernized to a TF2
`tf.function` graph (generous to the baseline: tf.function is faster than
TF1 feed_dict).

Run:  python benchmarks/oracle_tf.py [--batch-size 64] [--steps 200]
Emits one JSON line {"samples_per_sec": ...} on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np


def build_and_bench(batch_size: int, steps: int, warmup: int, seed: int = 0):
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    rng = np.random.default_rng(seed)

    # Reference-scale archs: img 784, traj 2*100, hidden 500, n_z 20.
    archs = [
        dict(n_input=784, n_h=500, n_z=20, recon="bernoulli"),
        dict(n_input=200, n_h=500, n_z=20, recon="gaussian"),
    ]
    assoc_lambda = 1.0

    def xavier(fan_in, fan_out):
        a = np.sqrt(6.0 / (fan_in + fan_out))
        return tf.Variable(
            rng.uniform(-a, a, (fan_in, fan_out)).astype(np.float32)
        )

    def linear_vars(n_in, n_out):
        return xavier(n_in, n_out), tf.Variable(np.zeros(n_out, np.float32))

    towers = []
    for a in archs:
        towers.append(
            dict(
                r1=linear_vars(a["n_input"], a["n_h"]),
                r2=linear_vars(a["n_h"], a["n_h"]),
                mu=linear_vars(a["n_h"], a["n_z"]),
                lv=linear_vars(a["n_h"], a["n_z"]),
                g1=linear_vars(a["n_z"], a["n_h"]),
                g2=linear_vars(a["n_h"], a["n_h"]),
                out=linear_vars(a["n_h"], a["n_input"]),
                recon=a["recon"],
            )
        )
    variables = [v for t in towers for k in ("r1", "r2", "mu", "lv", "g1", "g2", "out") for v in t[k]]
    opt = tf.keras.optimizers.Adam(1e-3)

    def lin(v, x):
        return tf.matmul(x, v[0]) + v[1]

    @tf.function(
        input_signature=[
            tf.TensorSpec([batch_size, 784], tf.float32),
            tf.TensorSpec([batch_size, 200], tf.float32),
        ]
    )
    def train_step(x_img, x_traj):
        xs = (x_img, x_traj)
        with tf.GradientTape() as tape:
            cost = tf.constant(0.0)
            mus = []
            for t, x in zip(towers, xs):
                h = tf.nn.softplus(lin(t["r2"], tf.nn.softplus(lin(t["r1"], x))))
                mu, lv = lin(t["mu"], h), lin(t["lv"], h)
                eps = tf.random.normal(tf.shape(mu))
                z = mu + tf.sqrt(tf.exp(lv)) * eps
                h = tf.nn.softplus(lin(t["g2"], tf.nn.softplus(lin(t["g1"], z))))
                out = lin(t["out"], h)
                if t["recon"] == "bernoulli":
                    xhat = tf.nn.sigmoid(out)
                    recon = -tf.reduce_sum(
                        x * tf.math.log(1e-10 + xhat)
                        + (1.0 - x) * tf.math.log(1e-10 + 1.0 - xhat),
                        1,
                    )
                else:
                    recon = tf.reduce_sum(tf.square(x - out), 1)
                kl = -0.5 * tf.reduce_sum(1.0 + lv - tf.square(mu) - tf.exp(lv), 1)
                cost += tf.reduce_mean(recon + kl)
                mus.append(mu)
            for i in range(len(mus)):
                for j in range(i + 1, len(mus)):
                    cost += assoc_lambda * tf.reduce_mean(
                        tf.reduce_sum(tf.square(mus[i] - mus[j]), 1)
                    )
        grads = tape.gradient(cost, variables)
        opt.apply_gradients(zip(grads, variables))
        return cost

    # Synthetic data, feed per batch from host (the reference's regime).
    n = max(batch_size * 8, 512)
    imgs = rng.uniform(0, 1, (n, 784)).astype(np.float32)
    trajs = rng.normal(size=(n, 200)).astype(np.float32)

    def batch(i):
        s = (i * batch_size) % (n - batch_size + 1)
        return imgs[s : s + batch_size], trajs[s : s + batch_size]

    for i in range(warmup):
        train_step(*batch(i))
    t0 = time.perf_counter()
    cost = None
    for i in range(steps):
        cost = train_step(*batch(warmup + i))
    cost = float(cost)  # sync
    dt = time.perf_counter() - t0
    return {
        "samples_per_sec": steps * batch_size / dt,
        "steps": steps,
        "batch_size": batch_size,
        "final_cost": cost,
        "seconds": dt,
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--warmup", type=int, default=20)
    args = p.parse_args()
    result = build_and_bench(args.batch_size, args.steps, args.warmup)
    json.dump(result, sys.stdout)
    print()
