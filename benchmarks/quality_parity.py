"""Quality gate: cross-modal reconstruction MSE parity vs the reference.

BASELINE.json:2's quality metric. Both implementations — the reference's
math in TensorFlow (the oracle regime from oracle_tf.py) and this
framework — train on the SAME synthetic paired dataset with the same
hyperparameters (joint associative VAE, Adam 1e-3, batch 64), then both
are scored on cross-modal reconstruction MSE (encode image → decode
trajectory and the reverse, against the paired ground truth).

Run:  python benchmarks/quality_parity.py [--epochs 30] [--n 2048]
Emits one JSON line with both frameworks' MSEs and the ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np


def tf_train_and_eval(imgs, trajs, epochs, batch_size=64, seed=0, lr=1e-3,
                      assoc_lambda=1.0):
    """Reference math in TF2: joint train, then cross-modal MSE."""
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    rng = np.random.default_rng(seed)
    archs = [
        dict(n_input=imgs.shape[1], n_h=500, n_z=20, recon="bernoulli"),
        dict(n_input=trajs.shape[1], n_h=500, n_z=20, recon="gaussian"),
    ]

    def xavier(n_in, n_out):
        a = np.sqrt(6.0 / (n_in + n_out))
        return tf.Variable(rng.uniform(-a, a, (n_in, n_out)).astype(np.float32))

    def lv(n_in, n_out):
        return xavier(n_in, n_out), tf.Variable(np.zeros(n_out, np.float32))

    towers = [
        dict(
            r1=lv(a["n_input"], a["n_h"]), r2=lv(a["n_h"], a["n_h"]),
            mu=lv(a["n_h"], a["n_z"]), lvr=lv(a["n_h"], a["n_z"]),
            g1=lv(a["n_z"], a["n_h"]), g2=lv(a["n_h"], a["n_h"]),
            out=lv(a["n_h"], a["n_input"]), recon=a["recon"],
        )
        for a in archs
    ]
    variables = [v for t in towers
                 for k in ("r1", "r2", "mu", "lvr", "g1", "g2", "out")
                 for v in t[k]]
    opt = tf.keras.optimizers.Adam(lr)

    def lin(v, x):
        return tf.matmul(x, v[0]) + v[1]

    def encode(t, x):
        h = tf.nn.softplus(lin(t["r2"], tf.nn.softplus(lin(t["r1"], x))))
        return lin(t["mu"], h), lin(t["lvr"], h)

    def decode(t, z):
        h = tf.nn.softplus(lin(t["g2"], tf.nn.softplus(lin(t["g1"], z))))
        out = lin(t["out"], h)
        return tf.nn.sigmoid(out) if t["recon"] == "bernoulli" else out

    @tf.function
    def train_step(x_img, x_traj):
        xs = (x_img, x_traj)
        with tf.GradientTape() as tape:
            cost = tf.constant(0.0)
            mus = []
            for t, x in zip(towers, xs):
                mu, logvar = encode(t, x)
                z = mu + tf.sqrt(tf.exp(logvar)) * tf.random.normal(tf.shape(mu))
                h = tf.nn.softplus(lin(t["g2"], tf.nn.softplus(lin(t["g1"], z))))
                out = lin(t["out"], h)
                if t["recon"] == "bernoulli":
                    xhat = tf.nn.sigmoid(out)
                    recon = -tf.reduce_sum(
                        x * tf.math.log(1e-10 + xhat)
                        + (1.0 - x) * tf.math.log(1e-10 + 1.0 - xhat), 1)
                else:
                    recon = tf.reduce_sum(tf.square(x - out), 1)
                kl = -0.5 * tf.reduce_sum(
                    1.0 + logvar - tf.square(mu) - tf.exp(logvar), 1)
                cost += tf.reduce_mean(recon + kl)
                mus.append(mu)
            cost += assoc_lambda * tf.reduce_mean(
                tf.reduce_sum(tf.square(mus[0] - mus[1]), 1))
        opt.apply_gradients(zip(tape.gradient(cost, variables), variables))
        return cost

    n = imgs.shape[0]
    nb = n // batch_size
    t0 = time.perf_counter()
    for epoch in range(epochs):
        perm = rng.permutation(n)
        for b in range(nb):
            sel = perm[b * batch_size : (b + 1) * batch_size]
            train_step(tf.constant(imgs[sel]), tf.constant(trajs[sel]))
    train_s = time.perf_counter() - t0

    def cross(src_t, dst_t, x, target):
        mu, _ = encode(src_t, tf.constant(x))
        out = decode(dst_t, mu)
        return float(tf.reduce_mean(tf.square(out - target)))

    return {
        "img->traj": cross(towers[0], towers[1], imgs, trajs),
        "traj->img": cross(towers[1], towers[0], trajs, imgs),
        "train_seconds": train_s,
    }


def ours_train_and_eval(imgs, trajs, epochs, batch_size=64, seed=0):
    from vae_assoc_tpu.configs import baseline_config
    from vae_assoc_tpu.train import evaluate, train_loop_fused

    cfg, tc = baseline_config(3, batch_size=batch_size, seed=seed)
    t0 = time.perf_counter()
    state, _ = train_loop_fused(cfg, tc, [imgs, trajs], epochs=epochs)
    mse = evaluate(state.params, [imgs, trajs], cfg)
    return {
        "img->traj": mse["image->trajectory"],
        "traj->img": mse["trajectory->image"],
        "train_seconds": time.perf_counter() - t0,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)  # ~converged on n=2048
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--skip-tf", action="store_true")
    args = p.parse_args(argv)

    from vae_assoc_tpu.data.pipeline import PairedDataset

    ds = PairedDataset.from_synthetic(args.n, seed=0)
    imgs, trajs = (np.asarray(a) for a in ds.features())

    ours = ours_train_and_eval(imgs, trajs, args.epochs)
    result = {"ours": ours, "epochs": args.epochs, "n": args.n}
    if not args.skip_tf:
        ref = tf_train_and_eval(imgs, trajs, args.epochs)
        result["reference_tf"] = ref
        result["mse_ratio_img->traj"] = round(ours["img->traj"] / ref["img->traj"], 4)
        result["mse_ratio_traj->img"] = round(ours["traj->img"] / ref["traj->img"], 4)
    json.dump(result, sys.stdout, default=float)
    print()


if __name__ == "__main__":
    sys.exit(main())
