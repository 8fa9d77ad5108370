"""Pure-numpy oracle of the reference math (SURVEY.md §4.1).

A from-scratch fp32 implementation of the associative VAE forward pass and
joint loss exactly as the reference computes it (Metzen-lineage VAE +
association term; SURVEY.md §3.2): 2-hidden-layer softplus MLPs, sigmoid
probabilities with ε=1e-10 clamped logs for Bernoulli reconstruction,
closed-form KL, pairwise latent-mean L2 association. Used as the golden
source for parity tests and (with a step of finite-difference-free autograd
via TF2 in bench) the CPU throughput baseline.

ε (the reparameterization noise) is an explicit argument everywhere so the
oracle and the JAX path see identical randomness.

Reductions are pinned to strict left-to-right order (`np.cumsum`, which is
sequential by definition — `np.sum` is pairwise) so the oracle's reduction
skeleton is bit-identical to the JAX parity path's `losses.ordered_sum`
(loop-carried scan). See docs/PARITY.md for the bitwise-parity contract.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-10


def ordered_sum(a, axis=-1):
    """Strict sequential left-to-right sum (pinned order; np.sum is pairwise)."""
    return np.cumsum(a, axis=axis, dtype=np.float32).take(-1, axis=axis)


def ordered_mean(a, axis=-1):
    # Reciprocal-multiply to match XLA's divide-by-constant rewrite (see
    # losses.ordered_mean): bit-identical to the JAX parity path.
    return ordered_sum(a, axis) * np.float32(1.0 / a.shape[axis])


def softplus(x):
    # Stable: log(1+e^x) = max(x,0) + log1p(exp(-|x|))
    return np.maximum(x, 0.0) + np.log1p(np.exp(-np.abs(x)))


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def linear(p, x):
    return x.astype(np.float32) @ p["w"].astype(np.float32) + p["b"].astype(np.float32)


def encode(params, x):
    r = params["recog"]
    h1 = softplus(linear(r["h1"], x))
    h2 = softplus(linear(r["h2"], h1))
    return linear(r["out_mean"], h2), linear(r["out_logvar"], h2)


def decode(params, z):
    g = params["gener"]
    h1 = softplus(linear(g["h1"], z))
    h2 = softplus(linear(g["h2"], h1))
    return linear(g["out"], h2)  # pre-activation (logits / linear output)


def reparam(z_mean, z_logvar, eps):
    return z_mean + np.sqrt(np.exp(z_logvar)) * eps


def bernoulli_recon(x, probs):
    ll = x * np.log(EPS + probs) + (1.0 - x) * np.log(EPS + 1.0 - probs)
    return -ordered_sum(ll, axis=-1)


def gaussian_recon(x, x_recon):
    d = x - x_recon
    return ordered_sum(d * d, axis=-1)


def kl(z_mean, z_logvar):
    return -0.5 * ordered_sum(
        1.0 + z_logvar - z_mean**2 - np.exp(z_logvar), axis=-1
    )


def assoc_term(z_means, z_logvars=None, zs=None, form="mean_l2", temp=0.1):
    """Association term, all configured forms (ops/losses.ASSOC_FORMS).

    Same pinned cumsum reduction as the other terms; the default form stays
    the bitwise-parity surface, the alternates are the oracle twins for
    tests/test_assoc_forms.py."""
    if form == "infonce":
        total = np.zeros(z_means[0].shape[0], dtype=np.float64)
        normed = [
            z / np.sqrt(np.sum(z * z, axis=-1, keepdims=True) + 1e-12)
            for z in np.asarray(z_means, dtype=np.float64)
        ]
        for i in range(len(normed)):
            for j in range(i + 1, len(normed)):
                logits = (normed[i] @ normed[j].T) / temp
                pos = np.diagonal(logits)
                m_r = logits.max(axis=1)
                lse_r = m_r + np.log(np.exp(logits - m_r[:, None]).sum(axis=1))
                m_c = logits.max(axis=0)
                lse_c = m_c + np.log(np.exp(logits - m_c[None, :]).sum(axis=0))
                total = total + 0.5 * ((lse_r - pos) + (lse_c - pos))
        return total.astype(np.float32)
    pts = zs if form == "sample_l2" else z_means
    total = np.zeros(pts[0].shape[0], dtype=np.float32)
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            if form == "sym_kl":
                d2 = (z_means[i] - z_means[j]) ** 2
                vi, vj = np.exp(z_logvars[i]), np.exp(z_logvars[j])
                term = 0.5 * ((vi + d2) / vj + (vj + d2) / vi - 2.0)
                total = total + ordered_sum(term, axis=-1)
            else:
                d = pts[i] - pts[j]
                total = total + ordered_sum(d * d, axis=-1)
    return total


def joint_loss(params_list, xs, eps_list, recon_types, assoc_lambda):
    """Full joint objective → (total, metrics). Mirrors assoc_loss_fn."""
    z_means, metrics, total = [], {}, np.float32(0.0)
    for k, (p, x, eps, rt) in enumerate(
        zip(params_list, xs, eps_list, recon_types)
    ):
        zm, zlv = encode(p, x)
        z = reparam(zm, zlv, eps)
        out = decode(p, z)
        if rt == "bernoulli":
            rec = bernoulli_recon(x, sigmoid(out))
        else:
            rec = gaussian_recon(x, out)
        k_l = kl(zm, zlv)
        metrics[f"recon_{k}"] = ordered_mean(rec)
        metrics[f"kl_{k}"] = ordered_mean(k_l)
        total = total + metrics[f"recon_{k}"] + metrics[f"kl_{k}"]
        z_means.append(zm)
    a = ordered_mean(assoc_term(z_means)) if len(z_means) > 1 else np.float32(0.0)
    metrics["assoc"] = a
    total = total + np.float32(assoc_lambda) * a
    metrics["total"] = total
    return total, metrics
