"""MLP recognition/generator networks as pure pytree functions.

Architecture (SURVEY.md §2.1 "Single-modality VAE"): a 2-hidden-layer
softplus MLP recognition net producing (z_mean, z_logvar) via two linear
heads, and a mirrored 2-hidden-layer generator net producing decoder output
(sigmoid logits for Bernoulli images, linear for real-valued trajectories).
Weights are Xavier/Glorot-uniform initialized (the reference's
`xavier_init`: U(±sqrt(6/(fan_in+fan_out)))), biases zero.

Params are plain nested dicts (pytrees) — no module framework — so the same
trees flow unchanged through jit / grad / shard_map / orbax, and the apply
functions can be swapped for fused Pallas kernels behind identical
signatures (SURVEY.md §7 step 4).

Precision: weights live in fp32; ``compute_dtype`` (fp32 or bf16) controls
matmul input dtype with fp32 accumulation (`preferred_element_type`) — the
bf16-matmul/fp32-accum policy of BASELINE.json:11. Heads (z_mean, z_logvar,
decoder output) are always computed in fp32 because the loss is fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xavier_uniform(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """Glorot-uniform: U(−a, a), a = sqrt(6/(fan_in+fan_out))."""
    a = jnp.sqrt(6.0 / (fan_in + fan_out)).astype(dtype)
    return jax.random.uniform(key, (fan_in, fan_out), dtype, -a, a)


def _init_linear(key, n_in, n_out, dtype=jnp.float32):
    return {
        "w": xavier_uniform(key, n_in, n_out, dtype),
        "b": jnp.zeros((n_out,), dtype),
    }


def init_mlp_vae_params(
    key: jax.Array, arch: dict, dtype=jnp.float32, n_cond: int = 0
) -> dict:
    """Initialize one modality's recognition + generator stacks.

    Returns
      {"recog": {h1, h2, out_mean, out_logvar}, "gener": {h1, h2, out}}
    with each leaf a {"w": [in,out], "b": [out]} linear layer.

    ``n_cond > 0`` (conditional VAE, configs.ModalityConfig.n_cond) widens
    the first recognition layer to ``n_input + n_cond`` and the first
    generator layer to ``n_z + n_cond`` — the condition vector is
    concatenated at the call boundary (models/vae.py), so every apply path
    (jnp and the fused Pallas kernels, which read widths from the param
    shapes) works unchanged.
    """
    n_in, n_z = arch["n_input"], arch["n_z"]
    r1, r2 = arch["n_hidden_recog_1"], arch["n_hidden_recog_2"]
    g1, g2 = arch["n_hidden_gener_1"], arch["n_hidden_gener_2"]
    ks = jax.random.split(key, 7)
    return {
        "recog": {
            "h1": _init_linear(ks[0], n_in + n_cond, r1, dtype),
            "h2": _init_linear(ks[1], r1, r2, dtype),
            "out_mean": _init_linear(ks[2], r2, n_z, dtype),
            "out_logvar": _init_linear(ks[3], r2, n_z, dtype),
        },
        "gener": {
            "h1": _init_linear(ks[4], n_z + n_cond, g1, dtype),
            "h2": _init_linear(ks[5], g1, g2, dtype),
            "out": _init_linear(ks[6], g2, n_in, dtype),
        },
    }


def matmul_precision(compute_dtype):
    """THE matmul precision policy, single source (reused by the conv
    towers in models/conv.py and kernels/conv*.py): fp32 compute_dtype →
    ``HIGHEST`` (true fp32 multiplies, parity-grade numerics); anything
    else → ``DEFAULT`` (bf16 multiply passes with fp32 accumulation — the
    bf16-matmul policy of BASELINE.json:11)."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(compute_dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def linear_with_precision(p, x, precision):
    """x @ w + b at an explicit matmul precision, fp32 accumulation."""
    y = jnp.dot(
        x.astype(jnp.float32),
        p["w"],
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


def _linear(p, x, compute_dtype):
    """x @ w + b with fp32 accumulation; output fp32.

    The compute-dtype policy is expressed through matmul *precision*, not
    input casts: on TPU, fp32 operands with ``Precision.DEFAULT`` already
    run bf16 multiply passes on the MXU with fp32 accumulation — that IS
    the bf16-matmul policy of BASELINE.json:11, and it is ~10x faster than
    materializing bf16 copies of weights/activations (measured: explicit
    astype(bf16) breaks XLA fusion and drops the train step from 20.8M to
    2.4M samples/s on v5e). fp32 compute_dtype requests ``HIGHEST``
    (true fp32 multiplies) for parity-grade numerics.
    """
    return linear_with_precision(p, x, matmul_precision(compute_dtype))


def encode_mlp(params: dict, x, *, compute_dtype=jnp.float32, transfer=jax.nn.softplus):
    """Recognition network: x → (z_mean, z_logvar), both fp32 [batch, n_z]."""
    r = params["recog"]
    h1 = transfer(_linear(r["h1"], x, compute_dtype))
    h2 = transfer(_linear(r["h2"], h1, compute_dtype))
    z_mean = _linear(r["out_mean"], h2, compute_dtype)
    z_logvar = _linear(r["out_logvar"], h2, compute_dtype)
    return z_mean, z_logvar


def decode_mlp(params: dict, z, *, compute_dtype=jnp.float32, transfer=jax.nn.softplus):
    """Generator network: z → decoder output *pre-activation*, fp32 [batch, n_input].

    For Bernoulli modalities the return value is the sigmoid *logits* (the
    stable loss consumes logits directly; apply `jax.nn.sigmoid` to get
    pixel means). For Gaussian modalities it is the reconstruction itself.
    """
    g = params["gener"]
    h1 = transfer(_linear(g["h1"], z, compute_dtype))
    h2 = transfer(_linear(g["h2"], h1, compute_dtype))
    return _linear(g["out"], h2, compute_dtype)
