"""MLP recognition/generator networks as pure pytree functions.

Architecture (SURVEY.md §2.1 "Single-modality VAE"): a softplus MLP
recognition net producing (z_mean, z_logvar) via two linear heads, and a
mirrored generator net producing decoder output (sigmoid logits for
Bernoulli images, linear for real-valued trajectories). The reference has
exactly 2 hidden layers per net; the rebuild accepts any depth via the
arch dict's contiguous ``n_hidden_{recog,gener}_k`` keys
(configs.validate_arch) — depth 2 reproduces the reference bit-for-bit.
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
      {"recog": {h1..hL, out_mean, out_logvar}, "gener": {h1..hL, out}}
    with each leaf a {"w": [in,out], "b": [out]} linear layer. Depth comes
    from the arch dict's contiguous ``n_hidden_recog_k`` /
    ``n_hidden_gener_k`` keys (configs.validate_arch) — 2 layers per net is
    the reference architecture, and at depth 2 this function is
    bit-identical to the original fixed-depth version (same key-split count
    and assignment order), so existing checkpoints and the bitwise-parity
    golden values are unchanged.

    ``n_cond > 0`` (conditional VAE, configs.ModalityConfig.n_cond) widens
    the first recognition layer to ``n_input + n_cond`` and the first
    generator layer to ``n_z + n_cond`` — the condition vector is
    concatenated at the call boundary (models/vae.py), so every apply path
    (jnp and the fused Pallas kernels, which read widths from the param
    shapes) works unchanged.
    """
    from vae_assoc_tpu.configs import gener_widths, recog_widths

    n_in, n_z = arch["n_input"], arch["n_z"]
    rw, gw = recog_widths(arch), gener_widths(arch)
    ks = iter(jax.random.split(key, len(rw) + len(gw) + 3))
    recog = {}
    prev = n_in + n_cond
    for i, width in enumerate(rw, 1):
        recog[f"h{i}"] = _init_linear(next(ks), prev, width, dtype)
        prev = width
    recog["out_mean"] = _init_linear(next(ks), prev, n_z, dtype)
    recog["out_logvar"] = _init_linear(next(ks), prev, n_z, dtype)
    gener = {}
    prev = n_z + n_cond
    for i, width in enumerate(gw, 1):
        gener[f"h{i}"] = _init_linear(next(ks), prev, width, dtype)
        prev = width
    gener["out"] = _init_linear(next(ks), prev, n_in, dtype)
    return {"recog": recog, "gener": gener}


def hidden_layers(net_params: dict) -> list:
    """The ``h1..hL`` layer dicts of one net, in forward order.

    Numeric order, not lexicographic (h10 sorts after h9)."""
    out = []
    i = 1
    while f"h{i}" in net_params:
        out.append(net_params[f"h{i}"])
        i += 1
    return out


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
    h = x
    for layer in hidden_layers(r):
        h = transfer(_linear(layer, h, compute_dtype))
    z_mean = _linear(r["out_mean"], h, compute_dtype)
    z_logvar = _linear(r["out_logvar"], h, compute_dtype)
    return z_mean, z_logvar


def decode_mlp(params: dict, z, *, compute_dtype=jnp.float32, transfer=jax.nn.softplus):
    """Generator network: z → decoder output *pre-activation*, fp32 [batch, n_input].

    For Bernoulli modalities the return value is the sigmoid *logits* (the
    stable loss consumes logits directly; apply `jax.nn.sigmoid` to get
    pixel means). For Gaussian modalities it is the reconstruction itself.
    """
    g = params["gener"]
    h = z
    for layer in hidden_layers(g):
        h = transfer(_linear(layer, h, compute_dtype))
    return _linear(g["out"], h, compute_dtype)
