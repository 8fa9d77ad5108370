"""Conv encoder / transposed-conv decoder image branch (BASELINE.json:10).

Config-4's TPU-native image tower, replacing the MLP stacks for the 28×28
branch: a strided-conv recognition net and a mirrored transposed-conv
generator net. Layout is NHWC with HWIO kernels — the TPU-preferred
convolution layout (channels on the 128-lane minor dimension). The
flattened-vector API is preserved: inputs/outputs are [B, 784] exactly
like the MLP tower, so the joint model, losses, and cross-modal paths are
tower-agnostic.

Architecture (channels are module constants; dense widths come from the
reference-style arch dict, SURVEY.md §5 "Config"):

  encode: [B,28,28,1] ─conv3×3,s2→ [B,14,14,C1] ─conv3×3,s2→ [B,7,7,C2]
          ─flatten→ dense(n_hidden_recog_2) ─heads→ (μ, logσ²)
  decode: z ─dense(n_hidden_gener_1)─ dense(7·7·C2) ─reshape→ [B,7,7,C2]
          ─convT3×3,s2→ [B,14,14,C1] ─convT3×3,s2→ [B,28,28,1] → logits

Precision follows `models.networks._linear`: fp32 params everywhere;
compute_dtype=bf16 → MXU DEFAULT precision (bf16 passes, fp32 accum),
fp32 → HIGHEST.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vae_assoc_tpu.models import networks as networks_mod

IMG_SIZE = 28
C1 = 32
C2 = 64
_MID = IMG_SIZE // 2  # 14
_SMALL = IMG_SIZE // 4  # 7
_FLAT = _SMALL * _SMALL * C2  # 3136
_DN = ("NHWC", "HWIO", "NHWC")


# Single-source policy/helpers from networks.py (review round 2: three
# near-identical precision/linear copies risked silent numeric divergence
# between the conv and MLP towers).
_precision = networks_mod.matmul_precision
_dense = networks_mod.linear_with_precision
_dense_init = networks_mod._init_linear


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in, fan_out = kh * kw * cin, kh * kw * cout
    a = jnp.sqrt(6.0 / (fan_in + fan_out)).astype(dtype)
    w = jax.random.uniform(key, (kh, kw, cin, cout), dtype, -a, a)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def init_conv_vae_params(key: jax.Array, arch, dtype=jnp.float32) -> dict:
    """Conv tower params. Requires arch n_input == 784 (28×28)."""
    if arch["n_input"] != IMG_SIZE * IMG_SIZE:
        raise ValueError(f"conv tower needs n_input={IMG_SIZE * IMG_SIZE}")
    n_z = arch["n_z"]
    hr = arch["n_hidden_recog_2"]
    hg = arch["n_hidden_gener_1"]
    ks = jax.random.split(key, 9)
    return {
        "recog": {
            "conv1": _conv_init(ks[0], 3, 3, 1, C1, dtype),
            "conv2": _conv_init(ks[1], 3, 3, C1, C2, dtype),
            "dense": _dense_init(ks[2], _FLAT, hr, dtype),
            "out_mean": _dense_init(ks[3], hr, n_z, dtype),
            "out_logvar": _dense_init(ks[4], hr, n_z, dtype),
        },
        "gener": {
            "dense1": _dense_init(ks[5], n_z, hg, dtype),
            "dense2": _dense_init(ks[6], hg, _FLAT, dtype),
            "convt1": _conv_init(ks[7], 3, 3, C2, C1, dtype),
            "convt2": _conv_init(ks[8], 3, 3, C1, 1, dtype),
        },
    }


def encode_conv(params, x, *, compute_dtype=jnp.float32, transfer=jax.nn.softplus):
    """[B, 784] → (z_mean, z_logvar), both fp32 [B, n_z]."""
    prec = _precision(compute_dtype)
    r = params["recog"]
    img = x.astype(jnp.float32).reshape(-1, IMG_SIZE, IMG_SIZE, 1)
    h = jax.lax.conv_general_dilated(
        img, r["conv1"]["w"], window_strides=(2, 2), padding="SAME",
        dimension_numbers=_DN, precision=prec,
        preferred_element_type=jnp.float32,
    )
    h = transfer(h + r["conv1"]["b"])
    h = jax.lax.conv_general_dilated(
        h, r["conv2"]["w"], window_strides=(2, 2), padding="SAME",
        dimension_numbers=_DN, precision=prec,
        preferred_element_type=jnp.float32,
    )
    h = transfer(h + r["conv2"]["b"])
    h = transfer(_dense(r["dense"], h.reshape(h.shape[0], _FLAT), prec))
    return _dense(r["out_mean"], h, prec), _dense(r["out_logvar"], h, prec)


def decode_conv(params, z, *, compute_dtype=jnp.float32, transfer=jax.nn.softplus):
    """z [B, n_z] → decoder logits [B, 784] (sigmoid → pixel means)."""
    prec = _precision(compute_dtype)
    g = params["gener"]
    h = transfer(_dense(g["dense1"], z, prec))
    h = transfer(_dense(g["dense2"], h, prec))
    h = h.reshape(-1, _SMALL, _SMALL, C2)
    h = jax.lax.conv_transpose(
        h, g["convt1"]["w"], strides=(2, 2), padding="SAME",
        dimension_numbers=_DN, precision=prec,
        preferred_element_type=jnp.float32,
    )
    h = transfer(h + g["convt1"]["b"])
    h = jax.lax.conv_transpose(
        h, g["convt2"]["w"], strides=(2, 2), padding="SAME",
        dimension_numbers=_DN, precision=prec,
        preferred_element_type=jnp.float32,
    )
    h = h + g["convt2"]["b"]
    return h.reshape(h.shape[0], IMG_SIZE * IMG_SIZE)
