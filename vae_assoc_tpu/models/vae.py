"""Single-modality VAE: functional core.

The reference's `VariationalAutoencoder` (SURVEY.md §1.1 L2a) builds a TF
graph once and pushes minibatches through `sess.run`. Here the model is a
pure function of (params, batch, ε): `vae_forward` runs encoder →
reparameterize → decoder, `vae_loss` adds the per-modality objective.
Everything composes with jit / grad / vmap / shard_map; the stateful
class API in :mod:`vae_assoc_tpu.api` is a thin convenience wrapper.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vae_assoc_tpu.configs import ModalityConfig
from vae_assoc_tpu.models import networks
from vae_assoc_tpu.ops import losses, sampling


class VAEOutputs(NamedTuple):
    z_mean: jax.Array  # [B, n_z] fp32
    z_logvar: jax.Array  # [B, n_z] fp32
    z: jax.Array  # [B, n_z] sampled latent
    recon: jax.Array  # [B, n_input] decoder pre-activation (logits / linear)


def _net_fns(cfg: ModalityConfig, use_pallas: bool = False):
    """Resolve (init, encode, decode) for the modality's encoder type."""
    if cfg.encoder in ("conv", "conv_pallas"):
        from vae_assoc_tpu.models import conv as conv_mod

        if cfg.encoder == "conv_pallas":
            from vae_assoc_tpu.kernels import conv as kconv

            return (
                conv_mod.init_conv_vae_params,
                kconv.encode_conv_fused,
                kconv.decode_conv_fused,
            )
        return conv_mod.init_conv_vae_params, conv_mod.encode_conv, conv_mod.decode_conv
    if use_pallas:
        from vae_assoc_tpu.kernels import mlp as kmlp

        return networks.init_mlp_vae_params, kmlp.encode_mlp_fused, kmlp.decode_mlp_fused
    return networks.init_mlp_vae_params, networks.encode_mlp, networks.decode_mlp


def init_vae(key: jax.Array, cfg: ModalityConfig, dtype=jnp.float32) -> dict:
    init_fn, _, _ = _net_fns(cfg)
    return init_fn(key, cfg.arch, dtype)


def vae_forward(
    params: dict,
    x: jax.Array,
    cfg: ModalityConfig,
    *,
    key: Optional[jax.Array] = None,
    eps: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
) -> VAEOutputs:
    """Encoder → reparameterized sample → decoder. ε via `key` or explicit."""
    _, encode, decode = _net_fns(cfg, use_pallas)
    z_mean, z_logvar = encode(params, x, compute_dtype=compute_dtype)
    z = sampling.reparameterize(z_mean, z_logvar, key=key, eps=eps)
    recon = decode(params, z, compute_dtype=compute_dtype)
    return VAEOutputs(z_mean, z_logvar, z, recon)


def vae_loss(
    out: VAEOutputs, x: jax.Array, cfg: ModalityConfig, *, parity_mode: bool = False
):
    """Per-modality loss terms, each mean-over-batch scalar fp32.

    Returns dict(recon=..., kl=...). The reference averages the summed
    per-sample cost over the batch (SURVEY.md §3.2).
    """
    if cfg.recon == "bernoulli":
        recon = losses.bernoulli_recon(x, logits=out.recon, parity_mode=parity_mode)
    else:
        recon = losses.gaussian_recon(x, out.recon)
    kl = losses.kl_divergence(out.z_mean, out.z_logvar)
    return {"recon": jnp.mean(recon), "kl": jnp.mean(kl)}


def reconstruct(params, x, cfg, *, key=None, eps=None, compute_dtype=jnp.float32):
    """x → x̂ in data space (sigmoid applied for Bernoulli modalities)."""
    out = vae_forward(params, x, cfg, key=key, eps=eps, compute_dtype=compute_dtype)
    if cfg.recon == "bernoulli":
        return jax.nn.sigmoid(out.recon)
    return out.recon


def generate(params, z, cfg, *, compute_dtype=jnp.float32, use_pallas=False):
    """z → x̂ in data space (decoder only; the reference's `generate`)."""
    _, _, decode = _net_fns(cfg, use_pallas)
    recon = decode(params, z, compute_dtype=compute_dtype)
    if cfg.recon == "bernoulli":
        return jax.nn.sigmoid(recon)
    return recon


def transform(params, x, cfg, *, compute_dtype=jnp.float32, use_pallas=False):
    """x → z_mean (the reference's `transform`: recognition-net mean)."""
    _, encode, _ = _net_fns(cfg, use_pallas)
    z_mean, _ = encode(params, x, compute_dtype=compute_dtype)
    return z_mean
