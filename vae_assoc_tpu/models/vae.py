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
    """Resolve (init, encode, decode) for the modality's encoder type.

    The fused Pallas MLP kernels implement softplus only (the reference
    default); other `transfer_fct` choices route through the jnp path.
    """
    if use_pallas and cfg.transfer != "softplus":
        use_pallas = False
    if cfg.encoder in ("conv", "conv_pallas"):
        from vae_assoc_tpu.models import conv as conv_mod

        if cfg.encoder == "conv_pallas":
            # Banded-matmul kernels (kernels/conv_banded.py) — measured 10×
            # faster than the im2col kernels (kernels/conv.py) at config-4
            # shapes; see docs/PERF.md "Conv kernels".
            from vae_assoc_tpu.kernels import conv_banded as kconv

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
    if cfg.n_cond > 0:
        # Conditional widths (MLP only — ModalityConfig rejects conv+cond).
        return init_fn(key, cfg.arch, dtype, n_cond=cfg.n_cond)
    return init_fn(key, cfg.arch, dtype)


def prepare_cond(cond, cfg: ModalityConfig, batch: int):
    """Validate/convert the condition input for a conditional modality.

    Accepts integer class labels ``[B]`` (one-hot encoded here) or an
    already-encoded float ``[B, n_cond]`` (one-hot or soft). Returns the
    fp32 ``[B, n_cond]`` array to concatenate. Raises when the modality is
    conditional and ``cond`` is missing, or shapes disagree.
    """
    if cfg.n_cond == 0:
        if cond is not None:
            raise ValueError(
                f"modality {cfg.name!r} is unconditional (n_cond=0) but a "
                "condition input was given"
            )
        return None
    if cond is None:
        raise ValueError(
            f"modality {cfg.name!r} is conditional (n_cond={cfg.n_cond}); "
            "pass `cond` (int labels [B] or one-hot [B, n_cond])"
        )
    cond = jnp.asarray(cond)
    if cond.ndim == 1:
        cond = jax.nn.one_hot(cond, cfg.n_cond, dtype=jnp.float32)
    if cond.ndim != 2 or cond.shape[-1] != cfg.n_cond:
        raise ValueError(
            f"cond must be [B] int labels or [B, {cfg.n_cond}]; "
            f"got shape {cond.shape}"
        )
    if cond.shape[0] != batch:
        raise ValueError(
            f"cond batch {cond.shape[0]} != input batch {batch}"
        )
    return cond.astype(jnp.float32)


def vae_forward(
    params: dict,
    x: jax.Array,
    cfg: ModalityConfig,
    *,
    key: Optional[jax.Array] = None,
    eps: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    cond: Optional[jax.Array] = None,
) -> VAEOutputs:
    """Encoder → reparameterized sample → decoder. ε via `key` or explicit.

    ``cond``: condition input for conditional modalities (cfg.n_cond > 0);
    concatenated to the encoder input and the sampled latent at the call
    boundary, so the kernel paths run unchanged on the widened matmuls.
    """
    from vae_assoc_tpu.configs import TRANSFER_FNS

    cond = prepare_cond(cond, cfg, x.shape[0])
    _, encode, decode = _net_fns(cfg, use_pallas)
    transfer = TRANSFER_FNS[cfg.transfer]
    x_in = x if cond is None else jnp.concatenate([jnp.asarray(x, jnp.float32), cond], axis=1)
    # named_scope: phase labels in profiler traces (SURVEY.md §5
    # "Tracing/profiling"); trace-time only, zero runtime cost.
    with jax.named_scope(f"encode_{cfg.name}"):
        z_mean, z_logvar = encode(
            params, x_in, compute_dtype=compute_dtype, transfer=transfer
        )
    with jax.named_scope(f"sample_{cfg.name}"):
        if use_pallas and eps is None and key is not None and cfg.transfer == "softplus":
            # Fused on-core sampler: ε generated by the TPU PRNG inside the
            # kernel (kernels/sampling.py) — statistically equivalent stream.
            from vae_assoc_tpu.kernels.sampling import reparameterize_fused

            z = reparameterize_fused(z_mean, z_logvar, key)
        else:
            z = sampling.reparameterize(z_mean, z_logvar, key=key, eps=eps)
    with jax.named_scope(f"decode_{cfg.name}"):
        z_in = z if cond is None else jnp.concatenate([z, cond], axis=1)
        recon = decode(params, z_in, compute_dtype=compute_dtype, transfer=transfer)
    return VAEOutputs(z_mean, z_logvar, z, recon)


def vae_loss(
    out: VAEOutputs, x: jax.Array, cfg: ModalityConfig, *, parity_mode: bool = False
):
    """Per-modality loss terms, each mean-over-batch scalar fp32.

    Returns dict(recon=..., kl=...). The reference averages the summed
    per-sample cost over the batch (SURVEY.md §3.2). In parity mode every
    reduction (feature sums and the batch mean) runs in the pinned
    left-to-right order matching the numpy oracle (losses.ordered_sum),
    making the reduction skeleton bit-reproducible on fp32 CPU.
    """
    if cfg.recon == "bernoulli":
        recon = losses.bernoulli_recon(x, logits=out.recon, parity_mode=parity_mode)
    else:
        recon = losses.gaussian_recon(x, out.recon, ordered=parity_mode)
    kl = losses.kl_divergence(out.z_mean, out.z_logvar, ordered=parity_mode)
    mean = losses.ordered_mean if parity_mode else jnp.mean
    return {"recon": mean(recon), "kl": mean(kl)}


def reconstruct(params, x, cfg, *, key=None, eps=None, compute_dtype=jnp.float32, cond=None):
    """x → x̂ in data space (sigmoid applied for Bernoulli modalities)."""
    out = vae_forward(
        params, x, cfg, key=key, eps=eps, compute_dtype=compute_dtype, cond=cond
    )
    if cfg.recon == "bernoulli":
        return jax.nn.sigmoid(out.recon)
    return out.recon


def generate(params, z, cfg, *, compute_dtype=jnp.float32, use_pallas=False, cond=None):
    """z → x̂ in data space (decoder only; the reference's `generate`)."""
    from vae_assoc_tpu.configs import TRANSFER_FNS

    cond = prepare_cond(cond, cfg, z.shape[0])
    if cond is not None:
        z = jnp.concatenate([jnp.asarray(z, jnp.float32), cond], axis=1)
    _, _, decode = _net_fns(cfg, use_pallas)
    recon = decode(
        params, z, compute_dtype=compute_dtype, transfer=TRANSFER_FNS[cfg.transfer]
    )
    if cfg.recon == "bernoulli":
        return jax.nn.sigmoid(recon)
    return recon


def transform(params, x, cfg, *, compute_dtype=jnp.float32, use_pallas=False, cond=None):
    """x → z_mean (the reference's `transform`: recognition-net mean)."""
    from vae_assoc_tpu.configs import TRANSFER_FNS

    cond = prepare_cond(cond, cfg, x.shape[0])
    if cond is not None:
        x = jnp.concatenate([jnp.asarray(x, jnp.float32), cond], axis=1)
    _, encode, _ = _net_fns(cfg, use_pallas)
    z_mean, _ = encode(
        params, x, compute_dtype=compute_dtype, transfer=TRANSFER_FNS[cfg.transfer]
    )
    return z_mean
