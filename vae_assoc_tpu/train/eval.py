"""Cross-modal evaluation: the quality gate of BASELINE.json:2.

The reference's product feature is cross-modal generation (SURVEY.md
§3.3); its quality is measured here as cross-modal reconstruction MSE —
encode modality i, decode modality j, compare against the paired ground
truth x_j — for every ordered modality pair, plus same-modality
reconstruction MSE. One jitted pass per pair.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from vae_assoc_tpu.configs import AssocConfig
from vae_assoc_tpu.models import assoc as assoc_mod


def cross_modal_mse(
    params: dict,
    xs: Sequence[jax.Array],
    cfg: AssocConfig,
    *,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
) -> dict:
    """MSE of every encode(i)→decode(j) path against paired ground truth.

    Returns {"i->j": float-array scalar} for all ordered pairs (i≠j:
    cross-modal; i==j: plain reconstruction). Keys use modality names.
    """
    results = {}
    k = len(cfg.modalities)
    for i in range(k):
        for j in range(k):
            out = assoc_mod.cross_generate(
                params,
                xs[i],
                cfg,
                src=i,
                dst=j,
                compute_dtype=compute_dtype,
                use_pallas=use_pallas,
            )
            d = out.astype(jnp.float32) - xs[j].astype(jnp.float32)
            name = f"{cfg.modalities[i].name}->{cfg.modalities[j].name}"
            results[name] = jnp.mean(d * d)
    return results


import functools


@functools.lru_cache(maxsize=64)
def _eval_fn(cfg: AssocConfig, compute_dtype, use_pallas: bool):
    # Cached per config so periodic evaluation reuses the compiled program.
    return jax.jit(
        lambda p, xs: cross_modal_mse(
            p, xs, cfg, compute_dtype=compute_dtype, use_pallas=use_pallas
        )
    )


def evaluate(params, xs, cfg, *, compute_dtype=jnp.float32, use_pallas=False) -> dict:
    """Host-friendly wrapper: jitted cross-modal MSE dict of floats."""
    fn = _eval_fn(cfg, jnp.dtype(compute_dtype), bool(use_pallas))
    return {k: float(v) for k, v in fn(params, list(xs)).items()}
