"""Fused on-device reparameterization: per-core PRNG + Box–Muller + z = μ+σε.

The reference samples ε with TF's stateful `random_normal` (SURVEY.md
§3.2); the jnp path uses counter-based `jax.random`. This kernel is the
third option mandated by SURVEY.md §2.3 — "optional fused
reparameterization (per-core `pltpu.prng_seed`/`prng_random_bits`)":
random bits are generated *inside* the kernel on the TPU core and turned
into N(0,1) by Box–Muller, so ε never exists in HBM and the sampler fuses
with the surrounding arithmetic.

Determinism: the seed is derived from a standard JAX PRNG key, so the
stream is a pure function of (key, shape) like the jnp path (but a
*different* stream — statistically equivalent, not bitwise; parity tests
inject ε explicitly, SURVEY.md §7 "RNG semantics").

Custom VJP: z = μ + exp(½·logvar)·ε ⇒ dμ = g, dlogvar = ½·g·(z − μ).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_assoc_tpu.kernels.mlp import (
    _fwd_compiler_params,
    _interpret,
    _pvary_like,
    _sds,
)

_TWO_PI = 6.283185307179586
# Knuth multiplicative hash for per-tile seed decorrelation (identical
# seeding across grid steps would replicate ε tile-to-tile). Shared with
# kernels/megakernel.py so both kernels draw the same reviewed stream.
SEED_TILE_HASH = -1640531527


def fold_key_to_seed(key):
    """Fold a JAX PRNG key into the one-word int32 seed the on-core PRNG
    takes. Single source — megakernel.py reuses it, so a change to the
    fold (stream-quality fix) cannot silently diverge between kernels."""
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    return (data[0] ^ (data[-1] << 7)).astype(jnp.int32).reshape(1)


def _normal_bits(shape):
    """Box–Muller on two draws of uniform bits → N(0,1) fp32 of `shape`."""
    # bitcast: prng_random_bits can come back as signed int32 — shifting
    # with the sign bit set would yield negative "uniforms" (log → NaN).
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # 24 high bits → uniform in (0, 1]; keep u1 away from 0 for the log.
    # (uint32→f32 has no Mosaic lowering; >>8 clears the sign bit, so a
    # bitcast to int32 is value-preserving and int32→f32 is supported.)
    i1 = pltpu.bitcast(b1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(b2 >> 8, jnp.int32)
    u1 = i1.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-7
    u2 = i2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _reparam_kernel(mu_ref, lv_ref, seed_ref, z_ref, eps_ref):
    # Per-tile seed decorrelation: identical seeding across grid steps
    # would replicate ε tile-to-tile (Knuth multiplicative hash of the
    # tile index keeps streams disjoint).
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(SEED_TILE_HASH))
    eps = _normal_bits(mu_ref.shape)
    eps_ref[:] = eps
    z_ref[:] = mu_ref[:] + jnp.exp(0.5 * lv_ref[:]) * eps


def _sample_impl(z_mean, z_logvar, seed):
    from vae_assoc_tpu.kernels.mlp import _batch_tile

    b, nz = z_mean.shape
    tile = _batch_tile(b, limit=1024)
    row = pl.BlockSpec((tile, nz), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _reparam_kernel,
        grid=(pl.cdiv(b, tile),),
        in_specs=[row, row, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(row, row),
        out_shape=(
            _sds(z_mean.shape, jnp.float32, z_mean),
            _sds(z_mean.shape, jnp.float32, z_mean),
        ),
        # Grid steps are independent (per-tile rows; the PRNG stream is a
        # pure function of seed + program_id, so ordering is irrelevant).
        compiler_params=_fwd_compiler_params(),
        interpret=_interpret(),
    )(z_mean.astype(jnp.float32), z_logvar.astype(jnp.float32), seed)


@jax.custom_vjp
def reparameterize_fused(z_mean, z_logvar, key):
    """z = μ + exp(½ logσ²)·ε with ε generated on-core. Returns z [B, n_z]."""
    return _reparam_fwd(z_mean, z_logvar, key)[0]


def _reparam_fwd(z_mean, z_logvar, key):
    if _interpret():
        # pltpu.prng_seed has no CPU-interpret lowering; off-TPU the fused
        # sampler degrades to the counter-based jax.random stream (same
        # distribution, different bits — see module docstring).
        eps = jax.random.normal(key, z_mean.shape, jnp.float32)
        z = z_mean.astype(jnp.float32) + jnp.exp(0.5 * z_logvar.astype(jnp.float32)) * eps
        return z, (z_logvar, eps)
    # Fold the key into a 1-word seed for the per-core PRNG. Promote its
    # vma to the batch's (under shard_map a mesh-invariant key would
    # otherwise fail the pallas_call's varying/invariant type check).
    (seed,) = _pvary_like([fold_key_to_seed(key)], z_mean)
    z, eps = _sample_impl(z_mean, z_logvar, seed)
    return z, (z_logvar, eps)


def _reparam_bwd(res, g):
    z_logvar, eps = res
    dlv = 0.5 * g * jnp.exp(0.5 * z_logvar.astype(jnp.float32)) * eps
    return g, dlv, None


reparameterize_fused.defvjp(_reparam_fwd, _reparam_bwd)
