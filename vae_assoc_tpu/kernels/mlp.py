"""Fused Pallas TPU kernels for the VAE's MLP encoder/decoder stacks.

The north star mandates the per-modality encoder/decoder MLPs execute as
fused kernels (BASELINE.json:5 "fused Pallas/XLA kernels"). Each kernel
runs a whole recognition (x → h1 → h2 → μ, logσ²) or generator
(z → h1 → h2 → out) stack in one `pallas_call`:

- the batch is tiled over the grid; per tile, *all* layer weights live in
  VMEM and intermediate activations never touch HBM;
- matmuls use the MXU with `preferred_element_type=float32`; the
  `compute_dtype` policy (fp32, or bf16 inputs with fp32 accumulation) is
  baked in statically, matching `models.networks` bit-for-bit at fp32;
- the backward pass is a second fused kernel (custom VJP) that
  *rematerializes* h1/h2 from the saved layer inputs instead of storing
  them — trading MXU FLOPs (cheap here) for HBM bandwidth (the bottleneck)
  — and accumulates weight gradients across batch tiles in-place.

Drop-in signatures: `encode_mlp_fused` / `decode_mlp_fused` mirror
`networks.encode_mlp` / `networks.decode_mlp` (SURVEY.md §7 step 4 —
kernels land behind identical function signatures). Parity is enforced by
`tests/test_kernels.py` (interpret mode on CPU; real lowering on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU (pallas_call interpret mode)


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


def _shardmap_interpret(x) -> bool:
    """True when running the interpret fallback *inside* shard_map: the
    Pallas HLO interpreter evaluates kernel bodies under vma typing, where
    in-kernel literals (vma-invariant) cannot mix with varying operands.
    Wrappers then route to their identical-math jnp implementations — the
    kernel bodies are parity-tested separately, and the real Mosaic
    lowering only vma-checks the pallas_call boundary (handled by _sds +
    _pvary_like)."""
    return _interpret() and bool(jax.typeof(x).vma)


def _pvary_like(arrs, like):
    """Promote mesh-invariant arrays to `like`'s varying-across-axes type.

    Under `shard_map(check_vma=True)` a kernel mixing a varying batch with
    invariant weights fails vma checking (no auto-promotion inside
    pallas_call). `jax.lax.pvary`'s transpose is `psum`, so applying it
    *outside* the kernels' custom_vjp also makes the weight-grad cotangents
    come back globally reduced with no hand-written collective."""
    want = jax.typeof(like).vma
    if not want:
        return list(arrs)
    out = []
    for a in arrs:
        missing = tuple(want - jax.typeof(a).vma)
        out.append(jax.lax.pvary(a, missing) if missing else a)
    return out


def _sds(shape, dtype, like):
    """ShapeDtypeStruct that propagates `like`'s varying-across-mesh-axes
    type (vma). Under `shard_map(check_vma=True)` (the jax 0.9 default)
    pallas_call outputs must declare their vma explicitly — kernel outputs
    vary exactly as their batch input does, so we copy it."""
    vma = jax.typeof(like).vma
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _bwd_tile_limit(b: int) -> int:
    """Backward batch-tile limit. The backward kernels hold weights + grad
    accumulators + rematerialized activations in VMEM; a ragged batch adds
    masking temps that pushed tile 256 ~1.9 MB over the 16 MB scoped limit
    at the reference-scale encoder (784/500/500/20). Divisible batches
    generate no mask code, so they keep the faster 256 tile (measured ~9%
    end-to-end at the headline bench); ragged batches drop to 128."""
    return 256 if b % 256 == 0 else 128


def _lane(n: int) -> int:
    """Lane-padded width: TPU vector memory tiles the minor dim to 128."""
    return max(128, ((n + 127) // 128) * 128)


def _pow2_tile(b: int) -> int:
    """Smallest power-of-two tile ≥ b (min 8) — the whole-batch tile used
    when the batch is smaller than the computed tile limit. Shared by every
    kernel's tile sizing (mlp/megakernel/conv_banded)."""
    t = 8
    while t < b:
        t *= 2
    return t


def _batch_tile(b: int, limit: int = 256) -> int:
    """Batch tile ≤ limit, always a multiple of 8 (Mosaic requires the
    sublane dim of a block divisible by 8 unless it equals the array dim).
    The batch need NOT divide it: the grid is ceil-div and a ragged last
    tile is masked in the kernels, so an arbitrary (e.g. prime)
    production-sized batch never degenerates into a single whole-batch
    VMEM tile. The small-batch power-of-two fallback is capped at the
    limit: with a non-power-of-two (budget-derived) limit, rounding b up
    could otherwise pick a tile ~2x what the VMEM budget allows."""
    cap = max(8, (limit // 8) * 8)
    if b >= limit:
        return cap
    return min(_pow2_tile(b), cap)


def _grid(b: int, tile: int) -> tuple:
    return (pl.cdiv(b, tile),)


def _row_mask(tile: int, b: int):
    """[tile, 1] bool mask of rows that belong to the real batch in this
    grid step (False on the zero-padded tail of a ragged last tile)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    return rows < (b - pl.program_id(0) * tile)


def _mm(a, w, cd):
    """MXU matmul with the compute-dtype policy (mirrors networks._linear):
    fp32 → HIGHEST (true fp32 passes, parity-grade); bf16 → bf16 inputs with
    fp32 accumulation (the BASELINE.json:11 bf16-matmul policy)."""
    if jnp.dtype(cd) == jnp.float32:
        return jnp.dot(
            a, w, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(a.astype(cd), w.astype(cd), preferred_element_type=jnp.float32)


def _dot_dn(a, b, dn, cd):
    if jnp.dtype(cd) != jnp.float32:
        a, b = a.astype(cd), b.astype(cd)
        prec = None
    else:
        prec = jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn, precision=prec,
        preferred_element_type=jnp.float32,
    )


def _mm_tn(a, b, cd):
    """aᵀ·b without materializing the transpose: contract the row dim.

    [R, M]ᵀ @ [R, N] → [M, N] via dot_general dimension numbers — the MXU
    consumes transposed operands natively, so backward weight-grad matmuls
    skip an explicit VMEM transpose."""
    return _dot_dn(a, b, (((0,), (0,)), ((), ())), cd)


def _mm_nt(a, b, cd):
    """a·bᵀ without materializing the transpose: [M, K] @ [N, K]ᵀ → [M, N]."""
    return _dot_dn(a, b, (((1,), (1,)), ((), ())), cd)


def _softplus(a):
    # log1p(exp(a)) with the standard overflow-safe form; matches
    # jax.nn.softplus (max(a,0) + log1p(exp(-|a|))).
    return jnp.maximum(a, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(a)))


# ---------------------------------------------------------------------------
# Encoder: x → softplus(x@w1+b1) → softplus(·@w2+b2) → (μ, logσ²)
# ---------------------------------------------------------------------------


def _enc_fwd_kernel(cd, x_ref, w1, b1, w2, b2, wm, bm, wl, bl, mu_ref, lv_ref):
    h1 = _softplus(_mm(x_ref[:], w1[:], cd) + b1[:])
    h2 = _softplus(_mm(h1, w2[:], cd) + b2[:])
    mu_ref[:] = _mm(h2, wm[:], cd) + bm[:]
    lv_ref[:] = _mm(h2, wl[:], cd) + bl[:]


def _enc_bwd_kernel(
    cd, nrows, x_ref, w1, b1, w2, b2, wm, bm, wl, bl, dmu_ref, dlv_ref,
    dx_ref, dw1, db1, dw2, db2, dwm, dbm, dwl, dbl,
):
    x = x_ref[:]
    dmu = dmu_ref[:]
    dlv = dlv_ref[:]
    if nrows % x.shape[0]:
        # Ragged last tile: zero both the inputs (so rematerialized
        # activations are finite) and the cotangents (so masked rows
        # contribute exactly 0 to the weight-grad accumulators).
        valid = _row_mask(x.shape[0], nrows)
        x = jnp.where(valid, x, 0.0)
        dmu = jnp.where(valid, dmu, 0.0)
        dlv = jnp.where(valid, dlv, 0.0)
    # Rematerialize forward activations for this batch tile.
    a1 = _mm(x, w1[:], cd) + b1[:]
    h1 = _softplus(a1)
    a2 = _mm(h1, w2[:], cd) + b2[:]
    h2 = _softplus(a2)
    # Head grads + fan-in to h2; transposed operands go to the MXU via
    # dot_general dimension numbers (no VMEM transpose materialized).
    dh2 = _mm_nt(dmu, wm[:], cd) + _mm_nt(dlv, wl[:], cd)
    da2 = dh2 * jax.nn.sigmoid(a2)  # softplus' = sigmoid
    dh1 = _mm_nt(da2, w2[:], cd)
    da1 = dh1 * jax.nn.sigmoid(a1)
    dx_ref[:] = _mm_nt(da1, w1[:], cd)

    first = pl.program_id(0) == 0
    for ref, val in (
        (dwm, _mm_tn(h2, dmu, cd)),
        (dbm, jnp.sum(dmu, axis=0, keepdims=True)),
        (dwl, _mm_tn(h2, dlv, cd)),
        (dbl, jnp.sum(dlv, axis=0, keepdims=True)),
        (dw2, _mm_tn(h1, da2, cd)),
        (db2, jnp.sum(da2, axis=0, keepdims=True)),
        (dw1, _mm_tn(x, da1, cd)),
        (db1, jnp.sum(da1, axis=0, keepdims=True)),
    ):
        @pl.when(first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, val=val):
            ref[:] += val


def _enc_flat(params):
    r = params["recog"]
    return (
        r["h1"]["w"], r["h1"]["b"][None, :],
        r["h2"]["w"], r["h2"]["b"][None, :],
        r["out_mean"]["w"], r["out_mean"]["b"][None, :],
        r["out_logvar"]["w"], r["out_logvar"]["b"][None, :],
    )


_PARALLEL_FWD_GRID = True  # A/B knob: scripts/bench_grid_semantics.py


def _fwd_compiler_params():
    """Compiler params for FORWARD kernels only, whose grid steps are
    independent (each writes just its own batch-tile rows): declaring the
    batch grid dimension 'parallel' lets Mosaic schedule without assuming
    sequential-revisit semantics. The backward kernels accumulate weight
    grads across grid steps and MUST keep the default 'arbitrary'.
    Measured on v5e (docs/PERF.md "Grid semantics"): +1.3% on the mega
    path (won both interleaved blocks), neutral on the composable path —
    kept on as the semantically correct declaration."""
    if not _PARALLEL_FWD_GRID or _interpret():
        return None
    return pltpu.CompilerParams(dimension_semantics=("parallel",))


def _tile_spec(tile, ncols):
    return pl.BlockSpec((tile, ncols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _encode_fused(flat, x, cd):
    return _encode_fused_fwd(flat, x, cd)[0]


def _encode_fused_fwd(flat, x, cd):
    b, n_in = x.shape
    n_z = flat[4].shape[1]
    tile = _batch_tile(b)
    mu, lv = pl.pallas_call(
        functools.partial(_enc_fwd_kernel, cd),
        grid=_grid(b, tile),
        in_specs=[_tile_spec(tile, n_in)] + _full_specs(8),
        out_specs=(_tile_spec(tile, n_z), _tile_spec(tile, n_z)),
        out_shape=(
            _sds((b, n_z), jnp.float32, x),
            _sds((b, n_z), jnp.float32, x),
        ),
        compiler_params=_fwd_compiler_params(),
        interpret=_interpret(),
    )(x, *flat)
    return (mu, lv), (flat, x)


def _encode_fused_bwd(cd, res, cts):
    flat, x = res
    dmu, dlv = cts
    b, n_in = x.shape
    tile = _batch_tile(b, limit=_bwd_tile_limit(b))
    n_z = flat[4].shape[1]
    w_shapes = [_sds(w.shape, jnp.float32, x) for w in flat]
    dx, *dflat = pl.pallas_call(
        functools.partial(_enc_bwd_kernel, cd, b),
        grid=_grid(b, tile),
        in_specs=[_tile_spec(tile, n_in)]
        + _full_specs(8)
        + [_tile_spec(tile, n_z), _tile_spec(tile, n_z)],
        out_specs=tuple(
            [_tile_spec(tile, n_in)]
            + [pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for s in w_shapes]
        ),
        out_shape=tuple([_sds((b, n_in), jnp.float32, x)] + w_shapes),
        interpret=_interpret(),
    )(x, *flat, dmu, dlv)
    return tuple(dflat), dx


_encode_fused.defvjp(_encode_fused_fwd, _encode_fused_bwd)


def encode_mlp_fused(params, x, *, compute_dtype=jnp.float32, transfer=None):
    """Drop-in for `networks.encode_mlp`, fused on TPU. softplus only."""
    if _shardmap_interpret(x):
        from vae_assoc_tpu.models import networks

        return networks.encode_mlp(
            params, x, compute_dtype=compute_dtype, transfer=jax.nn.softplus
        )
    flat = tuple(_pvary_like(_enc_flat(params), x))
    mu, lv = _encode_fused(flat, x.astype(jnp.float32), jnp.dtype(compute_dtype).name)
    return mu, lv


# ---------------------------------------------------------------------------
# Decoder: z → softplus(z@w1+b1) → softplus(·@w2+b2) → out (linear)
# ---------------------------------------------------------------------------


def _dec_fwd_kernel(cd, z_ref, w1, b1, w2, b2, wo, bo, out_ref):
    h1 = _softplus(_mm(z_ref[:], w1[:], cd) + b1[:])
    h2 = _softplus(_mm(h1, w2[:], cd) + b2[:])
    out_ref[:] = _mm(h2, wo[:], cd) + bo[:]


def _dec_bwd_kernel(
    cd, nrows, z_ref, w1, b1, w2, b2, wo, bo, dout_ref,
    dz_ref, dw1, db1, dw2, db2, dwo, dbo,
):
    z = z_ref[:]
    dout = dout_ref[:]
    if nrows % z.shape[0]:
        # Ragged last tile (see _enc_bwd_kernel).
        valid = _row_mask(z.shape[0], nrows)
        z = jnp.where(valid, z, 0.0)
        dout = jnp.where(valid, dout, 0.0)
    a1 = _mm(z, w1[:], cd) + b1[:]
    h1 = _softplus(a1)
    a2 = _mm(h1, w2[:], cd) + b2[:]
    h2 = _softplus(a2)
    dh2 = _mm_nt(dout, wo[:], cd)
    da2 = dh2 * jax.nn.sigmoid(a2)
    dh1 = _mm_nt(da2, w2[:], cd)
    da1 = dh1 * jax.nn.sigmoid(a1)
    dz_ref[:] = _mm_nt(da1, w1[:], cd)

    first = pl.program_id(0) == 0
    for ref, val in (
        (dwo, _mm_tn(h2, dout, cd)),
        (dbo, jnp.sum(dout, axis=0, keepdims=True)),
        (dw2, _mm_tn(h1, da2, cd)),
        (db2, jnp.sum(da2, axis=0, keepdims=True)),
        (dw1, _mm_tn(z, da1, cd)),
        (db1, jnp.sum(da1, axis=0, keepdims=True)),
    ):
        @pl.when(first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, val=val):
            ref[:] += val


def _dec_flat(params):
    g = params["gener"]
    return (
        g["h1"]["w"], g["h1"]["b"][None, :],
        g["h2"]["w"], g["h2"]["b"][None, :],
        g["out"]["w"], g["out"]["b"][None, :],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _decode_fused(flat, z, cd):
    return _decode_fused_fwd(flat, z, cd)[0]


def _decode_fused_fwd(flat, z, cd):
    b, n_z = z.shape
    n_out = flat[4].shape[1]
    tile = _batch_tile(b)
    out = pl.pallas_call(
        functools.partial(_dec_fwd_kernel, cd),
        grid=_grid(b, tile),
        in_specs=[_tile_spec(tile, n_z)] + _full_specs(6),
        out_specs=_tile_spec(tile, n_out),
        out_shape=_sds((b, n_out), jnp.float32, z),
        compiler_params=_fwd_compiler_params(),
        interpret=_interpret(),
    )(z, *flat)
    return out, (flat, z)


def _decode_fused_bwd(cd, res, dout):
    flat, z = res
    b, n_z = z.shape
    n_out = flat[4].shape[1]
    tile = _batch_tile(b, limit=_bwd_tile_limit(b))
    w_shapes = [_sds(w.shape, jnp.float32, z) for w in flat]
    dz, *dflat = pl.pallas_call(
        functools.partial(_dec_bwd_kernel, cd, b),
        grid=_grid(b, tile),
        in_specs=[_tile_spec(tile, n_z)] + _full_specs(6) + [_tile_spec(tile, n_out)],
        out_specs=tuple(
            [_tile_spec(tile, n_z)]
            + [pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for s in w_shapes]
        ),
        out_shape=tuple([_sds((b, n_z), jnp.float32, z)] + w_shapes),
        interpret=_interpret(),
    )(z, *flat, dout)
    return tuple(dflat), dz


_decode_fused.defvjp(_decode_fused_fwd, _decode_fused_bwd)


def decode_mlp_fused(params, z, *, compute_dtype=jnp.float32, transfer=None):
    """Drop-in for `networks.decode_mlp`, fused on TPU. softplus only."""
    if _shardmap_interpret(z):
        from vae_assoc_tpu.models import networks

        return networks.decode_mlp(
            params, z, compute_dtype=compute_dtype, transfer=jax.nn.softplus
        )
    flat = tuple(_pvary_like(_dec_flat(params), z))
    return _decode_fused(flat, z.astype(jnp.float32), jnp.dtype(compute_dtype).name)
