"""Fused Pallas TPU kernels for the VAE's MLP encoder/decoder stacks.

The north star mandates the per-modality encoder/decoder MLPs execute as
fused kernels (BASELINE.json:5 "fused Pallas/XLA kernels"). Each kernel
runs a whole recognition (x → h1 → … → hL → μ, logσ²) or generator
(z → h1 → … → hL → out) stack in one `pallas_call`. Depth is read from
the param tree and unrolled at trace time — the reference's depth-2 arch
emits exactly the original fixed-depth kernel; deeper arch dicts
(configs: n_hidden_recog_3, …) get proportionally deeper kernels with a
VMEM-aware batch-tile backoff (`_stack_tile_cap`). Structure:

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
    pallas_call). The invariant→varying cast's transpose is `psum`, so
    applying it *outside* the kernels' custom_vjp also makes the
    weight-grad cotangents come back globally reduced with no hand-written
    collective. (`jax.lax.pcast(..., to="varying")` — the successor of the
    deprecated `jax.lax.pvary`.)"""
    want = jax.typeof(like).vma
    if not want:
        return list(arrs)
    out = []
    for a in arrs:
        missing = tuple(want - jax.typeof(a).vma)
        out.append(jax.lax.pcast(a, missing, to="varying") if missing else a)
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


def _flat_vmem_bytes(flat) -> int:
    """VMEM footprint of a flat weight tuple: fp32, sublane dim padded to 8,
    lane dim padded to 128 (the TPU vector-memory tiling)."""
    tot = 0
    for a in flat:
        rows = a.shape[0] if a.ndim == 2 else 1
        tot += 4 * max(8, ((rows + 7) // 8) * 8) * _lane(a.shape[-1])
    return tot


_VMEM_DEFAULT = 16 * 1024 * 1024
"""Mosaic's default scoped-VMEM limit. The reference-scale depth-2 kernels
are empirically calibrated to compile under it (docs/PERF.md tiles); deeper
stacks request a higher limit (`_stack_vmem_request`) — v5e cores have
128 MiB of physical VMEM, 16 MiB is only the compiler default."""

_VMEM_BUDGET = 28 * 1024 * 1024
"""Planning budget for `_stack_tile_cap`: the largest *estimated* footprint
a fused stack kernel may plan for. Kept well under `_VMEM_REQUEST_MAX` /
the 1.75x request margin so the raised limit always covers Mosaic's real
allocation (measured 1.21x over the estimate on a depth-4 decode bwd —
SSA copies + double-buffered tiled IO the estimate doesn't model)."""

_VMEM_REQUEST_MAX = 64 * 1024 * 1024


def _stack_tile_cap(flat, act_lanes: int, *, accum: bool) -> int:
    """Depth/width-aware batch-tile cap for the fused stack kernels.

    The kernels keep ALL layer weights (plus, in the backward, their grad
    accumulators) resident in VMEM across the grid; what scales with the
    batch tile is the per-row live set (input, pre-activations +
    activations per hidden layer, head cotangents — `act_lanes` lanes,
    doubled in the backward for the cotangent chain). This cap bounds
    tile·rows so weights + live rows fit `_VMEM_BUDGET`; kernels whose
    estimate exceeds Mosaic's default scoped limit request a raised
    `vmem_limit_bytes` (`_stack_vmem_request`). The reference-scale
    depth-2 towers keep their empirically validated tiles (256 forward,
    256/128 backward — docs/PERF.md, enforced by the 256 caps at the call
    sites); deeper or wider arch dicts back off instead of overflowing.

    Returns 0 when even the minimum 8-row tile cannot fit — i.e. the
    weights (+ grad accumulators) alone overflow the budget, where no
    batch-tile backoff helps. The public wrappers treat 0 as "route to the
    XLA path", which tiles large matmuls natively; without that gate a
    wide/deep arch would pass CPU interpret tests and then Mosaic-OOM on
    real TPU."""
    weight_bytes = _flat_vmem_bytes(flat) * (2 if accum else 1)
    budget = _VMEM_BUDGET - weight_bytes
    per_row = 4 * act_lanes * (2 if accum else 1)
    if budget <= per_row * 8:
        return 0
    return max(8, (budget // per_row) // 8 * 8)


def _stack_vmem_request(flat, act_lanes: int, tile: int, *, accum: bool):
    """`vmem_limit_bytes` for one stack kernel, or None for Mosaic's default.

    The estimate mirrors `_stack_tile_cap` (resident weights, grad
    accumulators, per-row live set at the chosen tile). Mosaic's true scoped
    allocation runs over the estimate (measured 1.21x on the depth-4x512
    decode backward: 19.29 MiB actual vs 15.96 MiB planned) — SSA copies and
    double-buffered tiled IO the plan doesn't model — so the request carries
    a 1.75x margin. Estimates that fit the default limit return None: the
    reference-calibrated depth-2 kernels keep their exact known-good
    default-limit compilation."""
    scale = 2 if accum else 1
    est = _flat_vmem_bytes(flat) * scale + tile * 4 * act_lanes * scale
    if est <= _VMEM_DEFAULT * 31 // 32:
        return None
    return min(_VMEM_REQUEST_MAX, int(est * 1.75))


def _stack_vmem_ok(flat, heads: int) -> bool:
    """Whether the fused stack kernels can run this weight tuple at all:
    the BACKWARD footprint (weights + grad accumulators + one 8-row tile's
    live set) must fit VMEM. Gating forward and backward together keeps one
    consistent route per architecture — a custom_vjp whose forward ran as a
    kernel but whose backward cannot would OOM mid-step."""
    nh = (len(flat) - 2 * heads) // 2
    lanes = _stack_act_lanes(
        flat[0].shape[0], flat[: 2 * nh : 2], flat[-2].shape[1], heads=heads
    )
    return _stack_tile_cap(flat, lanes, accum=True) > 0


def _stack_act_lanes(n_first: int, hidden_ws, n_last: int, heads: int) -> int:
    """Per-row activation lanes of one fused stack: input (+ its grad slot),
    one pre-activation + one activation per hidden layer, `heads` output
    vectors of width n_last."""
    lanes = 2 * _lane(n_first)
    for w in hidden_ws:
        lanes += 2 * _lane(w.shape[1])
    return lanes + heads * _lane(n_last)


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
# Encoder: x → [softplus(·@w_i+b_i)]×L → (μ, logσ²)
# Depth-generic: the number of hidden layers is read from the param tree
# (contiguous h1..hL keys) and baked in statically — the Python loops below
# unroll at trace time, so depth 2 emits exactly the original kernel.
# ---------------------------------------------------------------------------


def _accumulate(updates):
    """Write-or-accumulate weight-grad tiles: initialize on the first grid
    step, add on every later one (the grads sum over batch tiles)."""
    first = pl.program_id(0) == 0
    for ref, val in updates:
        @pl.when(first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, val=val):
            ref[:] += val


def _enc_fwd_kernel(cd, nh, x_ref, *refs):
    hw = refs[: 2 * nh]
    wm, bm, wl, bl, mu_ref, lv_ref = refs[2 * nh :]
    h = x_ref[:]
    for i in range(nh):
        h = _softplus(_mm(h, hw[2 * i][:], cd) + hw[2 * i + 1][:])
    mu_ref[:] = _mm(h, wm[:], cd) + bm[:]
    lv_ref[:] = _mm(h, wl[:], cd) + bl[:]


def _enc_bwd_kernel(cd, nh, nrows, x_ref, *refs):
    hw = refs[: 2 * nh]
    wm, bm, wl, bl, dmu_ref, dlv_ref, dx_ref = refs[2 * nh : 2 * nh + 7]
    grad_refs = refs[2 * nh + 7 :]  # (dw,db)*nh, dwm,dbm,dwl,dbl
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
    acts = [x]  # acts[i] = input to hidden layer i; acts[nh] = head input
    pres = []
    for i in range(nh):
        a = _mm(acts[-1], hw[2 * i][:], cd) + hw[2 * i + 1][:]
        pres.append(a)
        acts.append(_softplus(a))
    # Head grads + fan-in; transposed operands go to the MXU via
    # dot_general dimension numbers (no VMEM transpose materialized).
    dh = _mm_nt(dmu, wm[:], cd) + _mm_nt(dlv, wl[:], cd)
    updates = [
        (grad_refs[2 * nh], _mm_tn(acts[nh], dmu, cd)),
        (grad_refs[2 * nh + 1], jnp.sum(dmu, axis=0, keepdims=True)),
        (grad_refs[2 * nh + 2], _mm_tn(acts[nh], dlv, cd)),
        (grad_refs[2 * nh + 3], jnp.sum(dlv, axis=0, keepdims=True)),
    ]
    for i in reversed(range(nh)):
        da = dh * jax.nn.sigmoid(pres[i])  # softplus' = sigmoid
        updates.append((grad_refs[2 * i], _mm_tn(acts[i], da, cd)))
        updates.append((grad_refs[2 * i + 1], jnp.sum(da, axis=0, keepdims=True)))
        dh = _mm_nt(da, hw[2 * i][:], cd)
    dx_ref[:] = dh
    _accumulate(updates)


def _enc_flat(params):
    from vae_assoc_tpu.models.networks import hidden_layers

    r = params["recog"]
    flat = []
    for layer in hidden_layers(r):
        flat += [layer["w"], layer["b"][None, :]]
    flat += [
        r["out_mean"]["w"], r["out_mean"]["b"][None, :],
        r["out_logvar"]["w"], r["out_logvar"]["b"][None, :],
    ]
    return tuple(flat)


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


def _stack_compiler_params(flat, act_lanes: int, tile: int, *, accum: bool):
    """Compiler params for one fused stack kernel: the forward 'parallel'
    grid declaration plus, for deep/wide stacks whose footprint exceeds
    Mosaic's default scoped-VMEM limit, a raised `vmem_limit_bytes`
    (`_stack_vmem_request`)."""
    base = None if accum else _fwd_compiler_params()
    if _interpret():
        return base
    req = _stack_vmem_request(flat, act_lanes, tile, accum=accum)
    if req is None:
        return base
    if base is None:
        return pltpu.CompilerParams(vmem_limit_bytes=req)
    return pltpu.CompilerParams(
        dimension_semantics=base.dimension_semantics, vmem_limit_bytes=req
    )


def _tile_spec(tile, ncols):
    return pl.BlockSpec((tile, ncols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _encode_fused(flat, x, cd):
    return _encode_fused_fwd(flat, x, cd)[0]


def _encode_fused_fwd(flat, x, cd):
    b, n_in = x.shape
    nh = (len(flat) - 4) // 2
    n_z = flat[-4].shape[1]
    lanes = _stack_act_lanes(n_in, flat[: 2 * nh : 2], n_z, heads=2)
    tile = _batch_tile(b, limit=min(256, _stack_tile_cap(flat, lanes, accum=False)))
    mu, lv = pl.pallas_call(
        functools.partial(_enc_fwd_kernel, cd, nh),
        grid=_grid(b, tile),
        in_specs=[_tile_spec(tile, n_in)] + _full_specs(len(flat)),
        out_specs=(_tile_spec(tile, n_z), _tile_spec(tile, n_z)),
        out_shape=(
            _sds((b, n_z), jnp.float32, x),
            _sds((b, n_z), jnp.float32, x),
        ),
        compiler_params=_stack_compiler_params(flat, lanes, tile, accum=False),
        interpret=_interpret(),
    )(x, *flat)
    return (mu, lv), (flat, x)


def _encode_fused_bwd(cd, res, cts):
    flat, x = res
    dmu, dlv = cts
    b, n_in = x.shape
    nh = (len(flat) - 4) // 2
    n_z = flat[-4].shape[1]
    lanes = _stack_act_lanes(n_in, flat[: 2 * nh : 2], n_z, heads=2)
    cap = _stack_tile_cap(flat, lanes, accum=True)
    tile = _batch_tile(b, limit=min(_bwd_tile_limit(b), cap))
    w_shapes = [_sds(w.shape, jnp.float32, x) for w in flat]
    dx, *dflat = pl.pallas_call(
        functools.partial(_enc_bwd_kernel, cd, nh, b),
        grid=_grid(b, tile),
        in_specs=[_tile_spec(tile, n_in)]
        + _full_specs(len(flat))
        + [_tile_spec(tile, n_z), _tile_spec(tile, n_z)],
        out_specs=tuple(
            [_tile_spec(tile, n_in)]
            + [pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for s in w_shapes]
        ),
        out_shape=tuple([_sds((b, n_in), jnp.float32, x)] + w_shapes),
        compiler_params=_stack_compiler_params(flat, lanes, tile, accum=True),
        interpret=_interpret(),
    )(x, *flat, dmu, dlv)
    return tuple(dflat), dx


_encode_fused.defvjp(_encode_fused_fwd, _encode_fused_bwd)


def encode_mlp_fused(params, x, *, compute_dtype=jnp.float32, transfer=None):
    """Drop-in for `networks.encode_mlp`, fused on TPU. softplus only.

    Architectures whose weights cannot stay VMEM-resident (`_stack_vmem_ok`)
    route to the identical-math XLA path — decided here in the plain
    wrapper, never inside the custom_vjp (jax.grad bypasses primal gates,
    CLAUDE.md), and identically in every mode so CPU tests match TPU."""
    if _shardmap_interpret(x) or not _stack_vmem_ok(_enc_flat(params), heads=2):
        from vae_assoc_tpu.models import networks

        return networks.encode_mlp(
            params, x, compute_dtype=compute_dtype, transfer=jax.nn.softplus
        )
    flat = tuple(_pvary_like(_enc_flat(params), x))
    mu, lv = _encode_fused(flat, x.astype(jnp.float32), jnp.dtype(compute_dtype).name)
    return mu, lv


# ---------------------------------------------------------------------------
# Decoder: z → [softplus(·@w_i+b_i)]×L → out (linear). Depth-generic like
# the encoder above.
# ---------------------------------------------------------------------------


def _dec_fwd_kernel(cd, nh, z_ref, *refs):
    hw = refs[: 2 * nh]
    wo, bo, out_ref = refs[2 * nh :]
    h = z_ref[:]
    for i in range(nh):
        h = _softplus(_mm(h, hw[2 * i][:], cd) + hw[2 * i + 1][:])
    out_ref[:] = _mm(h, wo[:], cd) + bo[:]


def _dec_bwd_kernel(cd, nh, nrows, z_ref, *refs):
    hw = refs[: 2 * nh]
    wo, bo, dout_ref, dz_ref = refs[2 * nh : 2 * nh + 4]
    grad_refs = refs[2 * nh + 4 :]  # (dw,db)*nh, dwo,dbo
    z = z_ref[:]
    dout = dout_ref[:]
    if nrows % z.shape[0]:
        # Ragged last tile (see _enc_bwd_kernel).
        valid = _row_mask(z.shape[0], nrows)
        z = jnp.where(valid, z, 0.0)
        dout = jnp.where(valid, dout, 0.0)
    acts = [z]
    pres = []
    for i in range(nh):
        a = _mm(acts[-1], hw[2 * i][:], cd) + hw[2 * i + 1][:]
        pres.append(a)
        acts.append(_softplus(a))
    dh = _mm_nt(dout, wo[:], cd)
    updates = [
        (grad_refs[2 * nh], _mm_tn(acts[nh], dout, cd)),
        (grad_refs[2 * nh + 1], jnp.sum(dout, axis=0, keepdims=True)),
    ]
    for i in reversed(range(nh)):
        da = dh * jax.nn.sigmoid(pres[i])
        updates.append((grad_refs[2 * i], _mm_tn(acts[i], da, cd)))
        updates.append((grad_refs[2 * i + 1], jnp.sum(da, axis=0, keepdims=True)))
        dh = _mm_nt(da, hw[2 * i][:], cd)
    dz_ref[:] = dh
    _accumulate(updates)


def _dec_flat(params):
    from vae_assoc_tpu.models.networks import hidden_layers

    g = params["gener"]
    flat = []
    for layer in hidden_layers(g):
        flat += [layer["w"], layer["b"][None, :]]
    flat += [g["out"]["w"], g["out"]["b"][None, :]]
    return tuple(flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _decode_fused(flat, z, cd):
    return _decode_fused_fwd(flat, z, cd)[0]


def _decode_fused_fwd(flat, z, cd):
    b, n_z = z.shape
    nh = (len(flat) - 2) // 2
    n_out = flat[-2].shape[1]
    lanes = _stack_act_lanes(n_z, flat[: 2 * nh : 2], n_out, heads=1)
    tile = _batch_tile(b, limit=min(256, _stack_tile_cap(flat, lanes, accum=False)))
    out = pl.pallas_call(
        functools.partial(_dec_fwd_kernel, cd, nh),
        grid=_grid(b, tile),
        in_specs=[_tile_spec(tile, n_z)] + _full_specs(len(flat)),
        out_specs=_tile_spec(tile, n_out),
        out_shape=_sds((b, n_out), jnp.float32, z),
        compiler_params=_stack_compiler_params(flat, lanes, tile, accum=False),
        interpret=_interpret(),
    )(z, *flat)
    return out, (flat, z)


def _decode_fused_bwd(cd, res, dout):
    flat, z = res
    b, n_z = z.shape
    nh = (len(flat) - 2) // 2
    n_out = flat[-2].shape[1]
    lanes = _stack_act_lanes(n_z, flat[: 2 * nh : 2], n_out, heads=1)
    cap = _stack_tile_cap(flat, lanes, accum=True)
    tile = _batch_tile(b, limit=min(_bwd_tile_limit(b), cap))
    w_shapes = [_sds(w.shape, jnp.float32, z) for w in flat]
    dz, *dflat = pl.pallas_call(
        functools.partial(_dec_bwd_kernel, cd, nh, b),
        grid=_grid(b, tile),
        in_specs=[_tile_spec(tile, n_z)]
        + _full_specs(len(flat))
        + [_tile_spec(tile, n_out)],
        out_specs=tuple(
            [_tile_spec(tile, n_z)]
            + [pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for s in w_shapes]
        ),
        out_shape=tuple([_sds((b, n_z), jnp.float32, z)] + w_shapes),
        compiler_params=_stack_compiler_params(flat, lanes, tile, accum=True),
        interpret=_interpret(),
    )(z, *flat, dout)
    return tuple(dflat), dz


_decode_fused.defvjp(_decode_fused_fwd, _decode_fused_bwd)


def decode_mlp_fused(params, z, *, compute_dtype=jnp.float32, transfer=None):
    """Drop-in for `networks.decode_mlp`, fused on TPU. softplus only.
    VMEM-overflow architectures route to XLA — see encode_mlp_fused."""
    if _shardmap_interpret(z) or not _stack_vmem_ok(_dec_flat(params), heads=1):
        from vae_assoc_tpu.models import networks

        return networks.decode_mlp(
            params, z, compute_dtype=compute_dtype, transfer=jax.nn.softplus
        )
    flat = tuple(_pvary_like(_dec_flat(params), z))
    return _decode_fused(flat, z.astype(jnp.float32), jnp.dtype(compute_dtype).name)
