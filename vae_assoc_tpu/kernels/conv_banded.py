"""Banded-matmul Pallas conv kernels — the TPU-native conv formulation.

Why the im2col kernels (kernels/conv.py) lose at config-4 shapes: TPU
vector memory tiles the minor dimension to 128 lanes, so a channel-minor
[B, 28, 28, 1] block inflates 128× in VMEM (XLA reports the same layout
at "146.3× expansion"), forcing 1–4-sample batch tiles; and each of the
9 per-tap matmuls contracts over just `cin` (1–64) — a sliver of the MXU.

This module instead puts **width×channels on the lane axis** and absorbs
the entire column geometry of the convolution into a *banded weight
matrix* built (differentiably) in XLA:

    out[b, o, p·cout+co] = Σ_dy  xp[b, row(o,dy), :] @ M_dy[:, p·cout+co]
    M_dy[col·cin+ci, p·cout+co] = w[dy, dx, ci, co]   (col = col_in(p, dx))

so one 3×3 stride-2 conv = 3 MXU matmuls [tile·oh, wp·cin] @ [wp·cin, ow·cout]
— K≈512-class contractions at 100-plus-row tiles instead of 9 K=cin
slivers at 2-row tiles. A transposed conv decomposes by output-row parity
into 3 more of the same banded matmuls on the *undilated* input (even
rows sum taps dy∈{0,2}, odd rows take dy=1), interleaved afterwards — no
zero-stuffed dilation ever materializes. The row selection (stride-2
parity or contiguous) happens inside the kernel via reshape/slice; the
band structure costs redundant multiply-by-zero FLOPs (≈3–6×) which the
MXU absorbs far more cheaply than the im2col layout waste.

Gradients: the generic primitive `_banded` has a custom VJP that runs
ENTIRELY in XLA — dx-row-groups are the same banded matmuls against Mᵀ
(re-embedded into rows by pad/stack/reshape), dM is a `bok,boN->kN`
einsum per entry with the zero pad rows sliced away (`_entry_orange`).
A round-2 Pallas dM kernel was measured and removed: keeping Ms + the dM
accumulator VMEM-resident squeezed backward batch tiles to 8 rows and
starved the MXU (ledger in docs/PERF.md). The M matrices are built from
`w` by differentiable outer products against constant 0/1 band matrices
(see `_build_ms`), so `jax.grad` w.r.t. the HWIO kernel flows end-to-end
with no conv-specific gradient calculus.

Public drop-ins mirror kernels/conv.py: `conv3x3_s2`, `convt3x3_s2`,
`encode_conv_fused`, `decode_conv_fused` (parity:
tests/test_conv_banded.py; measured A/B: scripts/bench_conv.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_assoc_tpu.kernels.mlp import (
    _interpret,
    _lane,
    _mm,
    _pow2_tile,
    _pvary_like,
    _sds,
)
from vae_assoc_tpu.models.conv import (
    C2,
    IMG_SIZE,
    _FLAT,
    _SMALL,
    _dense,
    _precision,
)

_K = 3

# Edge convs (cin==1 / cout==1) CAN dispatch to the whole-geometry dense
# formulation (kernels/conv_dense.py). Measured round 3: wins in layer
# isolation (tower fwd 1.84 → 1.13 ms) but LOSES ~5% end-to-end in the
# full train step (same-process interleaved A/B: hybrid 14.48 ms vs pure
# banded 13.73 ms at batch 2048) — a context/scheduling effect the
# isolated measurement cannot see. Default off per the perf convention
# (negative results recorded in docs/PERF.md, change reverted); the knob
# stays for A/B reproduction (scripts/bench_conv_dense.py).
DENSE_EDGES = False


def _sub(n):
    return ((n + 7) // 8) * 8


# ---------------------------------------------------------------------------
# Generic banded primitive: x3 [B, h, K] × Ms [G, K, N] → OG × [B, oh, N]
# (or ONE interleaved [B, oh, OG, N] when interleave=True).
# plan: static tuple of output groups; each group a tuple of entries
# (start_row, row_stride ∈ {1,2}, m_index) — row indices into the
# row-padded [B, lo+h+hi, K] view, which is built INSIDE the kernel
# (`pad=(lo, hi)` zero rows concatenated in VMEM) so the padded copy
# never round-trips HBM: at config-4 batch 2048 the conv1 xp3
# materialization alone was ~190 MB/step (measured ledger in
# docs/PERF.md "Conv kernels").
# ---------------------------------------------------------------------------


def _select_rows(x, start, stride, oh):
    tile, hp, k = x.shape
    if stride == 2:
        v = x.reshape(tile, hp // 2, 2, k)
        rows = v[:, start // 2 : start // 2 + oh, start % 2, :]
    else:
        rows = x[:, start : start + oh, :]
    return rows.reshape(tile * oh, k)


def _pad_rows(x, pad):
    """Concatenate `pad=(lo, hi)` zero rows in VMEM (axis 1 of the tile)."""
    lo, hi = pad
    if not (lo or hi):
        return x
    tile, _, k = x.shape
    parts = []
    if lo:
        parts.append(jnp.zeros((tile, lo, k), x.dtype))
    parts.append(x)
    if hi:
        parts.append(jnp.zeros((tile, hi, k), x.dtype))
    return jnp.concatenate(parts, axis=1)


def _banded_fwd_kernel(plan, oh, cd, nrows, pad, interleave, x_ref, m_ref, *o_refs):
    x = _pad_rows(x_ref[:], pad)
    for og, entries in enumerate(plan):
        acc = None
        for start, stride, mi in entries:
            t = _mm(_select_rows(x, start, stride, oh), m_ref[mi], cd)
            acc = t if acc is None else acc + t
        out = acc.reshape(x.shape[0], oh, -1)
        if interleave:
            # Row-parity groups write their slot of ONE [tile, oh, OG, N]
            # output — the caller's reshape to [B, OG·oh, N] is then a
            # free dim-merge instead of a stack+reshape HBM copy.
            o_refs[0][:, :, og, :] = out
        else:
            o_refs[og][:] = out


def _embed_rows(contrib, start, stride, oh, hp):
    """Place [tile, oh, K] rows at absolute rows start + stride·i of a
    zero [tile, hp, K] — pure pad/stack/reshape (XLA, backward path)."""
    tile, _, k = contrib.shape
    if stride == 1:
        return jnp.pad(contrib, ((0, 0), (start, hp - start - oh), (0, 0)))
    z = jnp.zeros_like(contrib)
    pair = (contrib, z) if start % 2 == 0 else (z, contrib)
    d = jnp.stack(pair, axis=2).reshape(tile, 2 * oh, k)
    top = 2 * (start // 2)
    return jnp.pad(d, ((0, 0), (top, hp - top - 2 * oh), (0, 0)))


def _tile_for(b, hp, k, n_lanes, m_bytes, n_og, oh, extra_n=3, extra_k=2):
    """Batch tile under the scoped-VMEM limit. Live per-sample bytes:
    input block (hp rows of K lanes) + OG output blocks and ~3 matmul/acc
    temps (oh rows of N lanes) + ~2 reshaped row-selection temps (oh rows
    of K lanes); 10 MB budget leaves margin for Mosaic SSA copies."""
    per_row = 4 * (
        hp * _lane(k)
        + (n_og + extra_n) * oh * _lane(n_lanes)
        + extra_k * oh * _lane(k)
    )
    budget = 10 * 1024 * 1024 - 2 * m_bytes
    tile = max(8, min(256, budget // per_row))
    tile = (tile // 8) * 8
    if b < tile:
        # Cap at the budget tile (see mlp._batch_tile).
        return max(8, min(_pow2_tile(b), tile))
    return max(8, tile)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _banded(x3, ms, plan, oh, cd, pad=(0, 0), interleave=False):
    return _banded_fwd(x3, ms, plan, oh, cd, pad, interleave)[0]


def _banded_fwd(x3, ms, plan, oh, cd, pad, interleave):
    b, h, k = x3.shape
    hp = h + pad[0] + pad[1]
    g, _, n = ms.shape
    n_og = len(plan)
    m_bytes = 4 * g * _sub(k) * _lane(n)
    tile = _tile_for(b, hp, k, n, m_bytes, n_og, oh)
    if interleave:
        out_specs = pl.BlockSpec(
            (tile, oh, n_og, n), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = _sds((b, oh, n_og, n), jnp.float32, x3)
    else:
        out_specs = tuple(
            pl.BlockSpec((tile, oh, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in plan
        )
        out_shape = tuple(_sds((b, oh, n), jnp.float32, x3) for _ in plan)
    outs = pl.pallas_call(
        functools.partial(_banded_fwd_kernel, plan, oh, cd, b, pad, interleave),
        grid=(pl.cdiv(b, tile),),
        in_specs=[
            pl.BlockSpec((tile, h, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(x3, ms)
    if interleave:
        outs = (outs,)
    return tuple(outs), (x3, ms)


def _entry_orange(start, stride, oh, h, lo):
    """Output-row subrange [o_lo, o_hi) of an entry whose padded row
    start + stride·o maps to a REAL input row (start + stride·o − lo ∈
    [0, h)); rows outside are the zero padding and contribute nothing."""
    import math

    o_lo = max(0, math.ceil((lo - start) / stride))
    o_hi = min(oh, (lo + h - 1 - start) // stride + 1)
    return o_lo, o_hi


def _banded_bwd(plan, oh, cd, pad, interleave, res, gs):
    """Whole backward in XLA — no backward pallas_call.

    Round-2 computed dM in a Pallas kernel; the measured ledger
    (docs/PERF.md "Conv kernels") showed why that loses: Ms plus the dM
    accumulator must stay VMEM-resident across the whole grid (≈8.4 MB at
    conv1), which squeezes the batch tile to 8 rows — 256 sequential
    112-row matmuls that starve the MXU (backward measured 4.1 ms vs
    XLA conv backward 0.3 ms at batch 2048). As plain `bok,boN->kN`
    einsums XLA tiles the same contraction freely; the zero pad rows are
    *sliced away* (`_entry_orange`) instead of materialized, and the dx
    matmuls fuse with the surrounding elementwise ops.
    """
    x3, ms = res
    b, h, k = x3.shape
    lo, _ = pad
    hp = h + pad[0] + pad[1]
    n = ms.shape[2]
    prec = _precision(cd)  # single-source policy (models/networks)

    dm_parts = [None] * ms.shape[0]
    dxp = jnp.zeros((b, hp, k), x3.dtype)
    for og, entries in enumerate(plan):
        g2 = (gs[0][:, :, og, :] if interleave else gs[og]).astype(jnp.float32)
        for start, stride, mi in entries:
            # dM_mi += rows(x)ᵀ @ g over the valid output rows only.
            o_lo, o_hi = _entry_orange(start, stride, oh, h, lo)
            r0 = start + stride * o_lo - lo
            # limit clamps to h: the last used index r0 + stride·(cnt−1)
            # is < h by construction, so the clamp never drops a row.
            xrows = jax.lax.slice_in_dim(
                x3, r0, min(h, r0 + stride * (o_hi - o_lo)), stride=stride,
                axis=1,
            )
            contrib_m = jnp.einsum(
                "bok,boN->kN", xrows, g2[:, o_lo:o_hi, :], precision=prec,
                preferred_element_type=jnp.float32,
            )
            dm_parts[mi] = (
                contrib_m if dm_parts[mi] is None else dm_parts[mi] + contrib_m
            )
            # dx: the same banded matmul against Mᵀ, re-embedded into rows.
            contrib_x = jnp.einsum(
                "boN,kN->bok", g2, ms[mi], precision=prec,
                preferred_element_type=jnp.float32,
            )
            dxp = dxp + _embed_rows(contrib_x, start, stride, oh, hp)
    assert all(p is not None for p in dm_parts)  # both plans use every M_dy
    dm = jnp.stack(dm_parts)
    dx = dxp[:, lo : lo + h, :] if (pad[0] or pad[1]) else dxp
    return dx, dm


_banded.defvjp(_banded_fwd, _banded_bwd)


# ---------------------------------------------------------------------------
# Differentiable banded-matrix builders (outer products vs constant bands)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _band_mats_s2(w_img, ow):
    """Constant 0/1 band matrices B_dx [w_img, ow]: B[2p+dx, p] = 1.

    Taps falling on the right zero-pad column (2p+dx >= w_img) are simply
    absent -- equivalent to SAME's (0, 1) column padding with nothing
    materialized.

    Returns NUMPY arrays: the lru_cache must never hold jnp values — a
    first call inside a jit trace would cache that trace's tracers and
    poison every later trace (UnexpectedTracerError; order-dependent).
    jnp conversion happens at use as a per-trace constant (tiny)."""
    bs = []
    for dx in range(_K):
        b = np.zeros((w_img, ow), np.float32)
        for p in range(ow):
            col = 2 * p + dx
            if col < w_img:
                b[col, p] = 1.0
        bs.append(b)
    return tuple(bs)


@functools.lru_cache(maxsize=32)
def _band_mats_t2(w_img):
    """Band matrices for a stride-2 SAME transposed conv on pre-padded
    cols (wp = w_img + 2): output col p takes tap dx when (p + dx) is
    even, from padded input col (p + dx - 2)/2 + 1. Returns NUMPY arrays —
    see _band_mats_s2 on why the cache must never hold jnp values."""
    ow = 2 * w_img
    bs = []
    for dx in range(_K):
        b = np.zeros((w_img + 2, ow), np.float32)
        for p in range(ow):
            if (p + dx) % 2:
                continue
            col = (p + dx - 2) // 2 + 1
            if 0 <= col < w_img + 2:
                b[col, p] = 1.0
        bs.append(b)
    return tuple(bs)


def _build_ms(w_hwio, band_mats, cin, cout):
    """All three banded matrices M_dy = Σ_dx B_dx ⊗ w[dy, dx] in ONE
    einsum: [3, ncols·cin, ow·cout] — outer products against constant 0/1
    band matrices, so `jax.grad` w.r.t. the HWIO kernel differentiates to
    another einsum (dw is matmul-fast). Measured alternatives: a
    scatter-add build cost ~1 ms/conv on TPU — 3× the matmul kernel
    itself — and its autodiff emitted gathers; building the three M_dy as
    9 separate per-dy outer-product launches measured the same ~0.6
    ms/step (launch-overhead-, not FLOP-, dominated — docs/PERF.md), so
    the single-op form is kept for the smaller HLO."""
    bands = jnp.stack([jnp.asarray(b) for b in band_mats])  # [3dx, ncols, ow]
    # precision=HIGHEST is load-bearing: this einsum only *places* weights
    # (one operand is exactly 0/1), but at DEFAULT the TPU MXU runs a
    # single bf16 pass, so every conv weight entered M rounded to bf16 —
    # measured 7-10x accuracy loss vs the XLA conv path against a float64
    # oracle (mu maxabs 1.4e-3 vs 1.9e-4 at fp32; 2026-08-19). HIGHEST
    # makes the placement bit-exact; the build is launch-bound, not
    # FLOP-bound, so the extra passes are free at this size.
    ms = jnp.einsum(
        "xcp,yxio->ycipo", bands, w_hwio,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    ncols, ow = band_mats[0].shape
    return ms.reshape(_K, ncols * cin, ow * cout)


# ---------------------------------------------------------------------------
# Layer ops (drop-ins for kernels/conv.py)
# ---------------------------------------------------------------------------


def conv3x3_s2(x, w_hwio, b, *, compute_dtype=jnp.float32):
    """SAME strided conv; matches lax.conv_general_dilated s2 (NHWC/HWIO).

    cin == 1 dispatches to the whole-geometry dense formulation
    (kernels/conv_dense.py): a 1-channel input leaves K = w lanes of a
    128-lane tile — MXU-hostile in any channels-on-lanes formulation —
    while the single dense matmul's ~40× FLOP balloon is still tiny for
    the MXU and fuses with neighbors (measured: scripts/bench_conv_dense.py).
    """
    bsz, h, w_img, cin = x.shape
    if cin == 1 and DENSE_EDGES:
        from vae_assoc_tpu.kernels.conv_dense import conv3x3_s2_dense

        return conv3x3_s2_dense(x, w_hwio, b, compute_dtype=compute_dtype)
    from vae_assoc_tpu.kernels.mlp import _shardmap_interpret

    # Evenness check BEFORE the interpret/shard_map fallback: for odd h the
    # lax fallback would silently return ceil-semantics rows on CPU while
    # the banded formulation raises on TPU — same inputs must behave
    # identically in every mode (mirrors kernels/conv.py's ordering).
    if h % 2 or w_img % 2:
        raise ValueError(
            f"conv3x3_s2 requires even spatial dims, got {(h, w_img)}"
        )
    if _shardmap_interpret(x):
        import jax.lax as lax

        from vae_assoc_tpu.models.conv import _DN

        return lax.conv_general_dilated(
            x, w_hwio, (2, 2), "SAME", dimension_numbers=_DN,
            precision=_precision(compute_dtype),
        ) + b
    cout = w_hwio.shape[3]
    oh = ow = h // 2
    # Rows logically pad (0,2) — row index 2o+dy ≤ h+1, and hp even for
    # parity — but the padded copy is built INSIDE the kernel (pad=(0,2)),
    # so the [B, hp, K] array never materializes in HBM; the reshape below
    # is a free dim-merge.
    x3 = x.reshape(bsz, h, w_img * cin)
    bands = _band_mats_s2(w_img, ow)
    ms = _build_ms(w_hwio, bands, cin, cout)
    plan = (((0, 2, 0), (1, 2, 1), (2, 2, 2)),)
    (ms,) = _pvary_like([ms], x3)
    (out,) = _banded(x3, ms, plan, oh, jnp.dtype(compute_dtype).name, (0, 2))
    return out.reshape(bsz, oh, ow, cout) + b


def convt3x3_s2(x, w_hwio, b, *, compute_dtype=jnp.float32):
    """SAME transposed conv; matches lax.conv_transpose s2 (NHWC/HWIO).

    Output-row-parity decomposition on the undilated input: even output
    rows 2q sum taps dy∈{0,2} over input rows (q, q+1); odd rows 2q+1
    take dy=1 at input row q+1 (rows pre-padded by (1,1)).

    cout == 1 dispatches to the whole-geometry dense formulation — the
    1-channel output side is the mirror of conv3x3_s2's cin == 1 case
    (measured: scripts/bench_conv_dense.py).
    """
    if w_hwio.shape[3] == 1 and DENSE_EDGES:
        from vae_assoc_tpu.kernels.conv_dense import convt3x3_s2_dense

        return convt3x3_s2_dense(x, w_hwio, b, compute_dtype=compute_dtype)
    from vae_assoc_tpu.kernels.mlp import _shardmap_interpret

    if _shardmap_interpret(x):
        import jax.lax as lax

        from vae_assoc_tpu.models.conv import _DN

        return lax.conv_transpose(
            x, w_hwio, (2, 2), "SAME", dimension_numbers=_DN,
            precision=_precision(compute_dtype),
        ) + b
    bsz, h, w_img, cin = x.shape
    cout = w_hwio.shape[3]
    oh_total = 2 * h
    # The (1,1) column padding is absorbed into the BAND MATRICES instead of
    # the input: the padded columns contribute 0 · M[pad rows], so slicing
    # those cin-row blocks off Ms is exactly equivalent — and the padded
    # [B, h, (w+2)·cin] copy (convt1 ~33 MB, convt2 ~58 MB per step at
    # batch 2048) never materializes in HBM, K shrinks by 2·cin, and the
    # backward's dx comes out unpadded for free (round 4; rows still pad
    # (1,1) inside the kernel).
    x3 = x.reshape(bsz, h, w_img * cin)
    bands = _band_mats_t2(w_img)
    ms = _build_ms(w_hwio, bands, cin, cout)[:, cin : (w_img + 1) * cin, :]
    # Groups: even rows (dy 0 at rows q, dy 2 at rows q+1), odd rows (dy 1
    # at rows q+1); all stride-1 contiguous row slices of length h.
    # interleave=True: the kernel writes both parity groups into ONE
    # [B, h, 2, nn] output, so the row interleave below is a free
    # dim-merge instead of a stack+reshape HBM copy (~205 MB/step for
    # convt1 at batch 2048 — measured ledger in docs/PERF.md).
    plan = (((0, 1, 0), (1, 1, 2)), ((1, 1, 1),))
    (ms,) = _pvary_like([ms], x3)
    (out,) = _banded(
        x3, ms, plan, h, jnp.dtype(compute_dtype).name, (1, 1), True
    )
    return out.reshape(bsz, oh_total, 2 * w_img, cout) + b


from vae_assoc_tpu.kernels.conv import make_conv_tower

# The tower wiring lives once in kernels/conv.make_conv_tower; this pair
# is the banded-kernel instantiation (models/vae.py's "conv_pallas" path).
encode_conv_fused, decode_conv_fused = make_conv_tower(conv3x3_s2, convt3x3_s2)
