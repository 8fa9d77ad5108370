"""Per-modality VAE tower megakernel: encoder → sampler → decoder →
per-sample loss terms in ONE forward `pallas_call`, with a split fused
backward.

Motivation (VERDICT round 1, "remaining headroom"): with the composable
kernels (kernels/mlp.py + sampling.py + loss.py) each train step launches
~7 kernels per modality-pair and the decoder output x̂ — the widest
activation, [B, 784] for images — round-trips HBM five times per step
(decoder write, loss read, loss-grad write, decoder-backward read, plus
the forward's saved residual). This tower keeps x̂ and every hidden
activation entirely in VMEM: per tile the only HBM traffic is x in and
(μ, logσ², ε, recon_term, kl_term) out — the widest output is n_z columns.

Backward is deliberately NOT one kernel: enc+dec weights *plus* their
grad accumulators (~11.7 MB at the reference image arch) would leave VMEM
room for only ~16-row batch tiles, starving the MXU (measured reasoning in
docs/PERF.md). Instead:

  1. a fused decoder+loss backward kernel (decoder weights + accumulators
     only): rematerializes g1, g2, x̂ from z, forms the loss gradient
     in-register, and emits dz + all decoder weight grads;
  2. elementwise reparameterization/KL glue in XLA ([B, n_z] — trivial);
  3. the existing fused encoder backward (kernels/mlp.py).

Scope: this is the *training step's internal engine* (``use_pallas="mega"``),
NOT a public composable op. Its VJP returns a zero cotangent for x under a
documented closed-world invariant: the train step differentiates w.r.t.
params only (train/step.py, jax.grad argnums=0), so dx is provably never
consumed. Input-optimization users must use the composable kernels
(``use_pallas=True``), whose loss VJP emits the true dx.

Conditional towers (round 4): the cond one-hot widens the encoder input at
the call boundary exactly like models/vae.vae_forward; the kernel derives
n_cond from the decoder weight's row count, re-reads the cond columns at
the decoder's in-kernel concat point, and compares the loss against the
data columns only — the kernel stays width-agnostic, so `use_pallas="mega"`
keeps its speed on `--conditional` runs (parity:
tests/test_conditional.py::test_mega_conditional_parity).

Loss formulation matches ops/losses.py's default (stable logit-space CE
for Bernoulli, SSE for Gaussian, closed-form KL) — parity and gradient
equality vs the jnp path asserted in tests/test_megakernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_assoc_tpu.kernels.mlp import (
    _encode_fused_bwd,
    _full_specs,
    _fwd_compiler_params,
    _lane,
    _pow2_tile,
    _pvary_like,
    _sds,
    _shardmap_interpret,
    _grid,
    _interpret,
    _mm,
    _mm_nt,
    _mm_tn,
    _row_mask,
    _softplus,
    _tile_spec as _row_spec,
)
from vae_assoc_tpu.kernels.sampling import (
    SEED_TILE_HASH,
    _normal_bits,
    fold_key_to_seed,
)


def _rowsum(x):
    return jnp.sum(x, axis=-1, keepdims=True)


_VMEM_DEFAULT_BUDGET = 13 * 1024 * 1024
"""Planning budget under Mosaic's default 16 MiB scoped limit (margin for
SSA copies) — the reference-scale towers keep their measured tiles here."""

_VMEM_PLAN_MAX = 56 * 1024 * 1024
"""Largest planned footprint when the default budget cannot hold the
resident weights: the request carries mlp.py's measured 1.75× margin, so
56 MiB plans request ≤ ~98 MiB — under v5e's 128 MiB physical VMEM."""

_VMEM_REQUEST_MAX = 100 * 1024 * 1024


def _plan_tile(b: int, weight_bytes: int, widest: int, n_live: int):
    """(batch tile, vmem_limit_bytes request or None) for one tower kernel.

    Mirrors kernels/mlp.py's stack planner (round 5 — previously a wide
    tower silently planned tile=8 against a blown budget and Mosaic
    aborted with a scoped-VMEM OOM at compile time): if weights + an
    8-row live set fit the default budget, keep the measured default-limit
    tiles; else re-plan under `_VMEM_PLAN_MAX` with a raised
    `vmem_limit_bytes`; else return tile 0 — the config-level gate
    (`tower_vmem_reason` via `mega_fallback_reason`) routes such towers to
    the composable kernels, which have their own feasibility chain."""
    per_row = 4 * n_live * _lane(widest)

    def tile_under(budget):
        tile = max(8, min(256, budget // per_row))
        tile = (tile // 8) * 8
        if b < tile:
            # Cap at the budget tile: rounding b up to a power of two
            # could otherwise exceed what the VMEM budget allows by ~2x.
            return max(8, min(_pow2_tile(b), tile))
        return max(8, tile)

    budget = _VMEM_DEFAULT_BUDGET - weight_bytes
    if budget >= 8 * per_row:
        return tile_under(budget), None
    budget = _VMEM_PLAN_MAX - weight_bytes
    if budget < 8 * per_row:
        return 0, None
    tile = tile_under(budget)
    est = weight_bytes + tile * per_row
    return tile, min(_VMEM_REQUEST_MAX, int(est * 1.75))


def _mega_compiler_params(base, vmem_request):
    """Merge a raised vmem_limit_bytes into the (possibly None) base
    CompilerParams; interpret mode takes neither."""
    if _interpret() or vmem_request is None:
        return base
    if base is None:
        return pltpu.CompilerParams(vmem_limit_bytes=vmem_request)
    return pltpu.CompilerParams(
        dimension_semantics=base.dimension_semantics,
        vmem_limit_bytes=vmem_request,
    )


def tower_vmem_reason(arch: dict, n_cond: int = 0):
    """None when the fused tower fits the VMEM plan end-to-end for this
    arch dict, else a reason string (`models.assoc.mega_fallback_reason`
    gates on it). Checks the forward (whole tower resident), the backward
    stage 1 (decoder weights + grad accumulators), AND the encoder-stack
    backward's own planner (kernels/mlp.py `_stack_vmem_ok`) — a forward
    that compiles but a backward that cannot would OOM mid-step."""
    from vae_assoc_tpu.kernels import mlp as kmlp

    n_in = arch["n_input"] + n_cond
    n_z = arch["n_z"]
    h1e, h2e = arch["n_hidden_recog_1"], arch["n_hidden_recog_2"]
    h1d, h2d = arch["n_hidden_gener_1"], arch["n_hidden_gener_2"]
    widths = (n_in, h1e, h2e, n_z, h1d, h2d, arch["n_input"])
    if _plan_tile(8, _weight_bytes(widths), max(widths), n_live=8)[0] == 0:
        return (
            f"tower weights (~{_weight_bytes(widths) >> 20} MiB resident) "
            "exceed the megakernel's VMEM plan"
        )
    dec_widths = (n_z + n_cond, h1d, h2d, arch["n_input"])
    if _plan_tile(
        8, 2 * _weight_bytes(dec_widths), max(dec_widths), n_live=10
    )[0] == 0:
        return (
            "decoder weights + grad accumulators exceed the megakernel's "
            "backward VMEM plan"
        )
    sd = lambda r, c: jax.ShapeDtypeStruct((r, c), jnp.float32)
    bias = lambda c: jax.ShapeDtypeStruct((c,), jnp.float32)
    enc_flat = (
        sd(n_in, h1e), bias(h1e), sd(h1e, h2e), bias(h2e),
        sd(h2e, n_z), bias(n_z), sd(h2e, n_z), bias(n_z),
    )
    if not kmlp._stack_vmem_ok(enc_flat, heads=2):
        return (
            "the encoder-stack backward exceeds the fused-kernel VMEM "
            "budget (kernels/mlp.py)"
        )
    return None


def _weight_bytes(widths) -> int:
    lanes = [_lane(w) for w in widths]
    return 4 * sum(a * b for a, b in zip(lanes[:-1], lanes[1:]))


# ---------------------------------------------------------------------------
# Forward: x → enc → ε/z → dec → per-sample (recon, kl); x̂ never leaves VMEM
# ---------------------------------------------------------------------------


def _fwd_kernel(cd, kind, nrows, seeded, n_cond, *refs):
    (x_ref, w1, b1, w2, b2, wm, bm, wl, bl, d1, c1, d2, c2, do, co,
     eps_or_seed, mu_ref, lv_ref, eps_ref, rec_ref, kl_ref) = refs
    # Conditional towers (n_cond > 0): x_ref is the WIDENED encoder input
    # [tile, n_x + n_cond] (cond one-hot concatenated at the call boundary,
    # models/vae.vae_forward's convention) — the encoder consumes it whole,
    # the decoder re-reads the cond columns for its own concat, and the
    # loss compares against the data columns only.
    x = x_ref[:]
    h1 = _softplus(_mm(x, w1[:], cd) + b1[:])
    h2 = _softplus(_mm(h1, w2[:], cd) + b2[:])
    mu = _mm(h2, wm[:], cd) + bm[:]
    lv = _mm(h2, wl[:], cd) + bl[:]
    if seeded:
        # On-core PRNG; per-tile seed decorrelation as in kernels/sampling.py.
        pltpu.prng_seed(eps_or_seed[0] + pl.program_id(0) * jnp.int32(SEED_TILE_HASH))
        eps = _normal_bits(mu.shape)
    else:
        eps = eps_or_seed[:]
    z = mu + jnp.exp(0.5 * lv) * eps
    if n_cond:
        n_x = x.shape[1] - n_cond
        x = x[:, :n_x]  # loss target = data columns
        z_in = jnp.concatenate([z, x_ref[:, n_x:]], axis=1)
    else:
        z_in = z
    g1 = _softplus(_mm(z_in, d1[:], cd) + c1[:])
    g2 = _softplus(_mm(g1, d2[:], cd) + c2[:])
    r = _mm(g2, do[:], cd) + co[:]
    if kind == "bernoulli":
        ce = jnp.maximum(r, 0.0) - r * x + jnp.log1p(jnp.exp(-jnp.abs(r)))
        rec = _rowsum(ce)
    else:
        d = x - r
        rec = _rowsum(d * d)
    kl = -0.5 * _rowsum(1.0 + lv - mu * mu - jnp.exp(lv))
    mu_ref[:] = mu
    lv_ref[:] = lv
    eps_ref[:] = eps
    rec_ref[:] = rec
    kl_ref[:] = kl


# ---------------------------------------------------------------------------
# Backward stage 1: fused decoder+loss backward (dz + decoder weight grads)
# ---------------------------------------------------------------------------


def _dec_loss_bwd_kernel(
    cd, kind, nrows, n_cond, x_ref, z_ref, d1, c1, d2, c2, do, co, grec_ref,
    dz_ref, dd1, dc1, dd2, dc2, ddo, dco,
):
    x = x_ref[:]
    z = z_ref[:]
    grec = grec_ref[:]
    tile = x.shape[0]
    if nrows % tile:
        valid = _row_mask(tile, nrows)
        x = jnp.where(valid, x, 0.0)
        z = jnp.where(valid, z, 0.0)
        grec = jnp.where(valid, grec, 0.0)
    if n_cond:
        # x is the widened encoder input (see _fwd_kernel): the decoder's
        # concat point re-reads the cond columns, the loss the data ones.
        n_x = x.shape[1] - n_cond
        z = jnp.concatenate([z, x[:, n_x:]], axis=1)
        x = x[:, :n_x]
    # Rematerialize the decoder from z; x̂ and its gradient stay in VMEM.
    b1d = _mm(z, d1[:], cd) + c1[:]
    g1 = _softplus(b1d)
    b2d = _mm(g1, d2[:], cd) + c2[:]
    g2 = _softplus(b2d)
    r = _mm(g2, do[:], cd) + co[:]
    if kind == "bernoulli":
        dr = (jax.nn.sigmoid(r) - x) * grec
    else:
        dr = 2.0 * (r - x) * grec
    dg2 = _mm_nt(dr, do[:], cd)
    db2d = dg2 * jax.nn.sigmoid(b2d)
    dg1 = _mm_nt(db2d, d2[:], cd)
    db1d = dg1 * jax.nn.sigmoid(b1d)
    dz_full = _mm_nt(db1d, d1[:], cd)
    # Conditional: drop the cond columns' cotangent (the condition is an
    # input, and the tower's closed-world invariant discards input grads).
    dz_ref[:] = dz_full[:, : dz_ref.shape[1]] if n_cond else dz_full

    first = pl.program_id(0) == 0
    for ref, val in (
        (ddo, _mm_tn(g2, dr, cd)),
        (dco, jnp.sum(dr, axis=0, keepdims=True)),
        (dd2, _mm_tn(g1, db2d, cd)),
        (dc2, jnp.sum(db2d, axis=0, keepdims=True)),
        (dd1, _mm_tn(z, db1d, cd)),
        (dc1, jnp.sum(db1d, axis=0, keepdims=True)),
    ):
        @pl.when(first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, val=val):
            ref[:] += val


# ---------------------------------------------------------------------------
# Wiring: flatten params, specs, custom VJP
# ---------------------------------------------------------------------------


def _flatten(params):
    r, g = params["recog"], params["gener"]
    return (
        r["h1"]["w"], r["h1"]["b"][None, :],
        r["h2"]["w"], r["h2"]["b"][None, :],
        r["out_mean"]["w"], r["out_mean"]["b"][None, :],
        r["out_logvar"]["w"], r["out_logvar"]["b"][None, :],
        g["h1"]["w"], g["h1"]["b"][None, :],
        g["h2"]["w"], g["h2"]["b"][None, :],
        g["out"]["w"], g["out"]["b"][None, :],
    )


def unflatten_grads(flat_grads):
    """Inverse of `_flatten` for the VJP's 14 weight-grad arrays."""
    (dw1, db1, dw2, db2, dwm, dbm, dwl, dbl,
     dd1, dc1, dd2, dc2, ddo, dco) = flat_grads
    return {
        "recog": {
            "h1": {"w": dw1, "b": db1[0]},
            "h2": {"w": dw2, "b": db2[0]},
            "out_mean": {"w": dwm, "b": dbm[0]},
            "out_logvar": {"w": dwl, "b": dbl[0]},
        },
        "gener": {
            "h1": {"w": dd1, "b": dc1[0]},
            "h2": {"w": dd2, "b": dc2[0]},
            "out": {"w": ddo, "b": dco[0]},
        },
    }


def _widths(flat, n_in):
    # Tower layer widths: n_in, h1e, h2e, n_z(+heads), h1d, h2d, n_out.
    return (
        n_in, flat[0].shape[1], flat[2].shape[1], flat[4].shape[1],
        flat[8].shape[1], flat[10].shape[1], flat[12].shape[1],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _tower(kind, cd, flat, x, eps_or_seed):
    return _tower_fwd(kind, cd, flat, x, eps_or_seed)[0]


def _tower_fwd(kind, cd, flat, x, eps_or_seed):
    b, n_in = x.shape
    n_z = flat[4].shape[1]
    # Conditional towers: the decoder's first weight has n_z + n_cond input
    # rows (models/networks widens it at init) — n_cond is derivable from
    # shapes, no extra static argument.
    n_cond = flat[8].shape[0] - n_z
    seeded = eps_or_seed.ndim == 1  # int32 [1] seed vs [B, n_z] ε
    widths = _widths(flat, n_in)
    tile, vreq = _plan_tile(b, _weight_bytes(widths), max(widths), n_live=8)
    if tile == 0:
        raise ValueError(
            "tower weights exceed the megakernel's VMEM plan; "
            "mega_fallback_reason routes such configs to the composable "
            "kernels — call through assoc_loss_fn/vae paths, not the raw "
            "tower"
        )
    eps_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM) if seeded else _row_spec(tile, n_z)
    )
    mu, lv, eps, rec, kl = pl.pallas_call(
        functools.partial(_fwd_kernel, cd, kind, b, seeded, n_cond),
        grid=_grid(b, tile),
        in_specs=[_row_spec(tile, n_in)] + _full_specs(14) + [eps_spec],
        out_specs=(
            _row_spec(tile, n_z), _row_spec(tile, n_z), _row_spec(tile, n_z),
            _row_spec(tile, 1), _row_spec(tile, 1),
        ),
        out_shape=(
            _sds((b, n_z), jnp.float32, x),
            _sds((b, n_z), jnp.float32, x),
            _sds((b, n_z), jnp.float32, x),
            _sds((b, 1), jnp.float32, x),
            _sds((b, 1), jnp.float32, x),
        ),
        compiler_params=_mega_compiler_params(_fwd_compiler_params(), vreq),
        interpret=_interpret(),
    )(x, *flat, eps_or_seed)
    # ε is surfaced ([B, n_z] — trivial HBM traffic; it is already a kernel
    # output for the backward's residuals) so sample-coupled terms like
    # assoc_form="sample_l2" can recompute z = μ + σ·ε in XLA (round 5 —
    # previously the one form the mega path could not serve).
    out = {"mu": mu, "lv": lv, "eps": eps,
           "recon_term": rec[:, 0], "kl_term": kl[:, 0]}
    return out, (flat, x, mu, lv, eps, eps_or_seed)


def _tower_bwd(kind, cd, res, cts):
    # cts["eps"] is deliberately unused: the surfaced ε is the noise draw
    # itself — it does not depend on params or x (seeded: pure PRNG output;
    # injected: a primal input whose cotangent `deps_or_seed` is zero
    # below by the closed-world invariant) — so consumers' z = μ + σ·ε
    # gradients flow exactly through cts["mu"]/cts["lv"] alone.
    flat, x, mu, lv, eps, eps_or_seed = res
    b, n_in = x.shape
    n_z = flat[4].shape[1]
    enc_flat, dec_flat = flat[:8], flat[8:]
    grec = cts["recon_term"][:, None]
    gkl = cts["kl_term"][:, None]

    # Reparameterization glue in XLA: [B, n_z] elementwise, fused for free.
    sig = jnp.exp(0.5 * lv)
    z = mu + sig * eps

    # Stage 1: decoder+loss backward (decoder weights + accumulators only).
    n_cond = dec_flat[0].shape[0] - n_z
    dec_widths = (n_z + n_cond, dec_flat[0].shape[1], dec_flat[2].shape[1], n_in)
    tile, vreq = _plan_tile(
        b, 2 * _weight_bytes(dec_widths), max(dec_widths), n_live=10
    )
    if tile == 0:
        raise ValueError(
            "decoder weights + grad accumulators exceed the megakernel's "
            "backward VMEM plan (gated by mega_fallback_reason)"
        )
    dec_shapes = tuple(_sds(w.shape, jnp.float32, x) for w in dec_flat)
    dz, *dec_grads = pl.pallas_call(
        functools.partial(_dec_loss_bwd_kernel, cd, kind, b, n_cond),
        grid=_grid(b, tile),
        in_specs=(
            [_row_spec(tile, n_in), _row_spec(tile, n_z)]
            + _full_specs(6)
            + [_row_spec(tile, 1)]
        ),
        out_specs=tuple(
            [_row_spec(tile, n_z)]
            + [pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for s in dec_shapes]
        ),
        out_shape=tuple([_sds((b, n_z), jnp.float32, x)] + list(dec_shapes)),
        # backward accumulates across grid steps: no 'parallel' declaration,
        # but wide towers still need the raised VMEM limit.
        compiler_params=_mega_compiler_params(None, vreq),
        interpret=_interpret(),
    )(x, z, *dec_flat, grec)

    # Stage 2: reparam + KL gradients into (dμ, dlogσ²) — XLA elementwise.
    dmu = dz + cts["mu"] + mu * gkl
    dlv = cts["lv"] + 0.5 * (jnp.exp(lv) - 1.0) * gkl + 0.5 * dz * sig * eps

    # Stage 3: existing fused encoder backward (kernels/mlp.py).
    enc_grads, _dx = _encode_fused_bwd(cd, (enc_flat, x), (dmu, dlv))

    dx = jnp.zeros_like(x)  # closed-world invariant: see module docstring
    if jnp.issubdtype(eps_or_seed.dtype, jnp.integer):
        import numpy as np

        deps_or_seed = np.zeros(eps_or_seed.shape, jax.dtypes.float0)
    else:
        deps_or_seed = jnp.zeros_like(eps_or_seed)
    return tuple(enc_grads) + tuple(dec_grads), dx, deps_or_seed


_tower.defvjp(_tower_fwd, _tower_bwd)


def vae_tower_fused(
    params, x, *, kind, key=None, eps=None, compute_dtype=jnp.float32, cond=None
):
    """Whole VAE tower + per-sample loss terms, one forward kernel.

    Returns dict(mu [B,n_z], lv [B,n_z], eps [B,n_z], recon_term [B],
    kl_term [B]). ε comes from the on-core PRNG when `key` is given (TPU;
    off-TPU the key degrades to a jax.random draw like
    kernels/sampling.py), or is injected explicitly for parity tests. The
    surfaced ε is exactly the draw the in-kernel decoder consumed, so
    ``mu + exp(0.5·lv) * eps`` reconstructs the decoder's z in XLA
    (sample-coupled association terms ride the mega path this way); its
    gradients flow through mu/lv — ε itself is parameter-independent
    noise (see `_tower_bwd`).

    ``cond`` ([B, n_cond] fp32, already one-hot/soft-encoded — the caller
    validates via models/vae.prepare_cond): conditional towers widen the
    encoder input here at the call boundary; the kernel re-reads the cond
    columns at the decoder's concat point and compares the loss against
    the data columns only. The kernel itself stays width-agnostic —
    n_cond is derived from the decoder weight's row count.
    """
    if cond is not None:
        x = jnp.concatenate(
            [jnp.asarray(x, jnp.float32), jnp.asarray(cond, jnp.float32)], axis=1
        )
    if _shardmap_interpret(x):
        # shard_map-on-CPU fallback: identical math via the jnp path (see
        # kernels.mlp._shardmap_interpret). x is already the widened
        # encoder input; mirror the kernel's decoder concat / loss slice.
        from vae_assoc_tpu.models import networks
        from vae_assoc_tpu.ops import losses

        mu, lv = networks.encode_mlp(params, x, compute_dtype=compute_dtype)
        if eps is None:
            if key is None:
                raise ValueError("vae_tower_fused needs `key` or `eps`")
            eps = jax.random.normal(key, mu.shape, jnp.float32)
        z = mu + jnp.exp(0.5 * lv) * eps.astype(jnp.float32)
        x_data = x
        if cond is not None:
            x_data = x[:, : x.shape[1] - cond.shape[1]]
            z = jnp.concatenate([z, x[:, x_data.shape[1]:]], axis=1)
        r = networks.decode_mlp(params, z, compute_dtype=compute_dtype)
        if kind == "bernoulli":
            rec = losses.bernoulli_recon(x_data, logits=r)
        else:
            rec = losses.gaussian_recon(x_data, r)
        return {"mu": mu, "lv": lv, "eps": eps.astype(jnp.float32),
                "recon_term": rec,
                "kl_term": losses.kl_divergence(mu, lv)}
    flat = tuple(_pvary_like(_flatten(params), x))
    if eps is None:
        if key is None:
            raise ValueError("vae_tower_fused needs `key` or `eps`")
        if _interpret():
            n_z = flat[4].shape[1]
            arg = jax.random.normal(key, (x.shape[0], n_z), jnp.float32)
        else:
            arg = fold_key_to_seed(key)
    else:
        arg = eps.astype(jnp.float32)
    # Promote the seed/ε arg's vma to the batch's (a mesh-invariant key
    # would fail the pallas_call's vma check under shard_map).
    (arg,) = _pvary_like([arg], x)
    return _tower(
        kind, jnp.dtype(compute_dtype).name, flat, x.astype(jnp.float32), arg
    )
