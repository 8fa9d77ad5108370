"""Fused joint-loss Pallas kernel: recon + KL + association in one pass.

The joint objective's per-sample terms (SURVEY.md §3.2; ops/losses.py):

    recon_k  (Bernoulli logit-CE or Gaussian SSE, summed over features)
    kl_k     −½ Σ (1 + logσ² − μ² − σ²)
    assoc    Σ_{i<j} ‖μ_i − μ_j‖²

are all elementwise + row reductions over tensors that the encoder/decoder
kernels just produced. This kernel computes every term for all K
modalities in ONE pass over the batch tile — one kernel launch instead of
~5K fused XLA loops — writing a [B, n_terms] matrix (columns: recon_k…,
kl_k…, assoc). The custom VJP is a second fused kernel emitting the
closed-form gradients (σ(l)−x, 2(x̂−x), μ·g, ½(σ²−1)·g, 2Δμ·g…).

Means over the batch and the λ-weighted total stay in XLA (scalars).
Parity vs ops/losses.py is enforced in tests/test_fused_loss.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_assoc_tpu.kernels.mlp import _interpret, _sds


def _row_sum(x):
    return jnp.sum(x, axis=-1, keepdims=True)


def _loss_kernel(kinds, with_assoc, *refs):
    k = len(kinds)
    out_ref = refs[-1]
    xs = refs[:k]
    recons = refs[k : 2 * k]
    mus = refs[2 * k : 3 * k]
    lvs = refs[3 * k : 4 * k]
    cols = []
    for kind, x_ref, r_ref in zip(kinds, xs, recons):
        x = x_ref[:]
        r = r_ref[:]
        if kind == "bernoulli":
            # Stable sigmoid CE from logits: max(l,0) − l·x + log1p(e^−|l|).
            ce = jnp.maximum(r, 0.0) - r * x + jnp.log1p(jnp.exp(-jnp.abs(r)))
            cols.append(_row_sum(ce))
        else:
            d = x - r
            cols.append(_row_sum(d * d))
    for mu_ref, lv_ref in zip(mus, lvs):
        mu = mu_ref[:]
        lv = lv_ref[:]
        cols.append(-0.5 * _row_sum(1.0 + lv - mu * mu - jnp.exp(lv)))
    if with_assoc:
        assoc = jnp.zeros_like(cols[0])
        for i in range(k):
            for j in range(i + 1, k):
                d = mus[i][:] - mus[j][:]
                assoc = assoc + _row_sum(d * d)
        cols.append(assoc)
    for c, col in enumerate(cols):
        out_ref[:, c : c + 1] = col


def _loss_bwd_kernel(kinds, with_assoc, refs, douts):
    """refs: (g_ref, xs…, recons…, mus…, lvs…);
    douts: (drecons…, dmus…, dlvs…) — the kernel's output refs. The input
    cotangents dxs are NOT kernel outputs: `_loss_bwd` derives them in XLA
    from drecons after the pallas_call (they are elementwise in drecons and
    fuse there for free).

    g_ref is the [B, n_terms] cotangent of the per-sample loss matrix.
    """
    k = len(kinds)
    g_ref = refs[0]
    xs = refs[1 : 1 + k]
    recons = refs[1 + k : 1 + 2 * k]
    mus = refs[1 + 2 * k : 1 + 3 * k]
    lvs = refs[1 + 3 * k : 1 + 4 * k]
    drecons = douts[:k]
    dmus = douts[k : 2 * k]
    dlvs = douts[2 * k : 3 * k]
    g = g_ref[:]
    for i, kind in enumerate(kinds):
        g_rec = g[:, i : i + 1]
        x = xs[i][:]
        r = recons[i][:]
        if kind == "bernoulli":
            drecons[i][:] = (jax.nn.sigmoid(r) - x) * g_rec
        else:
            drecons[i][:] = 2.0 * (r - x) * g_rec
    for i in range(k):
        g_kl = g[:, k + i : k + i + 1]
        mu = mus[i][:]
        lv = lvs[i][:]
        dmu = mu * g_kl
        dlv = 0.5 * (jnp.exp(lv) - 1.0) * g_kl
        if with_assoc:
            g_as = g[:, 2 * k : 2 * k + 1]
            for j in range(k):
                if j == i:
                    continue
                dmu = dmu + 2.0 * (mu - mus[j][:]) * g_as
        dmus[i][:] = dmu
        dlvs[i][:] = dlv


def _row_spec(tile, ncols):
    return pl.BlockSpec((tile, ncols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _loss_tile(b, arrays, n_live=4):
    """Batch tile bounded by VMEM: n_live × the per-sample row bytes
    (inputs + grads + elementwise temps), lanes padded to 128."""
    per_sample = 4 * n_live * sum(
        ((a.shape[-1] + 127) // 128) * 128 for a in arrays
    )
    from vae_assoc_tpu.kernels.mlp import _batch_tile

    limit = max(8, (6 * 1024 * 1024) // max(per_sample, 1))
    return _batch_tile(b, limit=min(limit, 512))


def joint_loss_terms_fused(kinds, xs, recons, mus, lvs, with_assoc=True):
    """Per-sample loss matrix [B, 2K+1]: recon_0..K, kl_0..K, assoc.

    kinds: tuple of "bernoulli"/"gaussian" per modality (static).
    xs/recons: per-modality [B, D_k]; mus/lvs: per-modality [B, n_z].
    with_assoc=False (static) drops the mean-L2 assoc column — both its
    forward work and its backward dμ — returning [B, 2K]: the caller is
    coupling through a non-default assoc form computed outside the kernel
    (models/assoc.py), so the hard-coded column would be dead forward work
    every step (round-3 ADVICE finding).

    The shard_map-on-CPU fallback gate lives HERE, in a plain wrapper,
    not inside the custom_vjp primal: `jax.grad` traces the fwd rule
    directly and never runs the primal body, so a gate placed there is
    silently bypassed under differentiation (the round-3 dryrun's
    config-5 leg crashed exactly this way — interpret-mode pallas_call
    body evaluated under vma typing).
    """
    from vae_assoc_tpu.kernels.mlp import _shardmap_interpret

    if _shardmap_interpret(xs[0]):
        # shard_map-on-CPU fallback (see kernels.mlp._shardmap_interpret);
        # differentiable as-is via the ops.losses autodiff path.
        from vae_assoc_tpu.ops import losses as l

        cols = []
        for kind, x, r in zip(kinds, xs, recons):
            if kind == "bernoulli":
                cols.append(l.bernoulli_recon(x, logits=r))
            else:
                cols.append(l.gaussian_recon(x, r))
        cols += [l.kl_divergence(m, v) for m, v in zip(mus, lvs)]
        if with_assoc:
            cols.append(l.assoc_loss(list(mus)))
        return jnp.stack(cols, axis=-1)
    return _loss_terms_pallas(kinds, with_assoc, xs, recons, mus, lvs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _loss_terms_pallas(kinds, with_assoc, xs, recons, mus, lvs):
    return _loss_fwd(kinds, with_assoc, xs, recons, mus, lvs)[0]


def _loss_fwd(kinds, with_assoc, xs, recons, mus, lvs):
    k = len(kinds)
    ncols = 2 * k + 1 if with_assoc else 2 * k
    b = xs[0].shape[0]
    args = [a.astype(jnp.float32) for a in (*xs, *recons, *mus, *lvs)]
    tile = _loss_tile(b, args)
    out = pl.pallas_call(
        functools.partial(_loss_kernel, kinds, with_assoc),
        grid=(pl.cdiv(b, tile),),
        in_specs=[_row_spec(tile, a.shape[-1]) for a in args],
        out_specs=_row_spec(tile, ncols),
        out_shape=_sds((b, ncols), jnp.float32, args[0]),
        interpret=_interpret(),
    )(*args)
    return out, (tuple(args),)


def _loss_bwd(kinds, with_assoc, res, g):
    (args,) = res
    k = len(kinds)
    ncols = 2 * k + 1 if with_assoc else 2 * k
    xs = args[:k]
    recons = args[k : 2 * k]
    mus = args[2 * k : 3 * k]
    lvs = args[3 * k : 4 * k]

    def kern(*refs_and_outs):
        _loss_bwd_kernel(
            kinds, with_assoc,
            refs_and_outs[: 1 + 4 * k], refs_and_outs[1 + 4 * k :],
        )

    out_shapes = tuple(
        _sds(a.shape, jnp.float32, a) for a in (*recons, *mus, *lvs)
    )
    b = xs[0].shape[0]
    tile = _loss_tile(b, args, n_live=6)
    grads = pl.pallas_call(
        kern,
        grid=(pl.cdiv(b, tile),),
        in_specs=[_row_spec(tile, ncols)]
        + [_row_spec(tile, a.shape[-1]) for a in args],
        out_specs=tuple(_row_spec(tile, s.shape[-1]) for s in out_shapes),
        out_shape=out_shapes,
        interpret=_interpret(),
    )(g.astype(jnp.float32), *args)
    drecons = tuple(grads[:k])
    dmus = tuple(grads[k : 2 * k])
    dlvs = tuple(grads[2 * k : 3 * k])
    # d loss/dx (the targets): closed-form elementwise, emitted as plain XLA
    # ops OUTSIDE the kernel so training (which never differentiates the
    # data) dead-code-eliminates them for free, while input-optimization
    # users still get the true gradient (not a silent zero).
    g32 = g.astype(jnp.float32)
    dxs = []
    for i, kind in enumerate(kinds):
        g_rec = g32[:, i : i + 1]
        if kind == "bernoulli":
            dxs.append(-recons[i] * g_rec)  # d/dx[max(r,0) − r·x + …] = −r
        else:
            dxs.append(2.0 * (xs[i] - recons[i]) * g_rec)
    return tuple(dxs), drecons, dmus, dlvs


_loss_terms_pallas.defvjp(_loss_fwd, _loss_bwd)
