"""ZeRO-sharded data parallelism via shard_map — FSDP that keeps the kernels.

`parallel/fsdp.py` shards state with GSPMD shardings on the jnp model path;
the partitioner cannot split a `pallas_call`, so that layout and the fused
Pallas kernels are mutually exclusive (its `_check_fsdp` says so loudly).
This module is the complementary formulation, built the way the scaling
playbook writes ZeRO by hand:

- **Storage**: every parameter and Adam-moment leaf is flattened, padded to
  a multiple of the mesh size, and stored SHARDED over the `('data',)` axis
  — per-chip state memory drops by the mesh size, exactly like GSPMD FSDP.
- **Compute**: inside `shard_map`, each step `all_gather`s the weight
  shards back into full (transient) arrays, runs the UNCHANGED model path —
  including `use_pallas=True`/`"mega"` fused kernels and both conv
  formulations — on its batch shard, then `psum_scatter`s (reduce-scatter)
  the gradients so each chip keeps only its shard of the summed gradient,
  and applies Adam to the local shards. Elementwise optimizer math is
  layout-blind, so updating flat shards is bitwise the same arithmetic as
  updating full arrays.

The collectives are the textbook ZeRO pair (all-gather weights,
reduce-scatter grads) riding ICI. The weights are gathered ONCE per step —
the custom-VJP/backward reuses the gathered arrays from its saved
residuals — so per-step wire volume is 1×params gathered + 1×params
scattered: exactly the all-gather/reduce-scatter decomposition of plain
DP's gradient all-reduce. What the layout trades is a transient gathered
copy during the step instead of a permanent replica.

Because the sharding never looks at array *structure* (flat vectors only),
this path works for every encoder — MLP towers, XLA convs, banded Pallas
convs — and for arch dicts whose dims the mesh size does not divide
(`fsdp_param_specs` falls back to replication there; padding does not).

Gradient semantics match `parallel/dp.py` exactly: the loss is pmean'd
before grad, per-shard ε streams fold in the mesh position, and the summed
gradient equals the gradient of the global-batch mean loss. `grad_clip_norm`
uses a psum'd GLOBAL norm (`_clip_by_global_norm_sharded`) so clipping is
identical to the single-device `optax.clip_by_global_norm`; accumulation
(`accum_steps`) composes through `train.step.make_optimizer` unchanged.

Interop: `gather_zero_train_state` / `shard_zero_train_state` convert
between this layout and the plain full-array TrainState, so checkpoints,
validation, serving, and the other layouts (DP/TP/FSDP) round-trip freely.
CLI: `driver --mesh N --zero` (composes with --use-pallas / config 5).

Verified (tests/test_zero.py, 8-virtual-device CPU mesh): trajectory equals
the DP step on every kernel path; shards are disjoint 1/8 slices; the
compiled HLO contains all-gather + reduce-scatter; gather/shard round-trips
bitwise; clip+accumulation match single-device; checkpoint resume is
continuous. On TPU, `scripts/smoke_dp_tpu.py --zero` proves the Mosaic
kernels execute under this layout.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_assoc_tpu.configs import AssocConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.parallel import mesh as mesh_mod
from vae_assoc_tpu.train import step as step_mod
from vae_assoc_tpu.train.step import TrainState, init_train_state, make_optimizer


def _n_shards(mesh: Mesh) -> int:
    if mesh_mod.DATA_AXIS not in mesh.axis_names:
        raise ValueError(
            f"ZeRO shards over the '{mesh_mod.DATA_AXIS}' axis; mesh has "
            f"{mesh.axis_names}"
        )
    if len(mesh.axis_names) != 1:
        raise ValueError(
            "ZeRO runs over a 1-D data mesh (shard_map owns the whole "
            f"layout); got a {dict(mesh.shape)} mesh. For model-axis "
            "splits use parallel/tp.py or parallel/tp_fsdp.py."
        )
    return int(mesh.shape[mesh_mod.DATA_AXIS])


def _pad_len(size: int, n: int) -> int:
    return ((size + n - 1) // n) * n


def _flatten_pad(leaf, n: int):
    """[*, …] → flat [pad] with a zero tail so `n` divides the length.

    Padding (not replication) is what frees the layout from divisibility:
    a [500]-wide bias shards over 8 devices as 8×[63] with 4 zeros."""
    flat = jnp.ravel(leaf)
    pad = _pad_len(flat.size, n) - flat.size
    return jnp.pad(flat, (0, pad)) if pad else flat


@functools.lru_cache(maxsize=32)
def _param_template(cfg: AssocConfig):
    """ShapeDtypeStruct pytree of the full (unsharded) param tree."""
    return jax.eval_shape(lambda: assoc_mod.init_assoc(jax.random.key(0), cfg))


def _leaf_size(sds) -> int:
    return int(np.prod(sds.shape, dtype=np.int64))


def _unflatten(flat, sds):
    return flat[: _leaf_size(sds)].reshape(sds.shape)


def _global_norm_sharded(tree, axis: str):
    """Global L2 norm of a gradient whose leaves are disjoint ZeRO shards:
    psum the per-device sum of squares (pad zeros contribute nothing)."""
    local = sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(tree))
    return jnp.sqrt(jax.lax.psum(local, axis))


def _clip_by_global_norm_sharded(max_norm: float, axis: str):
    """`optax.clip_by_global_norm` for ZeRO shards: identical trigger/scale
    arithmetic, but the norm is the psum'd global one — a per-device norm
    would clip each shard by a different factor and silently diverge from
    the single-device optimizer."""

    def update_fn(updates, state, params=None):
        del params
        g_norm = _global_norm_sharded(updates, axis)
        clipped = jax.tree.map(
            lambda t: jnp.where(
                g_norm < max_norm, t, (t / g_norm.astype(t.dtype)) * max_norm
            ),
            updates,
        )
        return clipped, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def _zero_optimizer(tc: TrainConfig, axis: str):
    """The ONE-source optimizer (`train.step.make_optimizer`) with the clip
    stage swapped for the psum'd-global-norm variant. Composition order —
    MultiSteps(chain(clip, adam)) — is inherited, so accumulation semantics
    (clip the AVERAGED gradient at emit boundaries) match every other path."""
    clip = None
    if tc.grad_clip_norm > 0:
        clip = _clip_by_global_norm_sharded(tc.grad_clip_norm, axis)
    return make_optimizer(tc, clip_transform=clip)


# ---------------------------------------------------------------------------
# Layout conversion: full TrainState ⇄ ZeRO-sharded TrainState
# ---------------------------------------------------------------------------


def _zero_opt_spec(cfg: AssocConfig, tc: TrainConfig, n: int, opt):
    """PartitionSpec tree for the flat-sharded optimizer state: params-like
    leaves (mu/nu/accumulators) shard over the data axis, counts and other
    scalars replicate. `optax.tree_map_params` walks whatever state tree the
    optimizer builds, so schedule/clip/accumulation wrappers lay out
    correctly without this function knowing their shapes."""
    tmpl = _param_template(cfg)
    flat_tmpl = jax.tree.map(
        lambda t: jax.ShapeDtypeStruct((_pad_len(_leaf_size(t), n),), t.dtype), tmpl
    )
    return optax.tree_map_params(
        opt,
        lambda x: P(mesh_mod.DATA_AXIS),
        jax.eval_shape(opt.init, flat_tmpl),
        transform_non_params=lambda x: P(),
    )


def shard_zero_train_state(
    mesh: Mesh, state: TrainState, cfg: AssocConfig, tc: TrainConfig
) -> TrainState:
    """Convert a plain full-array TrainState (fresh or checkpoint-restored)
    into the ZeRO layout: every param/moment leaf flattened, zero-padded to
    a multiple of the mesh size, and placed sharded over the data axis;
    step/rng and optimizer scalars replicated."""
    from vae_assoc_tpu.parallel.tp import _placer

    n = _n_shards(mesh)
    opt = _zero_optimizer(tc, mesh_mod.DATA_AXIS)
    put = _placer(mesh)  # device_put, or jit-identity on multi-controller
    shard = NamedSharding(mesh, P(mesh_mod.DATA_AXIS))
    repl = NamedSharding(mesh, P())
    params = jax.tree.map(
        lambda p: put(_flatten_pad(p, n), shard), state.params
    )
    # The stored opt state came from make_optimizer(tc) — same tree structure
    # as _zero_optimizer's (the clip stage is stateless in both).
    opt_state = optax.tree_map_params(
        opt,
        lambda x: put(_flatten_pad(x, n), shard),
        state.opt_state,
        transform_non_params=lambda x: put(x, repl),
    )
    return TrainState(
        put(state.step, repl),
        params,
        opt_state,
        put(state.rng, repl),
    )


def gather_zero_train_state(
    zstate: TrainState, cfg: AssocConfig, tc: TrainConfig
) -> TrainState:
    """Inverse of `shard_zero_train_state`: slice the padding off each flat
    leaf and restore the original shapes. The stored arrays are logically
    whole (sharded jax.Arrays), so this is pure reshaping — no collectives.
    The result checkpoints/evaluates/serves exactly like any TrainState."""
    tmpl = _param_template(cfg)
    opt = _zero_optimizer(tc, mesh_mod.DATA_AXIS)
    params = jax.tree.map(lambda f, t: _unflatten(f, t), zstate.params, tmpl)
    opt_state = optax.tree_map_params(
        opt, lambda f, t: _unflatten(f, t), zstate.opt_state, tmpl
    )
    return TrainState(zstate.step, params, opt_state, zstate.rng)


def init_zero_train_state(
    cfg: AssocConfig, tc: TrainConfig, mesh: Mesh, key=None
) -> TrainState:
    return shard_zero_train_state(mesh, init_train_state(cfg, tc, key), cfg, tc)


# ---------------------------------------------------------------------------
# The step
# ---------------------------------------------------------------------------


def _zero_one_step(state: TrainState, xs, cfg, tc, opt, axis, n, tmpl):
    """Per-shard step body. Mirrors `train.step._one_step`'s semantics
    (ε folding, pmean-before-grad, metric averaging, raw pre-clip grad_norm)
    with the ZeRO gather/scatter wrapped around the unchanged loss."""
    rng, step_key = jax.random.split(state.rng)
    step_key = jax.random.fold_in(step_key, state.step)
    # Independent ε per data shard, deterministic in (seed, step, shard) —
    # identical to the DP path, so trajectories are comparable.
    step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))

    with jax.named_scope("zero_all_gather"):
        # ZeRO's transient full-weight window: gather every shard back to
        # its full array. XLA schedules these against the previous step's
        # epilogue; the full tree lives only for the fwd+bwd below.
        params_full = jax.tree.map(
            lambda s, t: _unflatten(jax.lax.all_gather(s, axis, tiled=True), t),
            state.params,
            tmpl,
        )

    def loss_fn(params):
        total, metrics = assoc_mod.assoc_loss_fn(
            params,
            xs,
            cfg,
            key=step_key,
            compute_dtype=tc.compute_dtype,
            parity_mode=tc.parity_mode,
            use_pallas=tc.use_pallas,
            remat=tc.remat,
            data_axis=axis,  # global-negatives infonce gathers over it
        )
        # β-VAE / annealing knobs, same shared helper as _one_step (no-op
        # at the defaults).
        total, metrics = step_mod.apply_objective_weights(
            total, metrics, cfg, tc, state.step
        )
        # pmean before grad (see train.step._one_step): each shard's grads
        # arrive as (1/D)·∂total_shard/∂params; the reduce-scatter below
        # sums them into the gradient of the global-batch mean loss.
        return jax.lax.pmean(total, axis), metrics

    with jax.named_scope("fwd_bwd"):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(params_full)
    with jax.named_scope("zero_reduce_scatter"):
        # Reduce-scatter: each device keeps only its flat shard of the
        # summed gradient — half the wire bytes of DP's all-reduce, and the
        # full-gradient tree never persists anywhere.
        grads = jax.tree.map(
            lambda g: jax.lax.psum_scatter(
                _flatten_pad(g, n), axis, scatter_dimension=0, tiled=True
            ),
            grads,
        )
    metrics = jax.lax.pmean(metrics, axis)
    # Raw (pre-clip) global grad norm, same semantics as every other path:
    # the shards partition the true gradient, pad zeros contribute nothing.
    metrics["grad_norm"] = _global_norm_sharded(grads, axis)
    with jax.named_scope("adam_update"):
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
    return TrainState(state.step + 1, params, opt_state, rng), metrics


@functools.lru_cache(maxsize=64)
def make_zero_train_step(cfg: AssocConfig, tc: TrainConfig, mesh: Mesh):
    """Build the ZeRO train step: `step_fn(zstate, xs) -> (zstate', metrics)`
    with the same contract as `make_dp_train_step` (global batches via
    `mesh.shard_batch`, `steps_per_call` stacks scanned on device, state
    donated) — but state in the ZeRO layout and EVERY kernel path allowed."""
    n = _n_shards(mesh)
    axis = mesh_mod.DATA_AXIS
    opt = _zero_optimizer(tc, axis)
    tmpl = _param_template(cfg)
    spc = tc.steps_per_call

    def local_step(state: TrainState, xs):
        if spc == 1:
            return _zero_one_step(state, list(xs), cfg, tc, opt, axis, n, tmpl)

        def body(carry, batch):
            return _zero_one_step(carry, list(batch), cfg, tc, opt, axis, n, tmpl)

        return jax.lax.scan(body, state, tuple(xs))

    params_spec = jax.tree.map(lambda _: P(axis), tmpl)
    state_spec = TrainState(P(), params_spec, _zero_opt_spec(cfg, tc, n, opt), P())
    xs_spec = mesh_mod.batch_spec(mesh, leading_scan_axis=spc > 1)
    step_fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_spec, xs_spec),
        out_specs=(state_spec, P()),
    )
    return jax.jit(step_fn, donate_argnums=(0,))


def zero_train_loop(
    cfg: AssocConfig,
    tc: TrainConfig,
    data: Sequence,
    mesh: Mesh,
    *,
    epochs: int = 10,
    state: TrainState | None = None,
    display_step: int = 1,
    on_metrics=None,
    shuffle: bool = True,
):
    """Epoch driver for the ZeRO step — `parallel.dp.dp_train_loop` with the
    sharded-state step swapped in. `state` must already be in the ZeRO
    layout (`init_zero_train_state` / `shard_zero_train_state`)."""
    from vae_assoc_tpu.parallel.dp import _epoch_loop

    if state is None:
        state = init_zero_train_state(cfg, tc, mesh)
    step_fn = make_zero_train_step(cfg, tc, mesh)
    return _epoch_loop(
        cfg,
        tc,
        data,
        mesh,
        step_fn,
        state,
        shard_fn=mesh_mod.shard_batch,
        n_batch_dev=int(mesh.shape[mesh_mod.DATA_AXIS]),
        epochs=epochs,
        display_step=display_step,
        on_metrics=on_metrics,
        shuffle=shuffle,
    )
