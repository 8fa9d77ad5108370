"""Tensor parallelism over a 2-D (data, model) mesh — GSPMD shardings.

The reference has no tensor parallelism (single-device TF, SURVEY.md §2.2),
and the model's MLPs are small enough that DP alone reaches the perf
targets — so TP is OFF by default. It exists because the rebuild is a
*framework*: users scaling the arch dicts (wider hidden layers, bigger
latents) hit the point where one chip's HBM/MXU can't hold a tower, and the
TPU-native answer is to shard the weight matrices over a `model` mesh axis
and let XLA insert the collectives.

Design — Megatron-style specs on the existing pytrees, zero model-code
changes:

  recog/gener ``h1``: column-parallel — ``w [in, H]  → P(None, 'model')``,
      ``b [H] → P('model')``. Each model rank computes a feature slice of
      the hidden layer; softplus is elementwise so it applies locally.
  recog/gener ``h2``: row-parallel — ``w [H, H'] → P('model', None)``,
      ``b → P()``. Each rank contracts its feature slice; XLA inserts ONE
      all-reduce per tower per direction to sum the partial products —
      the entire TP communication surface.
  heads (``out_mean``/``out_logvar``/``out``): replicated — n_z and the
      reconstruction dim are the small axes; sharding them buys nothing.

This module deliberately uses GSPMD (`jit` + `NamedSharding` on the
arguments, sharding propagation for everything else) rather than
`shard_map`: the scaling-book recipe — pick a mesh, annotate the weights,
let the partitioner place `all-reduce`s — is exactly right for a dense MLP
stack, is provably semantics-preserving, and composes with the DP batch
axis for free (the batch shards over `data`, the cotangent all-reduce over
`data` appears in the backward automatically). The hand-written `shard_map`
DP path (`parallel/dp.py`) remains the config-5 production path; TP runs
the jnp model path (Pallas kernels are single-chip programs and do not
split along feature dims — enforced below).

Verified properties (tests/test_tp.py, 8-virtual-device CPU mesh):
  * forward loss and 3-step training trajectory match the single-device
    step (same seed, same batches) to fp32 tolerance on (data=4, model=2)
    and (data=2, model=4) meshes;
  * the compiled forward HLO contains `all-reduce` (the row-parallel
    matmul sum) — TP is real, not just accepted-and-replicated;
  * param/opt-state shardings are preserved by the step (no silent
    re-replication), so steps stay collective-stable over a long run.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_assoc_tpu.configs import AssocConfig, TrainConfig
from vae_assoc_tpu.parallel import mesh as mesh_mod
from vae_assoc_tpu.train.step import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)

_REPL = {"w": P(), "b": P()}


def _col(axis: str) -> dict:
    return {"w": P(None, axis), "b": P(axis)}


def _row(axis: str) -> dict:
    return {"w": P(axis, None), "b": P()}


def tp_param_specs(cfg: AssocConfig, axis: str = mesh_mod.MODEL_AXIS) -> dict:
    """PartitionSpec pytree matching `models.assoc.init_assoc`'s params.

    MLP towers get the Megatron column/row pattern described in the
    module docstring. Conv towers (round 3) get its channel-dim analogue:
    conv1/convt1 split output channels (`cout → 'model'`, elementwise
    activations apply locally), conv2/convt2 contract the now-sharded
    input channels (`cin → 'model'`, XLA inserts the partial-sum
    all-reduce), the flatten dense layer is column-parallel and the heads
    row-parallel — same one-all-reduce-per-direction budget per stage.
    """
    # Check here, not only in the step/init wrappers: public callers like
    # `shard_params` reach this builder directly, and a 'conv_pallas'
    # modality would otherwise die in jax.tree.map with an opaque
    # tree-structure mismatch instead of the guidance message.
    _check_gspmd_encoders(cfg, "TP")

    def mlp_stack(depth: int) -> dict:
        # Megatron pairing generalized to any depth: odd layers
        # column-parallel, even layers row-parallel — each (col, row) pair
        # costs ONE all-reduce and keeps activations replicated between
        # pairs. An odd final layer leaves its activation feature-sharded;
        # the partitioner all-gathers it before the replicated heads.
        return {
            f"h{k}": _col(axis) if k % 2 else _row(axis)
            for k in range(1, depth + 1)
        }

    def tower(m) -> dict:
        from vae_assoc_tpu.configs import gener_widths, recog_widths

        recog = mlp_stack(len(recog_widths(m.arch)))
        recog["out_mean"] = _REPL
        recog["out_logvar"] = _REPL
        gener = mlp_stack(len(gener_widths(m.arch)))
        gener["out"] = _REPL
        return {"recog": recog, "gener": gener}

    def conv_tower() -> dict:
        cout_split = {"w": P(None, None, None, axis), "b": P(axis)}
        cin_split = {"w": P(None, None, axis, None), "b": P()}
        return {
            "recog": {
                "conv1": cout_split,
                "conv2": cin_split,
                "dense": _col(axis),
                "out_mean": _row(axis),
                "out_logvar": _row(axis),
            },
            "gener": {
                "dense1": _col(axis),
                "dense2": _row(axis),
                "convt1": cout_split,
                "convt2": cin_split,
            },
        }

    return {
        "modalities": tuple(
            conv_tower() if m.encoder == "conv" else tower(m)
            for m in cfg.modalities
        )
    }


def shard_params(mesh: Mesh, params: dict, cfg: AssocConfig) -> dict:
    """Place a params pytree onto `mesh` with the Megatron TP specs."""
    specs = tp_param_specs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _check_gspmd_encoders(cfg: AssocConfig, what: str) -> None:
    """The GSPMD layouts cover the jnp model paths: 'mlp' and 'conv' (XLA
    convs — round 3 added conv-tower sharding rules). 'conv_pallas' routes
    the model itself through single-chip Pallas kernels, which do not
    split along feature dims under the partitioner."""
    bad = [m.name for m in cfg.modalities if m.encoder not in ("mlp", "conv")]
    if bad:
        raise ValueError(
            f"{what} sharding specs cover encoder='mlp' and 'conv' "
            f"modalities; got Pallas-kernel encoders for {bad} — use "
            "encoder='conv' (XLA convs) with sharded layouts"
        )


def _check_tp_mesh(mesh: Mesh, tc: TrainConfig, cfg: AssocConfig) -> None:
    _check_gspmd_encoders(cfg, "TP")
    if mesh_mod.MODEL_AXIS not in mesh.axis_names:
        raise ValueError(
            f"TP needs a mesh with a '{mesh_mod.MODEL_AXIS}' axis — build one "
            "with make_mesh(model_axis='model', model_parallel=K); got axes "
            f"{mesh.axis_names}"
        )
    if tc.use_pallas:
        raise ValueError(
            "GSPMD TP runs the jnp model path: the partitioner cannot split "
            "a pallas_call along feature dims. Kernel-keeping alternatives: "
            "the shard_map TP layout (parallel/tp_shard.py, driver "
            "--tp-shard — hand column x row splits around the fused block "
            "kernels), or the shard_map ZeRO layout (parallel/zero.py, "
            "--zero) if the goal is sharding STATE; or set "
            "TrainConfig(use_pallas=False) here. Chooser table: "
            "docs/PARALLEL.md."
        )


def _placer(mesh: Mesh):
    """How to place a host/global value onto a sharding of `mesh`.

    Single-process: `jax.device_put`. Multi-controller (mesh spans
    processes, e.g. a pod or the Gloo-backed multiprocess tests):
    `device_put` cannot reach non-addressable devices, but a jitted
    identity with `out_shardings` can — XLA moves/slices the (replicated
    or jit-produced) value into the global layout. Validated end-to-end by
    the cross-process TP leg of tests/test_multiprocess.py.
    """
    me = jax.process_index()
    if all(d.process_index == me for d in mesh.devices.flat):
        return jax.device_put

    def put(x, sharding):
        return jax.jit(lambda y: y, out_shardings=sharding)(x)

    return put


def shard_opt_state_like(mesh: Mesh, opt_state, specs: dict, opt):
    """Lay the optimizer's params-shaped leaves (Adam mu/nu, MultiSteps
    grad accumulators) out exactly like the params they track (`specs` is
    a PartitionSpec pytree matching the param tree); counts and other
    scalars replicate.

    This must be explicit: optimizer moments are `zeros_like` constants with
    no data-flow edge from the sharded params, so XLA's sharding propagation
    cannot infer their layout (measured: `jit(opt.init)` on sharded params
    left the moments on one device). `optax.tree_map_params` walks whatever
    state tree `opt` (the GradientTransformation from
    `train.step.make_optimizer`) builds, so schedule / clip / accumulation
    wrappers re-lay correctly without this function knowing their shapes.
    """
    put = _placer(mesh)
    repl = NamedSharding(mesh, P())
    return optax.tree_map_params(
        opt,
        lambda x, s: put(x, NamedSharding(mesh, s)),
        opt_state,
        specs,
        transform_non_params=lambda x: put(x, repl),
    )


def shard_train_state_like(
    mesh: Mesh, state: TrainState, specs: dict, tc: TrainConfig
) -> TrainState:
    """Re-lay an existing TrainState (fresh or checkpoint-restored) onto
    `mesh` with `specs` on the params (and matching opt-state layout),
    replicated step/rng. Shared by the TP and FSDP layouts; works on
    single-process and multi-controller meshes (see `_placer`)."""
    put = _placer(mesh)
    repl = NamedSharding(mesh, P())
    params = jax.tree.map(
        lambda x, s: put(x, NamedSharding(mesh, s)), state.params, specs
    )
    return TrainState(
        put(state.step, repl),
        params,
        shard_opt_state_like(mesh, state.opt_state, specs, make_optimizer(tc)),
        put(state.rng, repl),
    )


def shard_tp_train_state(
    mesh: Mesh, state: TrainState, cfg: AssocConfig, tc: TrainConfig
) -> TrainState:
    """Re-lay an existing TrainState (fresh or checkpoint-restored) onto a
    TP mesh: Megatron specs on params, matching layout on Adam's moments,
    replicated step/rng."""
    _check_tp_mesh(mesh, tc, cfg)
    return shard_train_state_like(mesh, state, tp_param_specs(cfg), tc)


def init_tp_train_state(
    cfg: AssocConfig, tc: TrainConfig, mesh: Mesh, key=None
) -> TrainState:
    """TrainState with TP-sharded params and matching-sharded opt state."""
    _check_tp_mesh(mesh, tc, cfg)
    return shard_train_state_like(
        mesh, init_train_state(cfg, tc, key), tp_param_specs(cfg), tc
    )


@functools.lru_cache(maxsize=64)
def make_tp_train_step(cfg: AssocConfig, tc: TrainConfig, mesh: Mesh):
    """Build the DP×TP train step over a 2-D (data, model) mesh.

    Returns ``step_fn(state, xs) -> (state', metrics)`` with the same
    contract as `train.step.make_train_step` / `parallel.dp.make_dp_train_step`:
    ``xs`` are global ``[B, n_input_k]`` batches (or ``[N, B, ...]`` stacks)
    sharded on the batch dim over the `data` axis (`shard_tp_batch`), state
    from `init_tp_train_state` (donated). The function body is the plain
    single-device step — all parallelism lives in the argument shardings;
    GSPMD inserts the model-axis all-reduces (forward+backward) and the
    data-axis gradient all-reduce.
    """
    _check_tp_mesh(mesh, tc, cfg)
    base = make_train_step(cfg, tc, jit=False)

    def step_fn(state: TrainState, xs):
        return base(state, list(xs))

    return jax.jit(step_fn, donate_argnums=(0,))


def shard_tp_batch(mesh: Mesh, arrays, *, leading_scan_axis: bool = False):
    """Batch-shard inputs over the `data` axis of a 2-D (data, model) mesh."""
    return mesh_mod.shard_batch(
        mesh,
        arrays,
        leading_scan_axis=leading_scan_axis,
        batch_axes=mesh_mod.DATA_AXIS,
    )


def tp_train_loop(
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
    """Epoch driver for the DP×TP step — `parallel.dp.dp_train_loop` with the
    GSPMD step/init/shard functions swapped in."""
    from vae_assoc_tpu.parallel.dp import _epoch_loop

    if state is None:
        state = init_tp_train_state(cfg, tc, mesh)
    step_fn = make_tp_train_step(cfg, tc, mesh)
    return _epoch_loop(
        cfg,
        tc,
        data,
        mesh,
        step_fn,
        state,
        shard_fn=shard_tp_batch,
        n_batch_dev=int(mesh.shape[mesh_mod.DATA_AXIS]),
        epochs=epochs,
        display_step=display_step,
        on_metrics=on_metrics,
        shuffle=shuffle,
    )
