"""Combined TP × FSDP layout over a 2-D (data, model) mesh — GSPMD.

`parallel/tp.py` (Megatron weight sharding) and `parallel/fsdp.py`
(ZeRO state sharding) each lay out the WHOLE train state with their own
spec tree, so round 2 shipped them mutually exclusive — a user scaling
an arch dict had to pick one. This module composes the two spec trees
into one layout so big models get both:

  recog/gener ``h1``: ``w [in, H] → P('data', 'model')`` — column-parallel
      over `model` (the Megatron split) AND input-dim sharded over `data`
      (the ZeRO split) when divisible; ``b [H] → P('model')``.
  recog/gener ``h2``: ``w [H, H'] → P('model', 'data')`` — row-parallel
      over `model` (XLA inserts the partial-product all-reduce) with the
      output dim over `data` when divisible; ``b → P()``.
  heads (``out_mean``/``out_logvar``/``out``): no model split (n_z and the
      recon dim are the small axes) — the FSDP largest-divisible-dim rule
      shards them over `data` instead of replicating.

Adam's mu/nu mirror the combined param layout (via
`tp.shard_train_state_like` — moments are `zeros_like` constants with no
data-flow edge, so propagation can't infer them). Per-chip state memory
drops by ~the full mesh size instead of only the model factor; batches
shard over `data`; all collectives (model-axis partial-product
all-reduce, data-axis JIT weight all-gathers, gradient reduce-scatters)
are inserted by the GSPMD partitioner and ride ICI.

As with TP/FSDP alone this is provably semantics-preserving (same step
body, shardings only) — verified in tests/test_tp_fsdp.py: 3-step
trajectory equality vs the single-device step, disjoint 2-D shards, and
both collective families present in the compiled HLO.

CLI: ``driver --mesh N --model-parallel K --fsdp``.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P

from vae_assoc_tpu.configs import AssocConfig, TrainConfig
from vae_assoc_tpu.parallel import mesh as mesh_mod
from vae_assoc_tpu.parallel.tp import (
    _check_gspmd_encoders,
    shard_tp_batch,
    shard_train_state_like,
)
from vae_assoc_tpu.train.step import TrainState, init_train_state, make_train_step


def tp_fsdp_param_specs(
    cfg: AssocConfig,
    data_shards: int,
    *,
    data_axis: str = mesh_mod.DATA_AXIS,
    model_axis: str = mesh_mod.MODEL_AXIS,
) -> dict:
    """PartitionSpec pytree composing Megatron TP with data-axis ZeRO.

    The `data` dim of each spec is dropped when `data_shards` does not
    divide that dim (stored jax.Arrays need equal shards — same rule as
    `fsdp_param_specs`); the Megatron `model` placement is kept
    unconditionally (mesh construction already validates divisibility of
    the hidden dims over the model factor).
    """
    _check_gspmd_encoders(cfg, "TP×FSDP")  # see tp.tp_param_specs

    def col(n_in: int) -> dict:  # h1: [in, H] col-parallel (+ data on in)
        row0 = data_axis if n_in % data_shards == 0 else None
        return {"w": P(row0, model_axis), "b": P(model_axis)}

    def row(n_out: int) -> dict:  # h2: [H, H'] row-parallel (+ data on out)
        col1 = data_axis if n_out % data_shards == 0 else None
        return {"w": P(model_axis, col1), "b": P()}

    def head(n_in: int, n_out: int) -> dict:  # FSDP largest-divisible rule
        for d in sorted((0, 1), key=lambda d: (n_in, n_out)[d], reverse=True):
            if (n_in, n_out)[d] % data_shards == 0:
                return {
                    "w": P(data_axis, None) if d == 0 else P(None, data_axis),
                    "b": P(),
                }
        return {"w": P(), "b": P()}

    def mlp_stack(first: int, widths) -> dict:
        # Megatron alternation (tp.tp_param_specs.mlp_stack) with the
        # spare dim sharded over `data`: odd layers col(input dim), even
        # layers row(output dim).
        specs = {}
        prev = first
        for k, width in enumerate(widths, 1):
            specs[f"h{k}"] = col(prev) if k % 2 else row(width)
            prev = width
        return specs

    def tower(m) -> dict:
        from vae_assoc_tpu.configs import gener_widths, recog_widths

        arch = m.arch
        n_in, n_z = arch["n_input"], arch["n_z"]
        rw, gw = recog_widths(arch), gener_widths(arch)
        # h1 input widths are the STORED (conditional-widened) dims — see
        # fsdp.fsdp_param_specs.mlp_tower.
        recog = mlp_stack(n_in + m.n_cond, rw)
        recog["out_mean"] = head(rw[-1], n_z)
        recog["out_logvar"] = head(rw[-1], n_z)
        gener = mlp_stack(n_z + m.n_cond, gw)
        gener["out"] = head(gw[-1], n_in)
        return {"recog": recog, "gener": gener}

    def conv_tower(arch) -> dict:
        # TP channel splits (tp.tp_param_specs conv pattern) + `data` on
        # the largest spare divisible dim of each leaf.
        from vae_assoc_tpu.models.conv import C1, C2, _FLAT

        n_z = arch["n_z"]
        hr, hg = arch["n_hidden_recog_2"], arch["n_hidden_gener_1"]

        def conv4(cin, cout, split_dim):  # split_dim: 3 = cout, 2 = cin
            spec = [None, None, None, None]
            spec[split_dim] = model_axis
            spare = 2 if split_dim == 3 else 3
            if (cin, cout)[spare - 2] % data_shards == 0:
                spec[spare] = data_axis
            b = P(model_axis) if split_dim == 3 else P()
            return {"w": P(*spec), "b": b}

        return {
            "recog": {
                "conv1": conv4(1, C1, 3),
                "conv2": conv4(C1, C2, 2),
                "dense": col(_FLAT),
                "out_mean": row(n_z),
                "out_logvar": row(n_z),
            },
            "gener": {
                "dense1": col(n_z),
                "dense2": row(_FLAT),
                "convt1": conv4(C2, C1, 3),
                "convt2": conv4(C1, 1, 2),
            },
        }

    return {
        "modalities": tuple(
            conv_tower(m.arch) if m.encoder == "conv" else tower(m)
            for m in cfg.modalities
        )
    }


def _check_tp_fsdp(mesh: Mesh, tc: TrainConfig, cfg: AssocConfig) -> None:
    _check_gspmd_encoders(cfg, "TP×FSDP")
    for ax in (mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS):
        if ax not in mesh.axis_names:
            raise ValueError(
                f"TP×FSDP needs a 2-D ('{mesh_mod.DATA_AXIS}', "
                f"'{mesh_mod.MODEL_AXIS}') mesh — build one with "
                "make_mesh(n, model_axis='model', model_parallel=K); got "
                f"axes {mesh.axis_names}"
            )
    if tc.use_pallas:
        raise ValueError(
            "TP×FSDP runs the jnp model path: Pallas kernels are single-chip "
            "programs and do not split along feature dims. Use "
            "TrainConfig(use_pallas=False), or — if the goal is sharding "
            "STATE while keeping the kernels — the shard_map ZeRO layout "
            "(parallel/zero.py, driver --zero); see the chooser table in "
            "docs/PARALLEL.md."
        )


def shard_tp_fsdp_train_state(
    mesh: Mesh, state: TrainState, cfg: AssocConfig, tc: TrainConfig
) -> TrainState:
    """Re-lay an existing TrainState (fresh or checkpoint-restored) onto the
    combined layout: TP×data-sharded params, matching Adam moments,
    replicated step/rng."""
    _check_tp_fsdp(mesh, tc, cfg)
    n = int(mesh.shape[mesh_mod.DATA_AXIS])
    return shard_train_state_like(mesh, state, tp_fsdp_param_specs(cfg, n), tc)


def init_tp_fsdp_train_state(
    cfg: AssocConfig, tc: TrainConfig, mesh: Mesh, key=None
) -> TrainState:
    _check_tp_fsdp(mesh, tc, cfg)
    n = int(mesh.shape[mesh_mod.DATA_AXIS])
    return shard_train_state_like(
        mesh, init_train_state(cfg, tc, key), tp_fsdp_param_specs(cfg, n), tc
    )


@functools.lru_cache(maxsize=64)
def make_tp_fsdp_train_step(cfg: AssocConfig, tc: TrainConfig, mesh: Mesh):
    """Build the combined step: the plain single-device step body jitted
    with donated TP×FSDP-sharded state — the partitioner inserts every
    collective. Same contract as `make_tp_train_step`; batches via
    `shard_tp_batch` (data axis)."""
    _check_tp_fsdp(mesh, tc, cfg)
    base = make_train_step(cfg, tc, jit=False)

    def step_fn(state: TrainState, xs):
        return base(state, list(xs))

    return jax.jit(step_fn, donate_argnums=(0,))


def tp_fsdp_train_loop(
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
    """Epoch driver for the combined step — `dp_train_loop` with the
    TP×FSDP init/step swapped in; batch shards over the `data` axis."""
    from vae_assoc_tpu.parallel.dp import _epoch_loop

    if state is None:
        state = init_tp_fsdp_train_state(cfg, tc, mesh)
    step_fn = make_tp_fsdp_train_step(cfg, tc, mesh)
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
