"""Fully-sharded data parallelism (ZeRO-style) over the 1-D `('data',)` mesh.

Plain DP (`parallel/dp.py`) replicates parameters and optimizer state on
every chip — the right call for the reference's tiny MLPs, and the config-5
production path. FSDP is the framework's answer when users scale the arch
dicts to the point where a full replica of {params, Adam mu, Adam nu}
(3× param bytes, fp32) no longer fits each chip's HBM: shard all three
over the *same* data axis the batch already shards over, and let XLA
all-gather each weight just-in-time for its matmul and reduce-scatter its
gradient back to the owning shard. Per-chip state memory drops by the mesh
size; the collectives ride ICI.

Like `parallel/tp.py`, this is pure GSPMD — shardings on the existing
pytrees, zero model-code changes, the partitioner provably preserving
semantics. Each weight matrix shards the largest dim the mesh size divides
evenly (stored jax.Arrays require equal shards; leaves with no divisible
dim stay replicated — see `fsdp_param_specs`); biases and the tiny
opt-state scalars stay replicated (sharding a [500] vector over 8 chips
saves nothing and costs a collective). Adam's moments are laid out
explicitly like the weights they track — `zeros_like` constants carry no
data-flow edge, so propagation cannot infer them (see
`tp.shard_opt_state_like`).

DP vs FSDP is a two-line swap:

    state  = init_fsdp_train_state(cfg, tc, mesh)   # vs init_dp_train_state
    step   = make_fsdp_train_step(cfg, tc, mesh)    # vs make_dp_train_step

same mesh, same `shard_batch` inputs, same metrics contract. CLI:
`driver --mesh N --fsdp`.

Verified (tests/test_fsdp.py, 8-virtual-device CPU mesh): 3-step training
trajectory equals the single-device step; every weight/moment shard is a
disjoint 1/8 slice; shardings survive the step; the compiled step HLO
contains gather/reduce collectives; the epoch loop learns.
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
    shard_train_state_like,
)
from vae_assoc_tpu.train.step import TrainState, init_train_state, make_train_step


def fsdp_param_specs(
    cfg: AssocConfig, n_shards: int, axis: str = mesh_mod.DATA_AXIS
) -> dict:
    """PartitionSpec pytree matching `models.assoc.init_assoc`'s params:
    every weight matrix sharded over `axis` on its largest dim that
    `n_shards` divides evenly, biases replicated.

    Divisibility is a hard constraint for *stored* arrays (a concrete
    jax.Array's shards must be equal-shaped; only in-program intermediates
    may be padded by GSPMD), so a weight with no divisible dim falls back
    to replication for that leaf — correctness is unaffected, it just
    keeps a full copy. Users scaling arch dicts for FSDP should size
    hidden/latent dims as multiples of the mesh size (512 rather than 500)
    to shard every layer.
    """

    def lin(n_in: int, n_out: int) -> dict:
        for d in sorted((0, 1), key=lambda d: (n_in, n_out)[d], reverse=True):
            if (n_in, n_out)[d] % n_shards == 0:
                return {"w": P(axis, None) if d == 0 else P(None, axis), "b": P()}
        return {"w": P(), "b": P()}

    def conv(cin: int, cout: int) -> dict:
        # HWIO [3, 3, cin, cout]: shard the larger divisible channel dim
        # (spatial dims are 3 — never divisible); bias replicated.
        for d in sorted((2, 3), key=lambda d: (cin, cout)[d - 2], reverse=True):
            if (cin, cout)[d - 2] % n_shards == 0:
                spec = [None, None, None, None]
                spec[d] = axis
                return {"w": P(*spec), "b": P()}
        return {"w": P(), "b": P()}

    def mlp_stack(first: int, widths) -> dict:
        specs = {}
        prev = first
        for k, width in enumerate(widths, 1):
            specs[f"h{k}"] = lin(prev, width)
            prev = width
        return specs

    def mlp_tower(m) -> dict:
        from vae_assoc_tpu.configs import gener_widths, recog_widths

        arch = m.arch
        n_in, n_z = arch["n_input"], arch["n_z"]
        rw, gw = recog_widths(arch), gener_widths(arch)
        # Conditional models widen the first layer of each net by n_cond
        # (networks.init_mlp_vae_params) — divisibility must be decided on
        # the STORED widths, or the spec would claim a shardable dim the
        # real array cannot split (e.g. 784 % 8 == 0 but 788 % 8 != 0).
        recog = mlp_stack(n_in + m.n_cond, rw)
        recog["out_mean"] = lin(rw[-1], n_z)
        recog["out_logvar"] = lin(rw[-1], n_z)
        gener = mlp_stack(n_z + m.n_cond, gw)
        gener["out"] = lin(gw[-1], n_in)
        return {"recog": recog, "gener": gener}

    def conv_tower(arch) -> dict:
        # Mirrors models.conv.init_conv_vae_params (C1/C2/_FLAT constants).
        from vae_assoc_tpu.models.conv import C1, C2, _FLAT

        n_z = arch["n_z"]
        hr, hg = arch["n_hidden_recog_2"], arch["n_hidden_gener_1"]
        return {
            "recog": {
                "conv1": conv(1, C1),
                "conv2": conv(C1, C2),
                "dense": lin(_FLAT, hr),
                "out_mean": lin(hr, n_z),
                "out_logvar": lin(hr, n_z),
            },
            "gener": {
                "dense1": lin(n_z, hg),
                "dense2": lin(hg, _FLAT),
                "convt1": conv(C2, C1),
                "convt2": conv(C1, 1),
            },
        }

    _check_gspmd_encoders(cfg, "FSDP")  # see tp.tp_param_specs
    return {
        "modalities": tuple(
            conv_tower(m.arch) if m.encoder == "conv" else mlp_tower(m)
            for m in cfg.modalities
        )
    }


def _check_fsdp(mesh: Mesh, tc: TrainConfig, cfg: AssocConfig) -> None:
    if mesh_mod.DATA_AXIS not in mesh.axis_names:
        raise ValueError(
            f"FSDP shards over the '{mesh_mod.DATA_AXIS}' axis; mesh has "
            f"{mesh.axis_names}"
        )
    if tc.use_pallas:
        raise ValueError(
            "GSPMD FSDP runs the jnp model path: the partitioner cannot "
            "split a pallas_call over fan-in-sharded weights. Either use "
            "TrainConfig(use_pallas=False) here, or switch to the shard_map "
            "ZeRO layout (parallel/zero.py, driver --zero), which shards "
            "state identically AND keeps every Pallas kernel."
        )
    _check_gspmd_encoders(cfg, "FSDP")


def shard_fsdp_train_state(
    mesh: Mesh, state: TrainState, cfg: AssocConfig, tc: TrainConfig
) -> TrainState:
    """Re-lay an existing TrainState (fresh or checkpoint-restored) onto the
    mesh with FSDP specs: weights + Adam moments sharded, step/rng/biases
    replicated."""
    _check_fsdp(mesh, tc, cfg)
    n = int(mesh.shape[mesh_mod.DATA_AXIS])
    return shard_train_state_like(mesh, state, fsdp_param_specs(cfg, n), tc)


def init_fsdp_train_state(
    cfg: AssocConfig, tc: TrainConfig, mesh: Mesh, key=None
) -> TrainState:
    _check_fsdp(mesh, tc, cfg)
    n = int(mesh.shape[mesh_mod.DATA_AXIS])
    return shard_train_state_like(
        mesh, init_train_state(cfg, tc, key), fsdp_param_specs(cfg, n), tc
    )


@functools.lru_cache(maxsize=64)
def make_fsdp_train_step(cfg: AssocConfig, tc: TrainConfig, mesh: Mesh):
    """Build the FSDP train step: the plain single-device step body jitted
    with donated FSDP-sharded state — GSPMD inserts the just-in-time weight
    all-gathers (forward and backward) and the gradient reduce-scatters.
    Same contract as `make_dp_train_step`; batches via `mesh.shard_batch`."""
    _check_fsdp(mesh, tc, cfg)
    base = make_train_step(cfg, tc, jit=False)

    def step_fn(state: TrainState, xs):
        return base(state, list(xs))

    return jax.jit(step_fn, donate_argnums=(0,))


def fsdp_train_loop(
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
    """Epoch driver for the FSDP step — `parallel.dp.dp_train_loop` with the
    sharded-state step swapped in."""
    from vae_assoc_tpu.parallel.dp import _epoch_loop

    if state is None:
        state = init_fsdp_train_state(cfg, tc, mesh)
    step_fn = make_fsdp_train_step(cfg, tc, mesh)
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
