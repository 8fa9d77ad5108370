"""Pipeline parallelism over deep MLP towers — GPipe via shard_map + ppermute.

The reference trains depth-2 towers on one device; PP was N/A-by-design
(SURVEY.md §2.2) until the arch-dict API was unfrozen in depth
(configs.validate_arch: contiguous ``n_hidden_*_k`` keys). With deep towers
a real pipeline axis exists, and this module is its TPU-native layout:

- **Mesh**: a 1-D ``('stage',)`` axis of S devices. Stages communicate
  activations over ICI with `jax.lax.ppermute` — the collective whose wire
  pattern IS a pipeline (neighbor shifts), exactly as the scaling playbook
  writes pipelining by hand.
- **Partition**: each net (recognition/generator of each modality) keeps
  its boundary layers replicated — ``h1`` (the fan-in layer, whose input
  width differs from the hidden width) and the output heads — and
  stage-shards the homogeneous middle layers ``h2..hL`` as ONE stacked leaf
  ``[S, (L-1)/S, W, W]`` with spec ``P('stage')``. Per-chip weight memory
  for the middle (the bulk of a deep tower) drops by S.
- **Schedule**: classic GPipe fill/drain in SPMD form. The global batch is
  cut into M microbatches; a `lax.scan` runs M+S−1 ticks where every device
  applies its local layer block to the activation it holds, then the ring
  shifts one stage forward (`ppermute`). Stage 0 ingests microbatch t;
  stage S−1 captures microbatch t−(S−1). The captured outputs are
  broadcast to all stages with one masked `psum`, after which the heads,
  sampling, and loss run replicated. `jax.grad` through scan+ppermute+psum
  yields the reverse pipeline automatically (ppermute transposes to the
  reverse permutation) — no hand-written backward schedule.

Pipeline-bubble accounting is the textbook (S−1)/(M+S−1); pick
``n_micro ≥ 2·S`` to keep the bubble under a third. Like TP/FSDP, this
layout exists for users who scale the arch dicts — at reference scale
(depth 2) there is no middle to pipeline and `check_pp` says so loudly.

**DP×PP** composes on a 2-D ``('stage', 'data')`` mesh
(``make_pp_mesh(S, data_parallel=D)``): the batch shards over 'data'
(each pipeline replica runs the ring on its local shard), the middles
shard over 'stage', and the gradient sync is `train.step._one_step`'s
loss-pmean over the data axis — trajectories match the pure-DP step
exactly (same per-data-shard ε fold).

Gradient semantics are exact, not approximate: every stage computes the
SAME full-batch loss from the psum-broadcast ring outputs (the psum both
sums away the non-last stages' masked zeros and makes the value's vma
stage-invariant), and AD through the masked ingestion/capture gives each
weight precisely its true cotangent — replicated params' grads come back
invariant, stage shards' grads stage-local, with no hand-written gradient
collective. Trajectories match the single-device step to float tolerance
(tests/test_pp.py).

The fused Pallas stack kernels run whole towers in one launch and therefore
cannot be cut at stage boundaries; `use_pallas` is rejected loudly (the
same kernels-vs-GSPMD trade documented for tp/fsdp — the boundary and ring
matmuls here are plain XLA dots with the same `matmul_precision` policy).

Interop mirrors `parallel/zero.py`: `shard_pp_train_state` /
`gather_pp_train_state` convert between this layout and the plain
TrainState, so checkpoints, evaluation, and serving round-trip freely.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_assoc_tpu.configs import (
    AssocConfig,
    TRANSFER_FNS,
    TrainConfig,
    gener_widths,
    recog_widths,
)
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.models import networks, vae as vae_mod
from vae_assoc_tpu.ops import losses
from vae_assoc_tpu.train import step as step_mod
from vae_assoc_tpu.train.step import TrainState, init_train_state, make_optimizer

STAGE_AXIS = "stage"


def make_pp_mesh(
    n_stages: int | None = None, *, data_parallel: int = 1, devices=None
) -> Mesh:
    """Pipeline mesh: 1-D ``('stage',)``, or 2-D ``('stage', 'data')`` when
    ``data_parallel > 1`` (DP×PP — S pipeline replicas of D data shards;
    uses the first S·D devices). Data is the MINOR axis so each pipeline's
    data shards are device-contiguous (on real slices: the per-tick psum
    gradient/broadcast traffic rides adjacent ICI links; the once-per-tick
    ppermute hop takes the longer stride)."""
    import numpy as np

    from vae_assoc_tpu.parallel.mesh import DATA_AXIS, make_mesh

    if data_parallel <= 1:
        return make_mesh(n_stages, data_axis=STAGE_AXIS, devices=devices)
    if n_stages is None:
        raise ValueError("data_parallel > 1 needs an explicit n_stages")
    if devices is None:
        devices = jax.devices()
    need = n_stages * data_parallel
    if need > len(devices):
        raise ValueError(
            f"PP×DP needs {n_stages}×{data_parallel}={need} devices, "
            f"only {len(devices)} available"
        )
    grid = np.asarray(devices[:need]).reshape(n_stages, data_parallel)
    return Mesh(grid, (STAGE_AXIS, DATA_AXIS))


def _mesh_axes(mesh: Mesh):
    """(n_stages, data_axis_name_or_None) — validates the mesh shape."""
    from vae_assoc_tpu.parallel.mesh import DATA_AXIS

    if mesh.axis_names == (STAGE_AXIS,):
        data_axis = None
    elif mesh.axis_names == (STAGE_AXIS, DATA_AXIS):
        data_axis = DATA_AXIS
    else:
        raise ValueError(
            f"PP runs over a ('{STAGE_AXIS}',) or ('{STAGE_AXIS}', "
            f"'{DATA_AXIS}') mesh (make_pp_mesh); got axes {mesh.axis_names}"
        )
    s = int(mesh.shape[STAGE_AXIS])
    if s < 2:
        raise ValueError(f"PP needs >= 2 stages, got {s} (use the plain step)")
    return s, data_axis


def _n_stages(mesh: Mesh) -> int:
    return _mesh_axes(mesh)[0]


def _net_widths(m, net: str):
    return recog_widths(m.arch) if net == "recog" else gener_widths(m.arch)


def check_pp(cfg: AssocConfig, tc: TrainConfig, n_stages: int) -> None:
    """Reject configurations the pipeline layout cannot express — loudly,
    with the reason and the workaround (the convention set by tp/fsdp)."""
    if tc.use_pallas:
        raise ValueError(
            "PP cannot run the fused Pallas stack kernels: they execute a "
            "whole tower per launch and have no stage boundary to cut at. "
            "Use use_pallas=False here (the ring matmuls are plain XLA MXU "
            "dots), or parallel/zero.py to shard state while keeping the "
            "kernels."
        )
    for m in cfg.modalities:
        if m.encoder != "mlp":
            raise ValueError(
                f"PP covers MLP towers only; modality {m.name!r} uses "
                f"encoder={m.encoder!r}. Use DP/ZeRO for conv towers."
            )
        for net in ("recog", "gener"):
            widths = _net_widths(m, net)
            depth = len(widths)
            if depth < 1 + n_stages:
                raise ValueError(
                    f"PP over {n_stages} stages needs depth >= {1 + n_stages} "
                    f"hidden layers per net (h1 stays replicated; h2..hL "
                    f"split across stages); {m.name}/{net} has {depth}. "
                    "Deepen the arch dict (configs.validate_arch) or use "
                    "DP/ZeRO."
                )
            if len(set(widths)) != 1:
                raise ValueError(
                    f"PP pipelines a homogeneous middle: all hidden widths "
                    f"of {m.name}/{net} must be equal, got {widths}"
                )
            if (depth - 1) % n_stages:
                raise ValueError(
                    f"{m.name}/{net}: {depth - 1} pipelined layers (h2..h{depth}) "
                    f"not divisible by {n_stages} stages"
                )


def _resolve_n_micro(
    tc: TrainConfig, n_stages: int, n_micro: int | None, n_data: int = 1
) -> int:
    m = 2 * n_stages if n_micro is None else int(n_micro)
    if m < n_stages:
        raise ValueError(
            f"n_micro={m} < {n_stages} stages leaves devices permanently "
            "idle; use at least S (>= 2S recommended: bubble = (S-1)/(M+S-1))"
        )
    if tc.batch_size % n_data:
        raise ValueError(
            f"global batch {tc.batch_size} not divisible by the "
            f"{n_data}-way data axis"
        )
    local = tc.batch_size // n_data
    if local % m:
        raise ValueError(
            f"per-data-shard batch {local} "
            f"(= {tc.batch_size}/{n_data}) not divisible by n_micro={m}"
        )
    return m


# ---------------------------------------------------------------------------
# Layout conversion: plain TrainState ⇄ PP-stacked TrainState
# ---------------------------------------------------------------------------


def _stack_net(net: dict, n_stages: int) -> dict:
    """{"h1".."hL", heads...} → {"h1", "mid": {w:[S,nper,W,W], b:[S,nper,W]},
    heads...} — elementwise-identical storage, reshaped for P('stage')."""
    layers = networks.hidden_layers(net)
    mid = layers[1:]
    nper = len(mid) // n_stages
    w = jnp.stack([l["w"] for l in mid]).reshape(n_stages, nper, *mid[0]["w"].shape)
    b = jnp.stack([l["b"] for l in mid]).reshape(n_stages, nper, *mid[0]["b"].shape)
    out = {k: v for k, v in net.items() if not _is_hidden_key(k)}
    out["h1"] = layers[0]
    out["mid"] = {"w": w, "b": b}
    return out


def _unstack_net(pnet: dict, n_stages: int) -> dict:
    w, b = pnet["mid"]["w"], pnet["mid"]["b"]
    nper = w.shape[1]
    w = w.reshape(n_stages * nper, *w.shape[2:])
    b = b.reshape(n_stages * nper, *b.shape[2:])
    out = {k: v for k, v in pnet.items() if k not in ("mid",)}
    for i in range(n_stages * nper):
        out[f"h{i + 2}"] = {"w": w[i], "b": b[i]}
    return out


def _is_hidden_key(k: str) -> bool:
    return k.startswith("h") and k[1:].isdigit()


def _map_nets(params: dict, fn) -> dict:
    return {
        "modalities": tuple(
            {net: fn(p[net]) for net in ("recog", "gener")}
            for p in params["modalities"]
        )
    }


def _pp_params(params: dict, n_stages: int) -> dict:
    return _map_nets(params, lambda net: _stack_net(net, n_stages))


def _plain_params(pp_params: dict, n_stages: int) -> dict:
    return _map_nets(pp_params, lambda net: _unstack_net(net, n_stages))


def _pp_param_specs(cfg: AssocConfig, n_stages: int) -> dict:
    """Spec tree matching `_pp_params`' structure: 'mid' leaves stage-
    sharded on their leading axis, everything else replicated."""
    del n_stages

    def net_spec(m, net):
        widths = _net_widths(m, net)
        spec = {"h1": {"w": P(), "b": P()},
                "mid": {"w": P(STAGE_AXIS), "b": P(STAGE_AXIS)}}
        heads = ("out_mean", "out_logvar") if net == "recog" else ("out",)
        for h in heads:
            spec[h] = {"w": P(), "b": P()}
        del widths
        return spec

    return {
        "modalities": tuple(
            {net: net_spec(m, net) for net in ("recog", "gener")}
            for m in cfg.modalities
        )
    }


def _pp_opt_spec(cfg: AssocConfig, tc: TrainConfig, n_stages: int, opt):
    """Spec tree for the optimizer state on the PP layout: params-like
    leaves (Adam moments, EMA, accumulators) inherit their param's spec,
    scalars replicate — discovered by `optax.tree_map_params` exactly as
    `parallel/zero.py` does."""
    pspec = _pp_param_specs(cfg, n_stages)
    tmpl = jax.eval_shape(
        lambda: _pp_params(assoc_mod.init_assoc(jax.random.key(0), cfg), n_stages)
    )
    return optax.tree_map_params(
        opt,
        lambda _, s: s,
        jax.eval_shape(opt.init, tmpl),
        pspec,
        transform_non_params=lambda _: P(),
    )


def _convert_opt_state(opt_state_src, opt, src_tmpl, dst_tmpl, convert):
    """Rebuild an optimizer state around a structure-CHANGING params
    transform (plain h2..hL dicts ⇄ one stacked 'mid' leaf).

    `optax.tree_map_params` is leaf-wise, so it cannot restack across
    leaves. Instead: collect the source state's params-like leaves in walk
    order, regroup them into params-shaped subtrees (each has exactly
    `src_tmpl`'s treedef — mu, nu, EMA, accumulators, one subtree each),
    apply `convert` to each whole subtree, and emit the converted leaves —
    plus the source's non-params leaves (counts, schedule state) — into a
    destination-structured skeleton from `jax.eval_shape(opt.init,
    dst_tmpl)`. Walk order is consistent between the two structures because
    they differ only inside the params-shaped subtrees."""
    src_td = jax.tree.structure(src_tmpl)
    p_leaves, np_leaves = [], []
    optax.tree_map_params(
        opt,
        lambda x: (p_leaves.append(x), x)[1],
        opt_state_src,
        transform_non_params=lambda x: (np_leaves.append(x), x)[1],
    )
    n = src_td.num_leaves
    if len(p_leaves) % n:
        raise ValueError(
            f"optimizer state holds {len(p_leaves)} params-like leaves, "
            f"not a multiple of the {n}-leaf param tree — structure drift?"
        )
    converted = []
    for i in range(0, len(p_leaves), n):
        sub = jax.tree.unflatten(src_td, p_leaves[i : i + n])
        converted.extend(jax.tree.leaves(convert(sub)))
    it_p, it_np = iter(converted), iter(np_leaves)
    skel = jax.eval_shape(opt.init, dst_tmpl)
    return optax.tree_map_params(
        opt,
        lambda _: next(it_p),
        skel,
        transform_non_params=lambda _: next(it_np),
    )


def shard_pp_train_state(
    mesh: Mesh, state: TrainState, cfg: AssocConfig, tc: TrainConfig
) -> TrainState:
    """Plain TrainState (fresh or checkpoint-restored) → PP layout: middle
    layers (and their Adam moments/EMA) restacked and placed stage-sharded,
    boundary layers and optimizer scalars replicated. Elementwise-identical
    storage, so Adam on the stacked leaves is bitwise the same arithmetic."""
    from vae_assoc_tpu.parallel.tp import _placer

    n = _n_stages(mesh)
    check_pp(cfg, tc, n)
    opt = make_optimizer(tc)
    put = _placer(mesh)
    pspec = _pp_param_specs(cfg, n)
    params = jax.tree.map(
        lambda p, s: put(p, NamedSharding(mesh, s)),
        _pp_params(state.params, n),
        pspec,
    )
    plain_tmpl = jax.eval_shape(lambda: state.params)
    pp_tmpl = jax.eval_shape(lambda: _pp_params(state.params, n))
    opt_state = _convert_opt_state(
        state.opt_state, opt, plain_tmpl, pp_tmpl,
        lambda sub: _pp_params(sub, n),
    )
    ospec = _pp_opt_spec(cfg, tc, n, opt)
    opt_state = jax.tree.map(
        lambda x, s: put(x, NamedSharding(mesh, s)), opt_state, ospec
    )
    repl = NamedSharding(mesh, P())
    return TrainState(put(state.step, repl), params, opt_state, put(state.rng, repl))


def gather_pp_train_state(
    pstate: TrainState, cfg: AssocConfig, tc: TrainConfig, n_stages: int
) -> TrainState:
    """Inverse of `shard_pp_train_state`: unstack the middle layers back to
    h2..hL dicts. The stored arrays are logically whole (sharded
    jax.Arrays), so this is pure reshaping — the result checkpoints,
    evaluates, and serves exactly like any TrainState."""
    opt = make_optimizer(tc)
    params = _plain_params(pstate.params, n_stages)
    pp_tmpl = jax.eval_shape(lambda: pstate.params)
    plain_tmpl = jax.eval_shape(lambda: params)
    opt_state = _convert_opt_state(
        pstate.opt_state, opt, pp_tmpl, plain_tmpl,
        lambda sub: _plain_params(sub, n_stages),
    )
    return TrainState(pstate.step, params, opt_state, pstate.rng)


def init_pp_train_state(
    cfg: AssocConfig, tc: TrainConfig, mesh: Mesh, key=None
) -> TrainState:
    return shard_pp_train_state(mesh, init_train_state(cfg, tc, key), cfg, tc)


# ---------------------------------------------------------------------------
# The pipelined forward
# ---------------------------------------------------------------------------


def _ring(mid_w, mid_b, h0, n_stages: int, n_micro: int, transfer, cd):
    """Run [B, W] activations through the stage-sharded middle layers.

    `mid_w`/`mid_b` are THIS stage's local block ([nper, W, W] / [nper, W]);
    `h0` holds the (replicated-value) post-h1 activations. GPipe fill/drain:
    M + S − 1 scan ticks; each tick every stage applies its block to the
    activation it holds, stage 0 ingests microbatch t, stage S−1 captures
    microbatch t−(S−1), and one `ppermute` shifts the ring. Ticks past M
    re-ingest the last microbatch as pipeline filler; its results are never
    captured (the masked update below), so they contribute exactly zero to
    the value AND the gradient. The masked `psum` at the end broadcasts the
    last stage's captures to every stage — output values (and vma type) are
    stage-invariant, so heads/sampling/loss run replicated after this."""
    stage = jax.lax.axis_index(STAGE_AXIS)
    b, w = h0.shape
    mb = b // n_micro
    feeds = h0.reshape(n_micro, mb, w)
    nper = mid_w.shape[0]
    ticks = n_micro + n_stages - 1

    def block(h):
        for i in range(nper):  # static unroll — nper is a layout constant
            h = transfer(networks._linear({"w": mid_w[i], "b": mid_b[i]}, h, cd))
        return h

    def body(carry, t):
        buf, out = carry
        feed = jax.lax.dynamic_index_in_dim(
            feeds, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
        )
        h = block(jnp.where(stage == 0, feed, buf))
        m = t - (n_stages - 1)
        upd = jax.lax.dynamic_update_slice(
            out, h[None].astype(out.dtype), (jnp.maximum(m, 0), 0, 0)
        )
        out = jnp.where(jnp.logical_and(stage == n_stages - 1, m >= 0), upd, out)
        buf = jax.lax.ppermute(
            h, STAGE_AXIS, [(d, (d + 1) % n_stages) for d in range(n_stages)]
        )
        return (buf, out), None

    # The carry is stage-varying from tick 1 on (it holds stage-dependent
    # activations) and, under DP×PP, data-varying too (the batch is a data
    # shard); the literal-zeros initial carry must be promoted to the same
    # vma type or the scan rejects the carry (shard_map check_vma). Promote
    # to stage ∪ h0's axes via the shared kernel helper.
    from vae_assoc_tpu.kernels.mlp import _pvary_like

    ref = jax.lax.pcast(
        h0, tuple({STAGE_AXIS} - set(jax.typeof(h0).vma)), to="varying"
    )
    carry0 = tuple(
        _pvary_like(
            [jnp.zeros((mb, w), h0.dtype), jnp.zeros((n_micro, mb, w), h0.dtype)],
            ref,
        )
    )
    (_, out), _ = jax.lax.scan(body, carry0, jnp.arange(ticks))
    out = jax.lax.psum(jnp.where(stage == n_stages - 1, out, 0.0), STAGE_AXIS)
    return out.reshape(b, w)


def _pp_vae_forward(p, x, mcfg, *, key, cd, n_stages, n_micro, cond):
    """One modality's encoder → sample → decoder with pipelined middles.
    Boundary layers (h1, heads, out) run replicated — exactly
    `networks.encode_mlp`/`decode_mlp` math; only h2..hL ride the ring."""
    transfer = TRANSFER_FNS[mcfg.transfer]
    cond = vae_mod.prepare_cond(cond, mcfg, x.shape[0])
    x_in = x if cond is None else jnp.concatenate(
        [jnp.asarray(x, jnp.float32), cond], axis=1
    )
    r = p["recog"]
    h = transfer(networks._linear(r["h1"], x_in, cd))
    h = _ring(r["mid"]["w"][0], r["mid"]["b"][0], h, n_stages, n_micro, transfer, cd)
    mu = networks._linear(r["out_mean"], h, cd)
    lv = networks._linear(r["out_logvar"], h, cd)
    # Same ε stream on every stage (the batch is replicated, not sharded) —
    # trajectories match the single-device step exactly.
    from vae_assoc_tpu.ops import sampling

    z = sampling.reparameterize(mu, lv, key=key)
    g = p["gener"]
    z_in = z if cond is None else jnp.concatenate([z, cond], axis=1)
    hg = transfer(networks._linear(g["h1"], z_in, cd))
    hg = _ring(g["mid"]["w"][0], g["mid"]["b"][0], hg, n_stages, n_micro, transfer, cd)
    recon = networks._linear(g["out"], hg, cd)
    return vae_mod.VAEOutputs(mu, lv, z, recon)


def _pp_loss(pp_params, xs, cfg, tc, key, n_stages, n_micro, data_axis=None):
    """The joint objective on the PP layout — the jnp branch of
    `models.assoc.assoc_loss_fn` with the pipelined per-modality forward."""
    xs, cond = assoc_mod.split_cond(xs, cfg)
    keys = jax.random.split(key, len(cfg.modalities))
    outs = [
        _pp_vae_forward(
            p, x, m, key=k, cd=tc.compute_dtype,
            n_stages=n_stages, n_micro=n_micro, cond=cond,
        )
        for p, x, m, k in zip(pp_params["modalities"], xs, cfg.modalities, keys)
    ]
    metrics = {}
    total = jnp.float32(0.0)
    for m, x, out in zip(cfg.modalities, xs, outs):
        terms = vae_mod.vae_loss(out, x, m, parity_mode=tc.parity_mode)
        metrics[f"recon_{m.name}"] = terms["recon"]
        metrics[f"kl_{m.name}"] = terms["kl"]
        total = total + terms["recon"] + terms["kl"]
    assoc = jnp.mean(
        assoc_mod._assoc_per_sample(outs, cfg, data_axis=data_axis)
    )
    metrics["assoc"] = assoc
    total = total + jnp.float32(cfg.assoc_lambda) * assoc
    metrics["total"] = total
    return total, metrics


# ---------------------------------------------------------------------------
# The step
# ---------------------------------------------------------------------------


def _pp_global_norm(tree):
    """Global L2 norm when some leaves are stage-local shards: psum the
    stage-varying leaves' sum-of-squares (each stage holds ITS block's
    gradient), count invariant leaves once."""
    inv = jnp.float32(0.0)
    var = jnp.float32(0.0)
    for g in jax.tree.leaves(tree):
        ss = jnp.sum(jnp.square(g)).astype(jnp.float32)
        if STAGE_AXIS in jax.typeof(g).vma:
            var = var + ss
        else:
            inv = inv + ss
    return jnp.sqrt(inv + jax.lax.psum(var, STAGE_AXIS))


def _clip_by_global_norm_pp(max_norm: float):
    """`optax.clip_by_global_norm` over the mixed replicated/stage-sharded
    gradient — a per-device norm would clip each stage's block by a
    different factor (see zero._clip_by_global_norm_sharded)."""

    def update_fn(updates, state, params=None):
        del params
        g_norm = _pp_global_norm(updates)
        clipped = jax.tree.map(
            lambda t: jnp.where(
                g_norm < max_norm, t, (t / g_norm.astype(t.dtype)) * max_norm
            ),
            updates,
        )
        return clipped, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def _pp_optimizer(tc: TrainConfig):
    clip = None
    if tc.grad_clip_norm > 0:
        clip = _clip_by_global_norm_pp(tc.grad_clip_norm)
    return make_optimizer(tc, clip_transform=clip)


def _pp_one_step(state: TrainState, xs, cfg, tc, opt, n_stages, n_micro,
                 data_axis=None):
    """Per-stage step body. ε derivation matches `train.step._one_step`
    WITHOUT the stage fold: the batch is replicated over stages (every stage
    computes the same local-batch loss), so the stream must equal the
    single-device one. Under DP×PP the data-axis fold IS applied — exactly
    `_one_step`'s, so trajectories match the pure-DP step."""
    rng, step_key = jax.random.split(state.rng)
    step_key = jax.random.fold_in(step_key, state.step)
    if data_axis is not None:
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(data_axis))

    def loss_fn(params):
        total, metrics = _pp_loss(params, xs, cfg, tc, step_key, n_stages,
                                  n_micro, data_axis)
        total, metrics = step_mod.apply_objective_weights(
            total, metrics, cfg, tc, state.step
        )
        if data_axis is not None:
            # DP gradient sync, exactly as train.step._one_step: pmean the
            # scalar loss over the data axis BEFORE grad — the vma-typed
            # transpose then all-reduces every cotangent over data (mid
            # shards stay stage-local, as with the stage axis below).
            total = jax.lax.pmean(total, data_axis)
        return total, metrics

    with jax.named_scope("pp_fwd_bwd"):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
    if data_axis is not None:
        # Metrics are data-shard-local; average so the logged loss equals
        # the global-batch loss (they are already stage-invariant).
        metrics = jax.lax.pmean(metrics, data_axis)
    # The loss is stage-invariant (the ring output is psum-broadcast), so
    # replicated params' grads come back invariant and the mid shards'
    # grads come back stage-local — no hand-written gradient collective.
    metrics["grad_norm"] = _pp_global_norm(grads)
    with jax.named_scope("adam_update"):
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
    return TrainState(state.step + 1, params, opt_state, rng), metrics


@functools.lru_cache(maxsize=64)
def make_pp_train_step(
    cfg: AssocConfig, tc: TrainConfig, mesh: Mesh, *, n_micro: int | None = None
):
    """Build the pipeline-parallel train step.

    Returns ``step_fn(pstate, xs) -> (pstate', metrics)`` with the
    `make_dp_train_step` contract, except batch placement follows the mesh:
    on a 1-D ``('stage',)`` mesh batches are REPLICATED
    (`parallel.mesh.replicate`) — the parallel axis is tower depth, not the
    batch; on a 2-D ``('stage', 'data')`` mesh (DP×PP,
    ``make_pp_mesh(S, data_parallel=D)``) they are batch-dim sharded over
    'data' (`shard_pp_batch`) and each pipeline replica runs the ring on
    its local shard with one loss-pmean gradient sync over the data axis.
    State must be in the PP layout (`init_pp_train_state` /
    `shard_pp_train_state`) and is donated. ``n_micro`` (default 2·S) sets
    the GPipe microbatch count per data shard; the bubble fraction is
    (S−1)/(n_micro+S−1)."""
    n, data_axis = _mesh_axes(mesh)
    check_pp(cfg, tc, n)
    n_data = int(mesh.shape[data_axis]) if data_axis else 1
    m = _resolve_n_micro(tc, n, n_micro, n_data)
    opt = _pp_optimizer(tc)
    spc = tc.steps_per_call

    def local_step(state: TrainState, xs):
        if spc == 1:
            return _pp_one_step(state, list(xs), cfg, tc, opt, n, m, data_axis)

        def body(carry, batch):
            return _pp_one_step(carry, list(batch), cfg, tc, opt, n, m,
                                data_axis)

        return jax.lax.scan(body, state, tuple(xs))

    state_spec = TrainState(
        P(), _pp_param_specs(cfg, n), _pp_opt_spec(cfg, tc, n, opt), P()
    )
    if data_axis is None:
        xs_spec = P()
    else:
        xs_spec = P(None, data_axis) if spc > 1 else P(data_axis)
    step_fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_spec, xs_spec),
        out_specs=(state_spec, P()),
    )
    return jax.jit(step_fn, donate_argnums=(0,))


def shard_pp_batch(mesh: Mesh, xs, *, leading_scan_axis: bool = False,
                   batch_axes=None):
    """Place batch arrays for the PP step: replicated on a 1-D stage mesh,
    batch-dim sharded over 'data' (and stage-replicated) on a DP×PP mesh.

    ``batch_axes`` exists for `shard_batch` signature compatibility only;
    the PP mesh owns its batch placement, so any value other than the
    mesh's own data axis is rejected rather than silently ignored."""
    _, data_axis = _mesh_axes(mesh)
    if batch_axes is not None and batch_axes != data_axis:
        raise ValueError(
            f"shard_pp_batch derives batch placement from the PP mesh "
            f"(data axis: {data_axis!r}); got batch_axes={batch_axes!r}"
        )
    if data_axis is None:
        from vae_assoc_tpu.parallel.mesh import replicate

        return replicate(mesh, tuple(jnp.asarray(x) for x in xs))
    from vae_assoc_tpu.parallel.mesh import shard_batch

    return shard_batch(mesh, xs, leading_scan_axis=leading_scan_axis,
                       batch_axes=data_axis)


def pp_train_loop(
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
    n_micro: int | None = None,
):
    """Epoch driver for the PP step — `parallel.dp.dp_train_loop` with
    PP batch placement: replicated on a 1-D stage mesh (the pipeline
    parallelizes depth, not the batch), data-axis sharded under DP×PP."""
    from vae_assoc_tpu.parallel.dp import _epoch_loop

    if state is None:
        state = init_pp_train_state(cfg, tc, mesh)
    step_fn = make_pp_train_step(cfg, tc, mesh, n_micro=n_micro)
    _, data_axis = _mesh_axes(mesh)
    return _epoch_loop(
        cfg,
        tc,
        data,
        mesh,
        step_fn,
        state,
        shard_fn=shard_pp_batch,
        n_batch_dev=int(mesh.shape[data_axis]) if data_axis else 1,
        epochs=epochs,
        display_step=display_step,
        on_metrics=on_metrics,
        shuffle=shuffle,
    )
