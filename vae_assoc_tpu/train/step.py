"""The single jitted train step.

Replaces the reference's `partial_fit` → `sess.run([optimizer, cost],
feed_dict=...)` host round-trip (SURVEY.md §3.1-3.2): one compiled XLA
program computes forward, backward, and the Adam update entirely on device,
with buffer donation so params/opt_state update in place in HBM.

`steps_per_call > 1` fuses N steps into one `lax.scan` over a pre-staged
batch stack — the host dispatches once per N steps, which is what makes a
tiny MLP model TPU-efficient (SURVEY.md §7 "Tiny-model TPU efficiency").
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from vae_assoc_tpu.configs import AssocConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod


class TrainState(NamedTuple):
    step: jax.Array  # [] int32
    params: dict
    opt_state: optax.OptState
    rng: jax.Array  # PRNG key for the reparameterization stream


def lr_schedule_fn(tc: TrainConfig):
    """Learning-rate schedule from TrainConfig — float or optax schedule.

    Returns the plain float for the default (constant, no warmup) so the
    optimizer state tree — and therefore existing checkpoints — stay
    byte-identical to the reference-parity fixed-LR Adam.
    """
    if tc.lr_schedule == "constant":
        if tc.warmup_steps <= 0:
            return tc.learning_rate
        main = optax.constant_schedule(tc.learning_rate)
    elif tc.lr_schedule == "cosine":
        if tc.decay_steps <= 0:
            raise ValueError(
                "lr_schedule='cosine' needs decay_steps > 0 (the decay "
                f"horizon in optimizer updates), got {tc.decay_steps}"
            )
        main = optax.cosine_decay_schedule(
            tc.learning_rate, tc.decay_steps, alpha=tc.lr_end_factor
        )
    else:
        raise ValueError(
            f"unknown lr_schedule {tc.lr_schedule!r}; "
            "expected 'constant' or 'cosine'"
        )
    if tc.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, tc.learning_rate, tc.warmup_steps)
        return optax.join_schedules([warm, main], [tc.warmup_steps])
    return main


class EmaState(NamedTuple):
    """State of the `_ema_of_params` chain stage.

    count: [] int32 — optimizer updates folded into the average so far.
    ema: params-shaped accumulator. Zero-initialized (like Adam's moments,
      so `optax.tree_map_params` placeholder discovery marks it as a
      params leaf and every GSPMD/ZeRO re-layout shards it like the param
      it tracks) and debiased on read by :func:`ema_params`.
    """

    count: jax.Array
    ema: Any


def _ema_of_params(decay: float) -> optax.GradientTransformation:
    """Final optimizer-chain stage tracking an EMA of the *post-update*
    params: ema ← decay·ema + (1−decay)·(params + updates). Placed after
    Adam (updates there are the final increments) and inside MultiSteps
    (so with gradient accumulation it advances once per real optimizer
    update, seeing exactly the params that will be applied)."""

    def init(params):
        return EmaState(jnp.int32(0), jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("the EMA stage needs params (optax passes "
                             "them through chain/MultiSteps automatically)")
        new_p = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_p
        )
        return updates, EmaState(state.count + 1, ema)

    return optax.GradientTransformation(init, update)


def ema_params(tc: TrainConfig, opt_state):
    """Debiased EMA parameter tree from the optimizer state, or None when
    ``tc.ema_decay == 0``. Before the first optimizer update (count == 0)
    the EMA is the zero tree — callers evaluate after training, where this
    never arises, and :func:`eval_params` falls back to the live params."""
    if tc.ema_decay <= 0:
        return None
    leaves = jax.tree.leaves(
        opt_state, is_leaf=lambda s: isinstance(s, EmaState)
    )
    states = [s for s in leaves if isinstance(s, EmaState)]
    if len(states) != 1:
        raise ValueError(
            f"expected exactly one EmaState in the optimizer state, found "
            f"{len(states)} — was this opt_state built with ema_decay > 0?"
        )
    es = states[0]
    corr = 1.0 - jnp.float32(tc.ema_decay) ** es.count.astype(jnp.float32)
    corr = jnp.where(es.count > 0, corr, jnp.float32(1.0))
    return jax.tree.map(lambda e: e / corr, es.ema)


def eval_params(tc: TrainConfig, state: "TrainState"):
    """The parameter tree evaluation should use: the debiased EMA params
    when ``ema_decay > 0`` and at least one optimizer update has run, else
    the live training params."""
    if tc.ema_decay <= 0:
        return state.params
    ema = ema_params(tc, state.opt_state)
    leaves = jax.tree.leaves(
        state.opt_state, is_leaf=lambda s: isinstance(s, EmaState)
    )
    count = next(s for s in leaves if isinstance(s, EmaState)).count
    if int(jax.device_get(count)) == 0:
        return state.params
    return ema


def make_optimizer(
    tc: TrainConfig, *, clip_transform=None
) -> optax.GradientTransformation:
    """The ONE optimizer source: Adam with the reference's (TF-default)
    hyperparameters, optionally extended with global-norm gradient
    clipping, an LR schedule, and gradient accumulation (configs.py
    TrainConfig docstring). Every training path — single-device, fused
    scan, DP shard_map, TP/FSDP GSPMD, shard_map ZeRO — builds its update
    from here, so the features compose with all of them by construction.

    clip_transform: optional replacement for the `grad_clip_norm` stage
    (used by `parallel.zero` to psum the norm across gradient shards);
    chain position — and therefore accumulation×clip semantics — is
    identical either way. Ignored when grad_clip_norm is 0."""
    adam = optax.adam(
        lr_schedule_fn(tc), b1=tc.adam_b1, b2=tc.adam_b2, eps=tc.adam_eps
    )
    if tc.grad_clip_norm > 0:
        clip = (
            clip_transform
            if clip_transform is not None
            else optax.clip_by_global_norm(tc.grad_clip_norm)
        )
        opt = optax.chain(clip, adam)
    else:
        opt = adam
    if tc.ema_decay > 0:
        if not 0.0 < tc.ema_decay < 1.0:
            raise ValueError(f"ema_decay must be in (0, 1), got {tc.ema_decay}")
        # Last in the chain: Adam's output is the final increment, so the
        # EMA sees exactly the params apply_updates will produce. Inside
        # MultiSteps: advances once per real optimizer update.
        opt = optax.chain(opt, _ema_of_params(tc.ema_decay))
    if tc.accum_steps > 1:
        # MultiSteps averages k micro-batch grads then applies ONE Adam
        # update; params (and the inner schedule count) hold still on
        # non-boundary steps. TrainState.step keeps counting micro-steps.
        opt = optax.MultiSteps(opt, every_k_schedule=tc.accum_steps)
    return opt


def init_train_state(cfg: AssocConfig, tc: TrainConfig, key=None) -> TrainState:
    if key is None:
        key = jax.random.key(tc.seed)
    k_init, k_train = jax.random.split(key)
    params = assoc_mod.init_assoc(k_init, cfg)
    opt_state = make_optimizer(tc).init(params)
    return TrainState(jnp.int32(0), params, opt_state, k_train)


def _total_with_lambda(metrics: dict, cfg: AssocConfig, lam, kl_w=None) -> jax.Array:
    """Rebuild the joint objective from its logged terms with RUNTIME
    weights: Σ_k (recon_k + kl_w·kl_k) + lam · assoc. Exact gradients on
    every kernel path — the logged terms are differentiable kernel outputs
    and the total is linear in them. Used by the vmapped sweep path
    (train/sweep.py, per-model λ in an array instead of one program per λ)
    and by the β-VAE/annealing knobs (apply_objective_weights); the
    static path in assoc_loss_fn stays byte-identical (parity surface,
    docs/PARITY.md)."""
    total = jnp.float32(0.0)
    for m in cfg.modalities:
        kl = metrics[f"kl_{m.name}"]
        if kl_w is not None:
            kl = kl_w * kl
        total = total + metrics[f"recon_{m.name}"] + kl
    return total + jnp.float32(lam) * metrics["assoc"]


def objective_weights(tc: TrainConfig, step):
    """Runtime (kl_weight, assoc_scale) of the annealed objective at
    micro-step `step` (a traced int32 scalar), or None when every knob is
    at its default — the static objective then skips the rebuild entirely,
    keeping the bitwise-parity path byte-identical.

    Ramps count OPTIMIZER updates u = step // accum_steps, the same clock
    the LR schedules use, so annealing horizons don't change meaning when
    gradient accumulation is turned on. β(u) = kl_beta·min(1, u/N_kl);
    assoc scale s(u) = min(1, u/N_assoc); a ramp with N == 0 is identity.
    """
    if (
        tc.kl_beta == 1.0
        and tc.kl_anneal_steps == 0
        and tc.assoc_warmup_steps == 0
    ):
        return None
    if tc.kl_beta < 0:
        raise ValueError(f"kl_beta must be >= 0, got {tc.kl_beta}")
    if tc.kl_anneal_steps < 0 or tc.assoc_warmup_steps < 0:
        # A negative horizon would silently disable the ramp ('> 0' guards
        # below) — a typo'd '-4' must fail loudly, like kl_beta does.
        raise ValueError(
            "annealing horizons must be >= 0, got "
            f"kl_anneal_steps={tc.kl_anneal_steps}, "
            f"assoc_warmup_steps={tc.assoc_warmup_steps}"
        )
    u = (step // tc.accum_steps).astype(jnp.float32)
    kl_w = jnp.float32(tc.kl_beta)
    if tc.kl_anneal_steps > 0:
        kl_w = kl_w * jnp.minimum(1.0, u / tc.kl_anneal_steps)
    assoc_scale = jnp.float32(1.0)
    if tc.assoc_warmup_steps > 0:
        assoc_scale = jnp.minimum(1.0, u / tc.assoc_warmup_steps)
    return kl_w, assoc_scale


def apply_objective_weights(
    total, metrics, cfg: AssocConfig, tc: TrainConfig, step, assoc_lambda=None
):
    """Post-process (total, metrics) from assoc_loss_fn with the runtime
    objective weights: per-model λ (sweep path) and/or the β-VAE/annealing
    knobs (configs.TrainConfig). No-op — returns the inputs untouched —
    when neither is active. Shared by `_one_step` and the ZeRO step body
    so the semantics cannot drift between layouts."""
    w = objective_weights(tc, step)
    if assoc_lambda is None and w is None:
        return total, metrics
    lam = assoc_lambda if assoc_lambda is not None else cfg.assoc_lambda
    if w is not None:
        kl_w, assoc_scale = w
        lam = assoc_scale * jnp.float32(lam)
        total = _total_with_lambda(metrics, cfg, lam, kl_w)
        metrics = {
            **metrics,
            "total": total,
            "kl_beta_eff": kl_w,
            "assoc_scale_eff": assoc_scale,
        }
    else:
        total = _total_with_lambda(metrics, cfg, lam)
        metrics = {**metrics, "total": total}
    return total, metrics


def _one_step(state: TrainState, xs, cfg: AssocConfig, tc: TrainConfig, opt, axis_name=None, *, assoc_lambda=None, lr_scale=None):
    rng, step_key = jax.random.split(state.rng)
    # Per-step folding keeps the ε stream deterministic given (seed, step).
    step_key = jax.random.fold_in(step_key, state.step)
    if axis_name is not None:
        # Under shard_map each data shard must draw independent ε — fold the
        # mesh position into the key (deterministic given (seed, step, shard)).
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis_name))

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
            # Under shard_map the batch shards over axis_name; global-
            # negatives infonce gathers over it (ops/losses._infonce).
            data_axis=axis_name,
        )
        # Per-model λ (sweep path) and/or β-VAE/annealing knobs: recompute
        # the objective from its terms. The gradient is exact — total is
        # linear in the terms. No-op when neither is active.
        total, metrics = apply_objective_weights(
            total, metrics, cfg, tc, state.step, assoc_lambda
        )
        if axis_name is not None:
            # DP gradient sync: pmean the scalar loss across the mesh BEFORE
            # grad. Under shard_map's vma type system the backward pass then
            # emits exactly one psum over ICI for the (invariant) params —
            # the entire DP communication surface (SURVEY.md §2.2). (An
            # explicit post-grad pmean would double-count: grad w.r.t. an
            # invariant input already all-reduces its cotangent.)
            total = jax.lax.pmean(total, axis_name)
        return total, metrics

    # named_scope: profiler-trace labels (SURVEY.md §5 "Tracing/profiling");
    # trace-time only, zero runtime cost.
    with jax.named_scope("fwd_bwd"):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
    if axis_name is not None:
        # Pallas custom-VJP kernels return *per-shard* weight grads whose
        # vma still varies over the mesh (a hand-written bwd can't know the
        # axis to reduce over); the jnp path's grads arrive already reduced
        # by the vma-typed transpose of the loss pmean. Reduce exactly the
        # leaves that still vary — XLA's all-reduce combiner coalesces the
        # per-leaf psums into one fused collective over ICI.
        def _reduce_to_param_vma(g, p):
            extra = tuple(jax.typeof(g).vma - jax.typeof(p).vma)
            return jax.lax.psum(g, extra) if extra else g

        grads = jax.tree.map(_reduce_to_param_vma, grads, state.params)
        # Metrics are shard-local; average them so the logged loss equals
        # the global-batch loss.
        metrics = jax.lax.pmean(metrics, axis_name)
    # Global gradient norm (SURVEY.md §5 "Metrics": a first-class jitted
    # output). Computed after the DP reduction, so it is the norm of the
    # actual update-driving gradient, identical on every shard.
    metrics["grad_norm"] = optax.global_norm(grads)
    with jax.named_scope("adam_update"):
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        if lr_scale is not None:
            # Per-model learning rate (sweep path): the caller built `opt`
            # with learning_rate=1.0, so the Adam direction is -m̂/(√v̂+ε)
            # and scaling it by lr is bitwise-equal to optax.adam(lr)'s
            # scale(-lr) step: lr·(−t) == −(lr·t) in IEEE arithmetic.
            updates = jax.tree.map(lambda u: lr_scale * u, updates)
        params = optax.apply_updates(state.params, updates)
    new_state = TrainState(state.step + 1, params, opt_state, rng)
    return new_state, metrics


@functools.lru_cache(maxsize=64)
def make_train_step(cfg: AssocConfig, tc: TrainConfig, *, axis_name=None, jit=True):
    """Build the train-step callable.

    Returns ``step_fn(state, xs) -> (state', metrics)`` where

    - ``steps_per_call == 1``: ``xs`` is a list of per-modality batches
      ``[B, n_input_k]``; metrics are scalars.
    - ``steps_per_call == N``: ``xs`` is a list of stacked batch stacks
      ``[N, B, n_input_k]``; one `lax.scan` runs N fused steps on device
      and metrics have a leading ``[N]`` axis.

    ``axis_name`` enables in-step gradient pmean for use under shard_map.
    """
    opt = make_optimizer(tc)
    n = tc.steps_per_call

    if n == 1:

        def step_fn(state: TrainState, xs: Sequence[jax.Array]):
            return _one_step(state, list(xs), cfg, tc, opt, axis_name)

    else:

        def step_fn(state: TrainState, xs: Sequence[jax.Array]):
            def body(carry, batch):
                return _one_step(carry, list(batch), cfg, tc, opt, axis_name)

            return jax.lax.scan(body, state, tuple(xs))

    if jit:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))
    return step_fn
