"""Experiment driver CLI — the reference's L3 layer (SURVEY.md §1.1, §3.1).

The reference drives training from a main script: build arch dicts, load
paired data, epoch loop with periodic cost prints, periodic checkpoint,
post-train cross-modal generation + plots. Same surface here:

    python -m vae_assoc_tpu.train.driver \
        --config 3 --epochs 50 --data synthetic --n-samples 4096 \
        --ckpt-dir /tmp/run1/ckpt --metrics /tmp/run1/metrics.jsonl \
        --plots-dir /tmp/run1/plots --profile-epochs 2

plus TPU-era controls: --fused (whole-run single device program),
--batch-size/--steps-per-call/--bf16/--use-pallas overrides, a
`jax.profiler` trace flag, and resume from the latest checkpoint.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _dry_compile(cfg, tc) -> int:
    """--dry-compile: AOT-compile the single-device train step on abstract
    inputs (`jax.eval_shape` state + ShapeDtypeStruct batches — nothing
    touches the device memory) and print XLA's memory analysis and
    per-step FLOPs. The pre-flight answer to "does this arch/batch fit a
    chip": argument bytes ≈ resident state (params + Adam moments +
    batch), temp bytes = XLA's peak workspace (activations, gradients)."""
    import jax
    import jax.numpy as jnp

    from vae_assoc_tpu.train.step import init_train_state, make_train_step

    state_s = jax.eval_shape(lambda: init_train_state(cfg, tc))
    spc = tc.steps_per_call

    def batch_struct(n):
        shape = (spc, tc.batch_size, n) if spc > 1 else (tc.batch_size, n)
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    xs = [batch_struct(m.arch["n_input"]) for m in cfg.modalities]
    if cfg.n_cond > 0:
        xs.append(batch_struct(cfg.n_cond))
    compiled = make_train_step(cfg, tc).lower(state_s, xs).compile()

    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree.leaves(state_s.params))
    state_bytes = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree.leaves(state_s) if hasattr(l, "shape")
    )
    batch_bytes = sum(int(np.prod(x.shape)) * 4 for x in xs)
    print(f"params: {n_params:,} ({n_params * 4 / 2**20:.1f} MiB fp32); "
          f"train state {state_bytes / 2**20:.1f} MiB + "
          f"batch {batch_bytes / 2**20:.1f} MiB", flush=True)

    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = (cost or {}).get("flops")
    if flops:
        per_step = flops / max(spc, 1)
        print(f"flops/step: {per_step:.3e} "
              f"({per_step / tc.batch_size:.3e}/sample)", flush=True)

    try:
        mem = compiled.memory_analysis()
    except Exception:
        mem = None
    if mem is None:
        print("memory analysis unavailable on this backend "
              "(run on TPU for HBM numbers)", flush=True)
        return 0
    total = (mem.argument_size_in_bytes + mem.output_size_in_bytes
             + mem.temp_size_in_bytes + mem.generated_code_size_in_bytes)
    # Donation aliases the state args onto the outputs, so resident HBM is
    # args + temp + code, not args + outputs + temp (outputs reuse args).
    resident = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                + mem.generated_code_size_in_bytes)
    print(f"HBM: args {mem.argument_size_in_bytes / 2**20:.1f} MiB, "
          f"outputs {mem.output_size_in_bytes / 2**20:.1f} MiB (donation-"
          f"aliased), temp {mem.temp_size_in_bytes / 2**20:.1f} MiB, "
          f"code {mem.generated_code_size_in_bytes / 2**20:.1f} MiB "
          f"-> ~{resident / 2**20:.1f} MiB resident "
          f"(unaliased total {total / 2**20:.1f} MiB)", flush=True)
    stats = jax.devices()[0].memory_stats() or {}
    limit = stats.get("bytes_limit")
    if limit:
        print(f"device HBM limit: {limit / 2**30:.2f} GiB -> "
              f"{'FITS' if resident < limit else 'DOES NOT FIT'} "
              f"({resident / limit:.1%})", flush=True)
    return 0


def build_argparser() -> argparse.ArgumentParser:
    from vae_assoc_tpu.ops.losses import ASSOC_FORMS  # the one source
    p = argparse.ArgumentParser(
        prog="vae_assoc_tpu.train.driver", description=__doc__
    )
    p.add_argument("--config", type=int, default=3, choices=range(1, 6),
                   help="BASELINE config milestone 1-5")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--data", choices=("synthetic", "uji"), default="synthetic")
    p.add_argument("--n-samples", type=int, default=4096,
                   help="synthetic dataset size")
    p.add_argument("--uji-paths", nargs="*", default=[],
                   help="UJI Pen Characters v2 files (--data uji)")
    p.add_argument("--traj-encoding", choices=("resample", "rbf"),
                   default="resample",
                   help="trajectory parameterization: 'resample' (flattened "
                        "arc-length resample, the reference featurizer) or "
                        "'rbf' (functional RBF weight vectors, the "
                        "reference-ecosystem pytrajkin variant; the "
                        "trajectory arch's n_input adapts to 2*centers)")
    p.add_argument("--rbf-centers", type=int, default=100,
                   help="RBF basis size for --traj-encoding rbf")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--steps-per-call", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--lr-schedule", choices=("constant", "cosine"),
                   default=None,
                   help="LR schedule over optimizer updates "
                        "(cosine needs --decay-steps)")
    p.add_argument("--warmup-steps", type=int, default=None,
                   help="linear 0->lr warmup prepended to the schedule")
    p.add_argument("--decay-steps", type=int, default=None,
                   help="cosine decay horizon in optimizer updates")
    p.add_argument("--grad-clip-norm", type=float, default=None,
                   help="clip gradients to this global norm before Adam "
                        "(logged grad_norm stays the raw pre-clip value)")
    p.add_argument("--accum-steps", type=int, default=None,
                   help="micro-batches averaged per optimizer update "
                        "(optax.MultiSteps gradient accumulation)")
    p.add_argument("--ema-decay", type=float, default=None, metavar="D",
                   help="maintain an exponential moving average of the "
                        "params (decay D, e.g. 0.999); validation, "
                        "keep-best selection, and post-train eval/plots "
                        "then use the (debiased) EMA weights. Stored in "
                        "the optimizer state, so it checkpoints/resumes "
                        "and shards under every layout automatically")
    p.add_argument("--augment", action="store_true",
                   help="per-epoch on-device stroke augmentation: random "
                        "per-sample rotation/shear/aspect-jitter/point-"
                        "noise applied to the RAW strokes before "
                        "featurization, so image and trajectory stay a "
                        "consistent pair (ops/augment.py). Host-chunked "
                        "loop only; validation/eval stay on clean data")
    p.add_argument("--augment-rotate", type=float, default=15.0,
                   metavar="DEG", help="max |rotation| in degrees")
    p.add_argument("--augment-shear", type=float, default=0.15)
    p.add_argument("--augment-scale", type=float, default=0.15,
                   help="max aspect-ratio jitter (x scaled by 1±this)")
    p.add_argument("--augment-jitter", type=float, default=0.01,
                   help="per-point Gaussian noise, relative to each "
                        "sample's bounding-box extent")
    p.add_argument("--conditional", action="store_true",
                   help="conditional VAE (Sohn et al. 2015): one-hot class "
                        "labels concatenated into every encoder input and "
                        "decoder latent (n_cond = #classes in the data) — "
                        "label-directed generation without an exemplar. "
                        "Requires labeled data; MLP towers only")
    p.add_argument("--kl-beta", type=float, default=None, metavar="B",
                   help="β-VAE weight on the KL terms (default 1.0 = the "
                        "reference objective)")
    p.add_argument("--kl-anneal-steps", type=int, default=None, metavar="N",
                   help="linear 0->kl_beta KL warm-up over N optimizer "
                        "updates (Bowman-style annealing)")
    p.add_argument("--assoc-warmup-steps", type=int, default=None,
                   metavar="N",
                   help="linear 0->assoc_lambda ramp of the association "
                        "term over N optimizer updates")
    p.add_argument("--assoc-form", default=None,
                   choices=ASSOC_FORMS,
                   help="association-term form: mean_l2 (default, the "
                        "reference reconstruction), sample_l2 (L2 on the "
                        "reparameterized samples), sym_kl (Jeffreys "
                        "divergence between the Gaussian posteriors), "
                        "infonce (CLIP-style contrastive on normalized "
                        "latent means, rest-of-batch negatives)")
    p.add_argument("--assoc-temp", type=float, default=None, metavar="T",
                   help="infonce temperature (default 0.1)")
    p.add_argument("--assoc-negatives", default=None,
                   choices=("local", "global"),
                   help="infonce negative set under sharded layouts: "
                        "'local' (default) contrasts each data shard "
                        "against its own batch (objective depends on mesh "
                        "size); 'global' all-gathers the normalized latent "
                        "means over the data axis so DP infonce equals "
                        "single-device infonce (docs/PARALLEL.md)")
    p.add_argument("--depth", type=int, default=None, metavar="L",
                   help="hidden layers per MLP net (default 2 = the "
                        "reference architecture). Deeper stacks run the "
                        "depth-generic fused kernels and shard under every "
                        "layout; conv towers are fixed at 2")
    p.add_argument("--hidden", type=int, default=None, metavar="H",
                   help="hidden-layer width for the MLP towers "
                        "(default 500)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 MXU-pass matmul policy (fp32 accumulation)")
    p.add_argument("--use-pallas", action="store_true",
                   help="route through the fused Pallas kernels")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize each modality tower's forward in the "
                        "backward pass (jax.checkpoint): trades recompute "
                        "FLOPs for saved-activation HBM traffic on deep "
                        "--depth towers (TrainConfig.remat; measured "
                        "caveats in docs/PERF.md 'Remat')")
    p.add_argument("--fused", action="store_true",
                   help="train_loop_fused: all epochs in one device program")
    p.add_argument("--preempt-chunk", type=int, default=0, metavar="N",
                   help="with --ckpt-dir: cap training chunks at N epochs "
                        "so a SIGTERM (preemption) checkpoints within N "
                        "epochs even when no --ckpt-every/--val-every "
                        "boundary exists. Off by default: extra chunking "
                        "re-seeds the per-chunk shuffle stream (a "
                        "different, equally valid permutation sequence) "
                        "and re-stages the dataset per chunk")
    p.add_argument("--dry-compile", action="store_true",
                   help="pre-flight: AOT-compile the (single-device) train "
                        "step on abstract inputs — no data, no training — "
                        "and print XLA's memory analysis (args/output/temp "
                        "HBM) and per-step FLOPs, then exit. Check whether "
                        "an arch/batch fits a chip before launching")
    p.add_argument("--display-step", type=int, default=1)
    p.add_argument("--val-frac", type=float, default=0.0,
                   help="hold out this fraction of the data (seeded "
                        "permutation split, stable across --resume) and "
                        "log val_* metrics: ELBO terms + cross-modal MSE "
                        "over the whole held-out set")
    p.add_argument("--val-every", type=int, default=1,
                   help="evaluate the held-out set every N epochs")
    p.add_argument("--keep-best", action="store_true",
                   help="with --val-frac and --ckpt-dir: also checkpoint "
                        "to CKPT_DIR/best whenever val_total improves")
    p.add_argument("--early-stop-patience", type=int, default=0, metavar="P",
                   help="with --val-frac: stop when val_total has not "
                        "improved for P consecutive validations (0 = off)")
    p.add_argument("--sweep-seeds", type=int, default=0, metavar="E",
                   help="train E models in ONE vmapped program (seeds "
                        "seed..seed+E-1, train/sweep.py), then keep the "
                        "best by val_total (with --val-frac) or final "
                        "train total; post-train eval/plots/checkpoint "
                        "apply to the winner")
    p.add_argument("--sweep-lrs", type=float, nargs="+", default=None,
                   metavar="LR",
                   help="with --sweep-seeds E: per-model learning rates "
                        "(E values; constant schedule only)")
    p.add_argument("--sweep-lambdas", type=float, nargs="+", default=None,
                   metavar="L",
                   help="with --sweep-seeds E: per-model association "
                        "weights (E values)")
    p.add_argument("--mll-samples", type=int, default=0, metavar="K",
                   help="after training, estimate per-modality marginal "
                        "log-likelihood bounds (K-sample IWAE + ELBO, "
                        "nats/sample) on the eval split (0 = off)")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--ckpt-every", type=int, default=10,
                   help="checkpoint every N epochs")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint from --ckpt-dir")
    p.add_argument("--metrics", default=None, help="metrics JSONL path")
    p.add_argument("--tensorboard", default=None, metavar="DIR",
                   help="also write TensorBoard scalar event files to DIR")
    p.add_argument("--plots-dir", default=None,
                   help="write post-train eval plots here")
    p.add_argument("--profile-epochs", type=int, default=0,
                   help="wrap the first N epochs in a jax.profiler trace")
    p.add_argument("--profile-dir", default="/tmp/vae_assoc_tpu_profile")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (overrides any TPU plugin)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory; "
                        "re-runs load the train-step programs from disk "
                        "instead of recompiling (utils/compile_cache.py)")
    p.add_argument("--mesh", type=int, default=None, metavar="N",
                   help="data-parallel shard_map over an N-device mesh "
                        "(default: all devices for --config 5 on multi-"
                        "device hosts, otherwise single-device)")
    p.add_argument("--model-parallel", type=int, default=1, metavar="K",
                   help="tensor-parallel factor: with --mesh N, train over "
                        "a 2-D (N/K, K) (data, model) mesh with Megatron-"
                        "style GSPMD weight shardings (parallel/tp.py)")
    p.add_argument("--fsdp", action="store_true",
                   help="with --mesh N, shard params + optimizer state over "
                        "the data axis (ZeRO-style, parallel/fsdp.py) "
                        "instead of replicating them; combine with "
                        "--model-parallel K for the TP×FSDP layout "
                        "(parallel/tp_fsdp.py)")
    p.add_argument("--pipeline", type=int, default=0, metavar="S",
                   help="GPipe pipeline parallelism over S stage devices "
                        "(parallel/pp.py): deep uniform-width MLP towers "
                        "(--depth L with (L-1) divisible by S), middle "
                        "layers h2..hL stage-sharded, activations ride "
                        "ppermute. Alone: batches replicated. With "
                        "--mesh N (N total devices, a multiple of S): "
                        "DP×PP — S stages × N/S data shards. Mutually "
                        "exclusive with --model-parallel/--fsdp/--zero/"
                        "--fused")
    p.add_argument("--pp-micro", type=int, default=None, metavar="M",
                   help="with --pipeline S: GPipe microbatch count per data "
                        "shard (default 2·S). Bubble fraction = "
                        "(S-1)/(M+S-1) — more microbatches shrink the "
                        "bubble but each must still fill the MXU; the "
                        "per-shard batch must be divisible by M")
    p.add_argument("--zero", action="store_true",
                   help="with --mesh N, ZeRO-shard params + optimizer state "
                        "over the data axis via shard_map (parallel/zero.py: "
                        "all-gather weights / reduce-scatter grads). Unlike "
                        "--fsdp this composes with the fused Pallas kernels "
                        "(--use-pallas, config 5's default)")
    p.add_argument("--tp-shard", action="store_true",
                   help="with --mesh N, shard_map tensor parallelism that "
                        "KEEPS the fused kernels (parallel/tp_shard.py): "
                        "Megatron column x row layer-pair splits around the "
                        "width-agnostic block kernels, one psum per pair; "
                        "batch replicated. MLP towers only. Unlike "
                        "--model-parallel (GSPMD, jnp path) this composes "
                        "with --use-pallas")
    p.add_argument("--data-parallel", type=int, default=1, metavar="D",
                   help="with --tp-shard --mesh N: DP x TP on one 2-D "
                        "('data','model') shard_map mesh - D data shards x "
                        "N/D Megatron model shards, batches sharded over "
                        "data, kernels kept (parallel/tp_shard.py round 5)")
    return p


def load_data(args):
    from vae_assoc_tpu.data.pipeline import PairedDataset

    kw = dict(traj_encoding=args.traj_encoding, rbf_centers=args.rbf_centers)
    if args.data == "uji":
        if not args.uji_paths:
            raise SystemExit("--data uji requires --uji-paths")
        ds = PairedDataset.from_uji(args.uji_paths, **kw)
    else:
        ds = PairedDataset.from_synthetic(
            args.n_samples, seed=args.seed or 0, **kw
        )
    imgs, trajs = ds.features()
    return ds, [imgs, trajs]


def _run_sweep(args, cfg, tc, data, val_data, log):
    """--sweep-seeds: E-model vmapped training, returns the winner state.

    Every model's per-epoch metrics are logged as separate JSONL records
    keyed by ``model=i``; the winner is chosen by held-out ``val_total``
    when --val-frac is given (each member evaluated over the WHOLE
    held-out set), else by final-epoch training total.
    """
    from vae_assoc_tpu.train import eval as eval_mod
    from vae_assoc_tpu.train.step import eval_params
    from vae_assoc_tpu.train.sweep import select_model, sweep_loop

    e = args.sweep_seeds
    seeds = list(range(tc.seed, tc.seed + e))
    lrs, lams = args.sweep_lrs, args.sweep_lambdas
    print(
        f"sweep: {e} models in one vmapped program; seeds {seeds}"
        + (f", lrs {lrs}" if lrs else "")
        + (f", assoc_lambdas {lams}" if lams else ""),
        flush=True,
    )
    state, history = sweep_loop(
        cfg, tc, data, seeds=seeds, learning_rates=lrs, assoc_lambdas=lams,
        epochs=args.epochs,
    )
    for ep, h in enumerate(history):
        if ep % args.display_step:
            continue
        for i in range(e):
            log.write(epoch=ep, model=i,
                      **{k: float(v[i]) for k, v in h.items()})
    if val_data is not None:
        scores = []
        for i in range(e):
            vm = eval_mod.eval_metrics(
                eval_params(tc, select_model(state, i)), val_data, cfg,
                batch_size=tc.batch_size, compute_dtype=tc.compute_dtype,
                use_pallas=tc.use_pallas, seed=tc.seed,
            )
            log.write(model=i, **{f"val_{k}": v for k, v in vm.items()})
            scores.append(vm["total"])
        kind = "val_total"
    elif lams:
        # Per-model λ makes `total` incomparable across models (a small λ
        # down-weights its own assoc term, so argmin(total) would just
        # pick the smallest λ). Score by the λ-independent ELBO terms.
        scores = [
            float(sum(history[-1][f"recon_{m.name}"][i]
                      + history[-1][f"kl_{m.name}"][i]
                      for m in cfg.modalities))
            for i in range(e)
        ]
        kind = "final train recon+KL (lambda-independent)"
    else:
        scores = [float(v) for v in history[-1]["total"]]
        kind = "final train total"
    best = int(np.argmin(scores))
    print(
        f"sweep winner: model {best} (seed {seeds[best]}"
        + (f", lr {lrs[best]}" if lrs else "")
        + (f", lambda {lams[best]}" if lams else "")
        + f") by {kind} {scores[best]:.5f}",
        flush=True,
    )
    return select_model(state, best)


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    import jax

    if args.cpu:
        # Env vars are too late once a TPU PJRT plugin pre-registered at
        # interpreter start; the config update still wins (lazy backends).
        jax.config.update("jax_platforms", "cpu")
    if args.compile_cache:
        from vae_assoc_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(args.compile_cache)

    import jax.numpy as jnp

    from vae_assoc_tpu.configs import baseline_config
    from vae_assoc_tpu.train import eval as eval_mod
    from vae_assoc_tpu.train.loop import train_loop, train_loop_fused
    from vae_assoc_tpu.train.step import eval_params, init_train_state
    from vae_assoc_tpu.utils import checkpoint as ckpt
    from vae_assoc_tpu.utils.logging import MetricsLogger

    overrides = {}
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.steps_per_call is not None:
        overrides["steps_per_call"] = args.steps_per_call
    if args.learning_rate is not None:
        overrides["learning_rate"] = args.learning_rate
    for field in ("lr_schedule", "warmup_steps", "decay_steps",
                  "grad_clip_norm", "accum_steps", "ema_decay",
                  "kl_beta", "kl_anneal_steps", "assoc_warmup_steps"):
        v = getattr(args, field)
        if v is not None:
            overrides[field] = v
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.remat:
        overrides["remat"] = True
    if args.bf16:
        overrides["compute_dtype"] = jnp.bfloat16
    if args.use_pallas:
        overrides["use_pallas"] = True
    if args.zero and (args.fsdp or args.model_parallel > 1):
        raise SystemExit("--zero owns the whole layout (a 1-D shard_map "
                         "data mesh); it cannot combine with --fsdp or "
                         "--model-parallel")
    if args.tp_shard and (args.fsdp or args.model_parallel > 1 or args.zero):
        raise SystemExit("--tp-shard owns the whole layout (a shard_map "
                         "model mesh, optionally x data with "
                         "--data-parallel); it cannot combine with --fsdp/"
                         "--model-parallel/--zero")
    if args.data_parallel < 1:
        raise SystemExit("--data-parallel needs D >= 1")
    if args.data_parallel > 1 and not args.tp_shard:
        raise SystemExit("--data-parallel D is the DP x TP composition knob; "
                         "it requires --tp-shard (plain data parallelism is "
                         "just --mesh N)")
    if args.fsdp or args.model_parallel > 1:
        # TP/FSDP lay out the jnp step (GSPMD shardings on the plain model
        # path). The *effective* kernel choice comes from the config, not
        # the CLI flag — config 5 defaults use_pallas=True, so without
        # this override `--config 5 --fsdp` would pass the arg-level guard
        # below and then crash in _check_fsdp/_check_tp_mesh.
        if args.use_pallas:
            raise SystemExit("--model-parallel/--fsdp run the jnp model "
                             "path (no --use-pallas)")
        overrides["use_pallas"] = False
    if args.pipeline:
        if args.pipeline < 2:
            raise SystemExit("--pipeline needs S >= 2 stages")
        if (args.model_parallel > 1 or args.fsdp or args.zero or args.fused
                or args.tp_shard):
            raise SystemExit(
                "--pipeline owns the whole layout (a shard_map stage mesh, "
                "optionally × data with --mesh N); it cannot combine with "
                "--model-parallel/--fsdp/--zero/--tp-shard/--fused"
            )
        if args.mesh:
            # DP×PP: --mesh N is the TOTAL device count (like
            # --model-parallel), S stages × N/S data shards.
            if args.mesh % args.pipeline or args.mesh <= args.pipeline:
                raise SystemExit(
                    f"--pipeline {args.pipeline} with --mesh {args.mesh}: "
                    "the mesh is S stages × (N/S) data shards, so N must "
                    "be a multiple of S greater than S"
                )
        # Same config-vs-flag trap as --fsdp above: check_pp rejects
        # use_pallas, and config 5 defaults it True.
        if args.use_pallas:
            raise SystemExit("--pipeline runs the jnp model path "
                             "(no --use-pallas)")
        overrides["use_pallas"] = False
    if args.pp_micro is not None and not args.pipeline:
        raise SystemExit("--pp-micro only applies with --pipeline S")
    if args.preempt_chunk < 0:
        raise SystemExit("--preempt-chunk must be >= 0 (0 = off)")
    if args.preempt_chunk and not args.ckpt_dir:
        raise SystemExit("--preempt-chunk requires --ckpt-dir (it exists "
                         "to bound the SIGTERM-to-checkpoint latency)")
    if args.remat and args.pipeline:
        raise SystemExit(
            "--remat wraps the standard per-tower forward; the pipeline "
            "step has its own stage-sharded ring forward (parallel/pp.py) "
            "with no tower boundary to checkpoint at"
        )
    cfg, tc = baseline_config(args.config, **overrides)
    if args.assoc_form:
        if args.assoc_form != "mean_l2" and len(cfg.modalities) < 2:
            raise SystemExit(
                f"--assoc-form {args.assoc_form} needs a multi-modality "
                "config (the association term couples modality pairs)"
            )
        cfg = dataclasses.replace(cfg, assoc_form=args.assoc_form)
    if args.assoc_negatives:
        if (args.assoc_form or cfg.assoc_form) != "infonce":
            raise SystemExit("--assoc-negatives only applies with "
                             "--assoc-form infonce")
        cfg = dataclasses.replace(cfg, assoc_negatives=args.assoc_negatives)
    if args.assoc_temp is not None:
        if (args.assoc_form or cfg.assoc_form) != "infonce":
            raise SystemExit("--assoc-temp only applies with "
                             "--assoc-form infonce")
        if args.assoc_temp <= 0:
            raise SystemExit(
                f"--assoc-temp must be > 0, got {args.assoc_temp}"
            )
        cfg = dataclasses.replace(cfg, assoc_temp=args.assoc_temp)
    if args.depth is not None or args.hidden is not None:
        if args.depth is not None and args.depth < 1:
            raise SystemExit("--depth must be >= 1")

        def _resize(m):
            if m.encoder != "mlp":
                if args.depth not in (None, 2):
                    raise SystemExit(
                        "--depth: conv towers are fixed at 2 hidden layers "
                        "(configs.ModalityConfig); use the MLP configs"
                    )
                return m  # conv geometry is fixed; --hidden is MLP-only
            depth = args.depth if args.depth is not None else 2
            hidden = args.hidden if args.hidden is not None else 500
            arch = {"n_input": m.arch["n_input"], "n_z": m.arch["n_z"]}
            for i in range(1, depth + 1):
                arch[f"n_hidden_recog_{i}"] = hidden
                arch[f"n_hidden_gener_{i}"] = hidden
            return dataclasses.replace(m, arch=arch)

        cfg = dataclasses.replace(
            cfg, modalities=tuple(_resize(m) for m in cfg.modalities)
        )
    if args.traj_encoding == "rbf":
        # The trajectory modality consumes RBF weight vectors, so its arch
        # n_input follows the encoding width (2 * centers). 100 centers
        # matches the default 200-feature arch exactly.
        n_in = 2 * args.rbf_centers
        cfg = dataclasses.replace(cfg, modalities=tuple(
            dataclasses.replace(m, arch={**dict(m.arch), "n_input": n_in})
            if m.name == "trajectory" else m
            for m in cfg.modalities
        ))
    k = len(cfg.modalities)

    if args.dry_compile:
        # Validate BEFORE any data work (this is a pre-flight), and for the
        # unconditional case compile before loading data at all — the
        # analysis only needs shapes. --conditional derives n_cond from the
        # data's label set, so that one spelling runs after the conditional
        # block below.
        if args.mesh or args.model_parallel > 1 or args.fsdp or args.zero \
                or args.pipeline or args.sweep_seeds:
            raise SystemExit(
                "--dry-compile analyzes the single-device step (the "
                "fits-one-chip question); sharded layouts are not covered"
            )
        if not args.conditional:
            return _dry_compile(cfg, tc)

    if args.val_frac > 0 and args.val_every < 1:
        raise SystemExit("--val-every must be >= 1")
    if args.keep_best and args.val_frac <= 0:
        raise SystemExit("--keep-best requires --val-frac")
    if args.keep_best and not args.ckpt_dir:
        raise SystemExit("--keep-best requires --ckpt-dir")
    if args.early_stop_patience > 0 and args.val_frac <= 0:
        raise SystemExit("--early-stop-patience requires --val-frac")

    if args.sweep_seeds:
        if args.sweep_seeds < 2:
            raise SystemExit("--sweep-seeds needs E >= 2")
        if args.epochs < 1:
            raise SystemExit("--sweep-seeds needs --epochs >= 1")
        for bad, name in (
            (args.fused, "--fused"),
            (args.resume, "--resume"),
            (args.keep_best, "--keep-best"),
            (args.early_stop_patience > 0, "--early-stop-patience"),
            (args.profile_epochs > 0, "--profile-epochs"),
            (bool(args.mesh and args.mesh > 1), "--mesh"),
            (args.model_parallel > 1, "--model-parallel"),
            (args.fsdp, "--fsdp"),
            (args.zero, "--zero"),
            (args.tp_shard, "--tp-shard"),
            (args.pipeline > 0, "--pipeline"),
        ):
            if bad:
                raise SystemExit(
                    f"--sweep-seeds is incompatible with {name} (the sweep "
                    "is one single-device vmapped program; select the "
                    "winner first, then scale it out)"
                )
        for lst, nm in ((args.sweep_lrs, "--sweep-lrs"),
                        (args.sweep_lambdas, "--sweep-lambdas")):
            if lst is not None and len(lst) != args.sweep_seeds:
                raise SystemExit(
                    f"{nm} needs one value per model "
                    f"({args.sweep_seeds}), got {len(lst)}"
                )
        if args.sweep_lrs is not None and (
                args.lr_schedule not in (None, "constant")
                or (args.warmup_steps or 0) > 0):
            raise SystemExit(
                "--sweep-lrs requires the constant LR schedule with no "
                "warmup (per-model rates scale the Adam direction; a "
                "per-model schedule horizon has no state to live in)"
            )
        if args.sweep_lrs is not None and (args.ema_decay or 0) > 0:
            raise SystemExit(
                "--sweep-lrs is incompatible with --ema-decay (per-model "
                "lr scaling happens outside the optimizer chain, so the "
                "in-chain EMA stage would average the unscaled updates)"
            )
    elif args.sweep_lrs is not None or args.sweep_lambdas is not None:
        raise SystemExit("--sweep-lrs/--sweep-lambdas require --sweep-seeds")

    ds, loaded = load_data(args)
    # Select each configured modality's feature set by name (config 2 is
    # trajectory-only: taking the first array would feed images).
    by_name = {"image": loaded[0], "trajectory": loaded[1]}
    data = [by_name[m.name] for m in cfg.modalities]
    if args.conditional:
        # Conditional VAE: widen every modality to n_cond = #classes and
        # append the one-hot condition as the trailing batch entry (the
        # split_cond convention) — it then rides through the split/shuffle/
        # shard/eval plumbing like any other per-sample array.
        if ds.labels is None:
            raise SystemExit("--conditional requires labeled data")
        lab = np.asarray(ds.labels, dtype=np.int64)
        n_classes = int(lab.max()) + 1
        try:
            cfg = dataclasses.replace(cfg, modalities=tuple(
                dataclasses.replace(m, n_cond=n_classes)
                for m in cfg.modalities
            ))
        except ValueError as e:  # e.g. conv towers reject conditioning
            raise SystemExit(f"--conditional: {e}")
        cond_full = np.eye(n_classes, dtype=np.float32)[lab]
        data = data + [cond_full]
        print(f"conditional: n_cond={n_classes} classes", flush=True)
    if args.dry_compile:  # --conditional spelling: cfg now carries n_cond
        return _dry_compile(cfg, tc)

    val_data = None
    train_idx = None
    eval_labels = ds.labels
    if args.val_frac > 0:
        from vae_assoc_tpu.data.pipeline import split_train_val

        data, val_data, (train_idx, val_idx) = split_train_val(
            data, args.val_frac, seed=tc.seed
        )
        if eval_labels is not None:
            eval_labels = np.asarray(eval_labels)[val_idx]
    print(
        f"config {args.config}: {k} modalit{'y' if k == 1 else 'ies'}, "
        f"{len(ds)} samples"
        + (f" ({int(data[0].shape[0])} train / "
           f"{int(val_data[0].shape[0])} val)" if val_data else "")
        + f", batch {tc.batch_size}, {jax.default_backend()} backend",
        flush=True,
    )

    # Data parallelism: explicit --mesh N, or all devices for the DP
    # milestone (config 5) when more than one device is attached.
    n_mesh = None if args.pipeline else args.mesh
    if (n_mesh is None and args.config == 5 and len(jax.devices()) > 1
            and not args.sweep_seeds and not args.pipeline):
        # The sweep is single-device; --pipeline owns its own mesh.
        n_mesh = len(jax.devices())
    mesh = None
    mp = args.model_parallel
    if n_mesh is not None and n_mesh > 1:
        if args.fused:
            raise SystemExit("--fused and --mesh are mutually exclusive")
        from vae_assoc_tpu.parallel import (
            dp_train_loop,
            fsdp_train_loop,
            gather_zero_train_state,
            make_mesh,
            replicate,
            shard_fsdp_train_state,
            shard_tp_fsdp_train_state,
            shard_zero_train_state,
            tp_fsdp_train_loop,
            tp_train_loop,
            zero_train_loop,
        )
        from vae_assoc_tpu.parallel.tp import shard_tp_train_state

        if mp > 1 and args.fsdp:
            # Combined layout: Megatron model-axis weight splits + ZeRO
            # data-axis sharding of everything TP leaves unsharded
            # (parallel/tp_fsdp.py).
            mesh = make_mesh(n_mesh, model_axis="model", model_parallel=mp)
            print(f"tensor-parallel x FSDP over a {n_mesh // mp}x{mp} "
                  "(data, model) mesh", flush=True)
        elif mp > 1:
            if tc.use_pallas:  # defense: the override above forces False
                raise SystemExit("--model-parallel runs the jnp model path "
                                 "(no --use-pallas)")
            mesh = make_mesh(n_mesh, model_axis="model", model_parallel=mp)
            print(f"data×tensor parallel over a {n_mesh // mp}x{mp} "
                  "(data, model) mesh", flush=True)
        elif args.fsdp:
            if tc.use_pallas:  # defense: the override above forces False
                raise SystemExit("--fsdp runs the jnp model path "
                                 "(no --use-pallas; --zero keeps the kernels)")
            mesh = make_mesh(n_mesh)
            print(f"fully-sharded data-parallel over {n_mesh} devices",
                  flush=True)
        elif args.zero:
            mesh = make_mesh(n_mesh)
            print(f"ZeRO-sharded data-parallel (shard_map) over {n_mesh} "
                  "devices", flush=True)
        elif args.tp_shard:
            from vae_assoc_tpu.parallel import tp_shard as tps_mod

            tps_mod.check_tp_shard(cfg, tc)  # fail before data prep
            mesh = tps_mod.make_tp_mesh(n_mesh,
                                        data_parallel=args.data_parallel)
            if args.data_parallel > 1:
                print(f"DPxTP (shard_map, kernels kept): "
                      f"{args.data_parallel} data shards x "
                      f"{n_mesh // args.data_parallel} model shards",
                      flush=True)
            else:
                print(f"tensor-parallel (shard_map, kernels kept) over "
                      f"{n_mesh} devices", flush=True)
        else:
            mesh = make_mesh(n_mesh)
            print(f"data-parallel over {n_mesh} devices", flush=True)
    elif mp > 1 or args.fsdp or args.zero or args.tp_shard:
        raise SystemExit(
            "--model-parallel/--fsdp/--zero/--tp-shard require --mesh N "
            "with N > 1")

    pp_mesh = None
    if args.pipeline:
        from vae_assoc_tpu.parallel import pp as pp_mod

        pp_mod.check_pp(cfg, tc, args.pipeline)  # fail before data prep
        pp_data = (args.mesh // args.pipeline) if args.mesh else 1
        pp_micro = pp_mod._resolve_n_micro(tc, args.pipeline, args.pp_micro,
                                           pp_data)
        pp_mesh = pp_mod.make_pp_mesh(args.pipeline, data_parallel=pp_data)
        print(f"pipeline-parallel over {args.pipeline} stages"
              + (f" × {pp_data} data shards" if pp_data > 1 else "")
              + f", {pp_micro} microbatches (GPipe, parallel/pp.py)",
              flush=True)

    cfg_snapshot = None
    if args.ckpt_dir:
        # Self-describing checkpoints (the save_model layout): serving
        # (Predictor.load) and the standalone evaluator (vae-assoc-eval)
        # reconstruct the model from the directory alone. The "data"
        # section records the FEATURIZATION the model was trained on —
        # the arch width alone cannot distinguish rbf(100 centers) from
        # resample(100 timesteps), both 200-wide.
        from vae_assoc_tpu.configs import config_to_dict

        cfg_snapshot = config_to_dict(cfg, tc)
        cfg_snapshot["data"] = {
            "source": args.data,
            "traj_encoding": args.traj_encoding,
            "rbf_centers": args.rbf_centers,
        }

        def _write_cfg(dir_):
            os.makedirs(dir_, exist_ok=True)
            with open(os.path.join(dir_, "model_config.json"), "w") as f:
                json.dump(cfg_snapshot, f, indent=1)

        _write_cfg(args.ckpt_dir)

    state = None if args.sweep_seeds else init_train_state(cfg, tc)
    if args.resume:
        if not args.ckpt_dir:
            raise SystemExit("--resume requires --ckpt-dir")
        state = ckpt.restore(args.ckpt_dir, state)
        print(f"resumed from step {int(state.step)}", flush=True)
    if mesh is not None:
        if mp > 1 and args.fsdp:
            state = shard_tp_fsdp_train_state(mesh, state, cfg, tc)
        elif mp > 1:
            state = shard_tp_train_state(mesh, state, cfg, tc)
        elif args.fsdp:
            state = shard_fsdp_train_state(mesh, state, cfg, tc)
        elif args.zero:
            state = shard_zero_train_state(mesh, state, cfg, tc)
        elif args.tp_shard:
            from vae_assoc_tpu.parallel import tp_shard as tps_mod

            state = tps_mod.shard_tp_train_state(mesh, state, cfg, tc)
        else:
            state = replicate(mesh, state)
    if pp_mesh is not None:
        state = pp_mod.shard_pp_train_state(pp_mesh, state, cfg, tc)

    # ZeRO stores flat data-axis shards and PP restacks the tower middles;
    # validation/checkpoint/eval consume the plain full-array TrainState,
    # so they go through this adapter (identity everywhere else). Pure
    # reshaping — no collectives.
    def to_full(s):
        if args.zero:
            return gather_zero_train_state(s, cfg, tc)
        if args.tp_shard:
            from vae_assoc_tpu.parallel import tp_shard as tps_mod

            return tps_mod.gather_tp_train_state(s, cfg, tc)
        if args.pipeline:
            return pp_mod.gather_pp_train_state(s, cfg, tc, args.pipeline)
        return s

    log = MetricsLogger(args.metrics, echo=True, tensorboard_dir=args.tensorboard)

    if args.augment and (mesh is not None or pp_mesh is not None
                         or args.fused or args.sweep_seeds):
        raise SystemExit(
            "--augment uses the per-epoch host-chunked loop; it does not "
            "combine with --fused/--mesh/--model-parallel/--fsdp/--zero/"
            "--pipeline/--sweep-seeds"
        )
    aug_refresh_at = None
    if args.augment:
        from vae_assoc_tpu.ops.augment import AugmentConfig

        aug_cfg = AugmentConfig(
            max_rotate=args.augment_rotate,
            max_shear=args.augment_shear,
            max_scale=args.augment_scale,
            point_jitter=args.augment_jitter,
        )
        # Deterministic per-GLOBAL-epoch stream: the offset is derived
        # from state.step inside run(), so it is correct across the
        # driver's chunked train_loop calls AND across --resume (a fresh
        # process restores step from the checkpoint).
        aug_base = jax.random.fold_in(jax.random.key(tc.seed), 0xA46)
        # With --val-frac, augment only the TRAINING rows (ds.subset):
        # re-featurizing the full set each epoch would compute the val
        # rows and throw them away.
        aug_ds = ds if train_idx is None else ds.subset(train_idx)
        aug_cond = None
        if args.conditional:
            aug_cond = (cond_full if train_idx is None
                        else cond_full[np.asarray(train_idx)])

        def aug_refresh_at(offset):
            def refresh(e):
                key = jax.random.fold_in(aug_base, offset + e)
                imgs, trajs = aug_ds.features(augment=aug_cfg, augment_key=key)
                by = {"image": imgs, "trajectory": trajs}
                fresh = [by[m.name] for m in cfg.modalities]
                if aug_cond is not None:
                    fresh.append(aug_cond)  # labels don't deform
                return fresh

            return refresh

        print(f"augment: {aug_cfg}", flush=True)

    def run(state, epochs):
        if pp_mesh is not None:
            return pp_mod.pp_train_loop(cfg, tc, data, pp_mesh, epochs=epochs,
                                        state=state, n_micro=args.pp_micro)
        if mesh is not None:
            if mp > 1 and args.fsdp:
                return tp_fsdp_train_loop(cfg, tc, data, mesh, epochs=epochs,
                                          state=state)
            if mp > 1:
                return tp_train_loop(cfg, tc, data, mesh, epochs=epochs, state=state)
            if args.fsdp:
                return fsdp_train_loop(cfg, tc, data, mesh, epochs=epochs, state=state)
            if args.zero:
                return zero_train_loop(cfg, tc, data, mesh, epochs=epochs, state=state)
            if args.tp_shard:
                from vae_assoc_tpu.parallel import tp_shard as tps_mod

                return tps_mod.tp_train_loop(cfg, tc, data, mesh,
                                             epochs=epochs, state=state)
            return dp_train_loop(cfg, tc, data, mesh, epochs=epochs, state=state)
        if args.fused:
            return train_loop_fused(cfg, tc, data, epochs=epochs, state=state)
        refresh = None
        if aug_refresh_at is not None:
            # Global-epoch offset from the optimizer step (chunk/resume
            # aware): steps-per-epoch mirrors train_loop's n_calls*spc.
            spe = max(
                (data[0].shape[0] // tc.batch_size // tc.steps_per_call)
                * tc.steps_per_call, 1,
            )
            refresh = aug_refresh_at(int(jax.device_get(state.step)) // spe)
        return train_loop(
            cfg, tc, data, epochs=epochs, state=state, refresh_data=refresh
        )

    epochs_done = 0
    if args.sweep_seeds:
        # Train E models in one vmapped program, select the winner, and
        # fall through to the normal post-train checkpoint/eval/plots with
        # it as a plain single-model state (train/sweep.py).
        state = _run_sweep(args, cfg, tc, data, val_data, log)
        epochs_done = args.epochs  # skip the single-model training loop
    if args.profile_epochs > 0:
        # Wrap the first N epochs in a profiler trace (SURVEY.md §5
        # "Tracing/profiling"); view with XProf/Perfetto.
        jax.profiler.start_trace(args.profile_dir)
        try:
            state, history = run(state, args.profile_epochs)
        finally:
            jax.profiler.stop_trace()
        for h in history:
            log.write(epoch=epochs_done, **h)
            epochs_done += 1
        print(f"profile written to {args.profile_dir}", flush=True)

    # Train in chunks bounded by the next event boundary (periodic
    # checkpoint and/or held-out validation), so both see live state.
    ckpt_int = args.ckpt_every if (args.ckpt_dir and args.ckpt_every) else 0
    val_int = args.val_every if val_data is not None else 0
    best_val = float("inf")
    stale = 0  # consecutive validations without a val_total improvement
    if (args.keep_best and args.resume
            and os.path.isdir(os.path.join(args.ckpt_dir, "best"))):
        # Re-seed the best-so-far from the existing best/ checkpoint:
        # starting from inf would let the first post-resume validation
        # overwrite a genuinely better checkpoint with a worse one. The
        # held-out split is identical across restarts (seeded permutation),
        # so this val_total is comparable with pre-kill values.
        best_state = ckpt.restore(
            os.path.join(args.ckpt_dir, "best"), init_train_state(cfg, tc)
        )
        best_val = eval_mod.eval_metrics(
            eval_params(tc, best_state), val_data, cfg,
            batch_size=tc.batch_size,
            compute_dtype=tc.compute_dtype, use_pallas=tc.use_pallas,
            seed=tc.seed,
        )["total"]
        del best_state
        print(f"resume: existing best checkpoint has val_total="
              f"{best_val:.5f}", flush=True)

    def _until(done: int, interval: int) -> int:
        """Epochs until the next interval boundary strictly after `done`."""
        return interval - done % interval if interval else args.epochs

    # Preemption-safe training (SURVEY.md §5 "Failure detection"): with a
    # checkpoint directory, SIGTERM — the signal preempted TPU VMs and
    # cluster schedulers deliver — requests a save-and-exit at the next
    # chunk boundary instead of killing the run on the floor. The handler
    # only flips a flag: jitted device calls are uninterruptible, and a
    # mid-chunk save would tear the (state, data-offset) pair that exact
    # resume depends on. Response latency = one chunk; --preempt-chunk N
    # bounds it explicitly. Extra chunking is NOT applied silently: the
    # shuffle stream is seeded per chunk from (seed, start_step), so a
    # different chunking is a different (equally valid) permutation
    # sequence, and each chunk re-stages the dataset to the device —
    # both are opt-in costs, not defaults.
    preempt_chunk = args.preempt_chunk or args.epochs
    stop_signal = None
    if args.ckpt_dir:
        import signal

        def _on_term(signum, frame):
            nonlocal stop_signal
            stop_signal = signum
            print(f"signal {signum} received: checkpointing and exiting at "
                  "the next chunk boundary", flush=True)

        signal.signal(signal.SIGTERM, _on_term)

    def run_validation(state, epoch: int):
        nonlocal best_val, stale
        # With --ema-decay the validated (and keep-best-selected) weights
        # are the debiased EMA params; the checkpoint still saves the full
        # TrainState, whose opt_state carries the EMA accumulator.
        vm = eval_mod.eval_metrics(
            eval_params(tc, state), val_data, cfg, batch_size=tc.batch_size,
            compute_dtype=tc.compute_dtype, use_pallas=tc.use_pallas,
            seed=tc.seed,
        )
        log.write(epoch=epoch, **{f"val_{k}": v for k, v in vm.items()})
        if vm["total"] < best_val:
            best_val = vm["total"]
            stale = 0
            if args.keep_best:
                # best/ is the artifact users evaluate/serve most — keep
                # it self-describing too.
                _write_cfg(os.path.join(args.ckpt_dir, "best"))
                ckpt.save(os.path.join(args.ckpt_dir, "best"), state)
                print(f"new best val_total={vm['total']:.5f} at epoch "
                      f"{epoch}; saved to "
                      f"{os.path.join(args.ckpt_dir, 'best')}", flush=True)
        else:
            stale += 1

    while epochs_done < args.epochs:
        n = min(args.epochs - epochs_done, preempt_chunk,
                _until(epochs_done, ckpt_int), _until(epochs_done, val_int))
        state, history = run(state, n)
        for e, h in enumerate(history):
            if (epochs_done + e) % args.display_step == 0:
                log.write(epoch=epochs_done + e, **h)
        epochs_done += n
        if stop_signal is not None and epochs_done < args.epochs:
            full = to_full(state)
            ckpt.save(args.ckpt_dir, full)
            print(f"preempted (signal {stop_signal}): checkpoint saved to "
                  f"{args.ckpt_dir} at epoch {epochs_done - 1} (step "
                  f"{int(jax.device_get(full.step))}); continue with "
                  "--resume", flush=True)
            return 0
        last_chunk = epochs_done >= args.epochs
        if val_int and (epochs_done % val_int == 0 or last_chunk):
            run_validation(to_full(state), epochs_done - 1)
            if (args.early_stop_patience > 0
                    and stale >= args.early_stop_patience
                    and not last_chunk):
                print(f"early stop at epoch {epochs_done - 1}: val_total "
                      f"stale for {stale} validations "
                      f"(best {best_val:.5f})", flush=True)
                break
        if ckpt_int and epochs_done % ckpt_int == 0 and not last_chunk:
            ckpt.save(args.ckpt_dir, to_full(state))

    state = to_full(state)  # post-train eval/plots/ckpt use full arrays
    if args.ckpt_dir:
        ckpt.save(args.ckpt_dir, state)
        print(f"checkpoint saved to {args.ckpt_dir}", flush=True)

    # Post-train: cross-modal MSE eval (the quality gate) + plots — on the
    # held-out set when --val-frac is given, else the head of the data.
    # With --ema-decay these all use the debiased EMA weights.
    final_params = eval_params(tc, state)
    eval_src = val_data if val_data is not None else data
    n_eval = min(512, int(eval_src[0].shape[0]))
    eval_xs = [d[:n_eval] for d in eval_src]
    mse = eval_mod.evaluate(
        final_params, eval_xs, cfg,
        compute_dtype=tc.compute_dtype, use_pallas=tc.use_pallas,
    )
    log.write(**{f"mse_{k}": v for k, v in mse.items()})
    if eval_labels is not None and n_eval >= 2:
        # Latent-space recognition (the paper's second metric): LOO k-NN
        # accuracy per modality + cross-modal transfer grids.
        rec_xs = eval_xs
        if args.conditional:
            # Label-blind probe (eval_mod.label_blind_cond): encoding with
            # the TRUE one-hot would leak the answer into the latent the
            # k-NN then classifies; the uniform class prior is the only
            # label-free conditional encoding, so knn_* measures what x
            # alone carries, comparable to unconditional runs.
            rec_xs = eval_xs[:k] + [
                eval_mod.label_blind_cond(n_eval, eval_xs[k].shape[1])
            ]
        rec = eval_mod.recognition_accuracy(
            final_params, rec_xs, np.asarray(eval_labels)[:n_eval], cfg,
            compute_dtype=tc.compute_dtype, use_pallas=tc.use_pallas,
        )
        log.write(**rec)
        print("recognition:",
              " ".join(f"{k}={v:.3f}" for k, v in rec.items()), flush=True)
    if args.mll_samples > 0:
        mll = eval_mod.marginal_log_likelihood(
            final_params, eval_xs, cfg, n_importance=args.mll_samples,
            seed=tc.seed, compute_dtype=tc.compute_dtype,
            use_pallas=tc.use_pallas,
        )
        log.write(**mll)
        print("log-likelihood bounds (nats/sample):",
              " ".join(f"{k}={v:.2f}" for k, v in mll.items()), flush=True)

    if args.plots_dir and k >= 1:
        os.makedirs(args.plots_dir, exist_ok=True)
        from vae_assoc_tpu.models import assoc as assoc_mod
        from vae_assoc_tpu.utils import viz

        # The image-grid plots assume modality 0 is the 28x28 image branch;
        # config 2 is trajectory-only, where reshaping 200-dim features to
        # 28x28 would crash after the whole run.
        has_image_0 = cfg.modalities[0].arch["n_input"] == 784
        imgs = np.asarray(eval_xs[0][:8])
        # Conditional runs: the trailing eval_xs entry is the one-hot cond.
        cond8 = eval_xs[k][:8] if args.conditional else None
        if has_image_0:
            recon = np.asarray(
                assoc_mod.cross_generate(
                    final_params, eval_xs[0][:8], cfg, src=0, dst=0,
                    compute_dtype=tc.compute_dtype, cond=cond8,
                )
            )
            viz.reconstruction_grid(imgs, recon).savefig(
                os.path.join(args.plots_dir, "reconstructions.png"), dpi=120
            )
        zs = assoc_mod.transform(
            final_params, eval_xs, cfg, compute_dtype=tc.compute_dtype
        )
        labels = None
        if eval_labels is not None:
            labels = np.asarray(eval_labels)[:n_eval]
        viz.latent_scatter(np.asarray(zs[0]), labels).savefig(
            os.path.join(args.plots_dir, "latent_scatter.png"), dpi=120
        )
        if has_image_0:
            # Metzen-lineage latent-manifold canvas over the first two
            # latent dims; conditional models decode under the uniform
            # class prior (a label-free canvas).
            import jax.numpy as _jnp

            n_z = cfg.n_z
            gkw = dict(compute_dtype=tc.compute_dtype)
            if args.conditional:
                def _decode(z):
                    c = eval_mod.label_blind_cond(z.shape[0], cfg.n_cond)
                    return assoc_mod.generate(
                        final_params, _jnp.asarray(z), cfg, 0,
                        cond=c, **gkw)
            else:
                def _decode(z):
                    return assoc_mod.generate(
                        final_params, _jnp.asarray(z), cfg, 0, **gkw)

            viz.latent_manifold(_decode, n_z=n_z).savefig(
                os.path.join(args.plots_dir, "latent_manifold.png"), dpi=120
            )
            if args.conditional:
                # Per-class generation grid: p(x|c) from the prior, no
                # exemplar — the conditional model's product feature.
                # The SAME z rows repeat across classes so columns are
                # comparable; only the condition varies per row.
                spc_ = 8
                z_rows = np.asarray(jax.random.normal(
                    jax.random.key(tc.seed + 2), (spc_, n_z), jnp.float32))

                def _decode_cls(lab):
                    z = _jnp.asarray(np.tile(z_rows, (cfg.n_cond, 1)))
                    return assoc_mod.generate(
                        final_params, z, cfg, 0, cond=_jnp.asarray(lab),
                        **gkw)

                viz.class_generation_grid(
                    _decode_cls, cfg.n_cond, samples_per_class=spc_
                ).savefig(
                    os.path.join(args.plots_dir, "class_generation.png"),
                    dpi=120,
                )
        if k >= 2 and has_image_0:
            gen_traj = np.asarray(
                assoc_mod.cross_generate(
                    final_params, eval_xs[0][:8], cfg, src=0, dst=1,
                    compute_dtype=tc.compute_dtype, cond=cond8,
                )
            )
            # Generated features are in the trajectory encoding's space;
            # decode RBF weight vectors back to curves before drawing.
            if args.traj_encoding == "rbf":
                gen_traj = np.asarray(
                    ds.decode_trajectories(gen_traj)
                ).reshape(gen_traj.shape[0], -1)
            viz.trajectories_over_images(imgs, gen_traj).savefig(
                os.path.join(args.plots_dir, "image_to_trajectory.png"), dpi=120
            )
        print(f"plots written to {args.plots_dir}", flush=True)

    log.close()
    print("done:", " ".join(f"{k}={v:.5f}" for k, v in mse.items()), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
