"""Standalone model evaluation CLI: every quality metric over a saved model.

``python -m vae_assoc_tpu.evaluate MODEL_DIR --data synthetic`` (console
script ``vae-assoc-eval``) loads a self-describing `save_model` directory
(model_config.json + orbax checkpoint — the same artifact `serve.
Predictor.load` consumes) and runs the full evaluation battery the driver
performs post-train, WITHOUT retraining:

- cross-modal reconstruction MSE grid (the BASELINE.json:2 quality gate),
- held-out loss surface (ELBO terms, `train.eval.eval_metrics`),
- latent recognition (LOO k-NN, per-modality + cross-modal transfer;
  conditional models are probed LABEL-BLIND with the uniform class prior
  — the true one-hot would leak the answer into the latent),
- optional IWAE/ELBO marginal-likelihood bounds (``--mll-samples K``).

The reference had no such verb — its workflow was "restore in a Python
shell and eyeball plots" (SURVEY.md §4); this is the production
equivalent: one command, one JSON result on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_parser():
    p = argparse.ArgumentParser(
        prog="vae-assoc-eval",
        description="Evaluate a saved vae_assoc_tpu model (MSE grid, ELBO "
                    "terms, latent recognition, optional IWAE bounds).",
    )
    p.add_argument("model_dir", help="save_model directory "
                                     "(model_config.json + checkpoint)")
    p.add_argument("--data", choices=("synthetic", "uji"), default="synthetic")
    p.add_argument("--n-samples", type=int, default=2048,
                   help="synthetic dataset size")
    p.add_argument("--uji-paths", nargs="+", default=None)
    p.add_argument("--traj-encoding", choices=("resample", "rbf"),
                   default=None,
                   help="default: the encoding recorded in the model dir's "
                        "model_config.json 'data' section (driver "
                        "checkpoints record it; the arch width alone can't "
                        "distinguish rbf(100) from resample(100), both "
                        "200-wide); an explicit value contradicting the "
                        "recorded one fails loudly")
    p.add_argument("--rbf-centers", type=int, default=None)
    p.add_argument("--data-seed", type=int, default=0)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--batch-size", type=int, default=1024,
                   help="evaluation chunk size (bounded compile set)")
    p.add_argument("--max-samples", type=int, default=4096,
                   help="cap on rows used for recognition / MLL")
    p.add_argument("--knn-k", type=int, default=5)
    p.add_argument("--mll-samples", type=int, default=0, metavar="K",
                   help="K>0: add K-sample IWAE/ELBO bounds (nats/sample)")
    p.add_argument("--seed", type=int, default=0,
                   help="eval ε / MLL draw seed (deterministic per seed)")
    p.add_argument("--json", default=None, metavar="PATH",
                   help="also write the result dict to this file")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (overrides any TPU plugin)")
    return p


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    import jax

    if args.cpu:
        # Env vars are too late once a TPU PJRT plugin pre-registered at
        # interpreter start; the config update still wins (lazy backends).
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from vae_assoc_tpu.configs import load_model_config
    from vae_assoc_tpu.data.pipeline import PairedDataset
    from vae_assoc_tpu.train import eval as eval_mod
    from vae_assoc_tpu.train.step import eval_params, init_train_state
    from vae_assoc_tpu.utils import checkpoint as ckpt

    model_dir = os.path.abspath(os.path.expanduser(args.model_dir))
    try:
        cfg, tc, raw = load_model_config(model_dir)
    except FileNotFoundError as e:
        raise SystemExit(str(e))
    if tc is None:
        from vae_assoc_tpu.configs import TrainConfig

        tc = TrainConfig()
    # Resolve the featurization against what the model was trained on
    # (recorded by driver checkpoints; the arch width alone is ambiguous —
    # rbf(100 centers) and resample(100 timesteps) are both 200-wide).
    meta = raw.get("data", {})
    enc = args.traj_encoding or meta.get("traj_encoding") or "resample"
    if (args.traj_encoding and meta.get("traj_encoding")
            and args.traj_encoding != meta["traj_encoding"]):
        raise SystemExit(
            f"--traj-encoding {args.traj_encoding} contradicts the recorded "
            f"training featurization {meta['traj_encoding']!r} "
            "(model_config.json 'data')"
        )
    centers = args.rbf_centers or meta.get("rbf_centers") or 100
    state = ckpt.restore(model_dir, init_train_state(cfg, tc), step=args.step)
    # EMA-trained models evaluate on the debiased averaged weights, the
    # same choice the driver makes post-train.
    params = eval_params(tc, state)

    kw = dict(traj_encoding=enc, rbf_centers=centers)
    if args.data == "uji":
        if not args.uji_paths:
            raise SystemExit("--data uji requires --uji-paths")
        ds = PairedDataset.from_uji(args.uji_paths, **kw)
    else:
        ds = PairedDataset.from_synthetic(args.n_samples, seed=args.data_seed, **kw)
    imgs, trajs = ds.features()
    by_name = {"image": imgs, "trajectory": trajs}
    missing = [m.name for m in cfg.modalities if m.name not in by_name]
    if missing:
        raise SystemExit(f"dataset provides image/trajectory; model needs {missing}")
    xs = [by_name[m.name] for m in cfg.modalities]
    for m, x in zip(cfg.modalities, xs):
        if int(x.shape[1]) != int(m.arch["n_input"]):
            raise SystemExit(
                f"feature width mismatch for {m.name!r}: dataset gives "
                f"{int(x.shape[1])}, model expects {m.arch['n_input']} — "
                "check --traj-encoding/--rbf-centers against the training run"
            )

    labels = None if ds.labels is None else np.asarray(ds.labels)
    if cfg.n_cond > 0:
        if labels is None:
            raise SystemExit("conditional model: the dataset must be labeled")
        n_classes = int(labels.max()) + 1
        if n_classes > cfg.n_cond:
            raise SystemExit(
                f"dataset has {n_classes} classes but the model was trained "
                f"with n_cond={cfg.n_cond}"
            )
        xs = xs + [np.eye(cfg.n_cond, dtype=np.float32)[labels]]

    ekw = dict(compute_dtype=tc.compute_dtype, use_pallas=tc.use_pallas)
    result = {
        "model_dir": model_dir,
        "step": int(jax.device_get(state.step)),
        "data": args.data,
        "n_samples": int(xs[0].shape[0]),
        "backend": jax.default_backend(),
    }
    result.update(
        {f"mse_{k}": v for k, v in eval_mod.evaluate(params, xs, cfg, **ekw).items()}
    )
    em = eval_mod.eval_metrics(
        params, xs, cfg, batch_size=args.batch_size, seed=args.seed, **ekw
    )
    # Drop eval_metrics' embedded MSE grid (keys like "image->trajectory")
    # — the mse_* grid above already reports it under the canonical names.
    result.update({k: float(v) for k, v in em.items() if "->" not in k})
    if labels is not None and xs[0].shape[0] >= 2:
        n = min(int(xs[0].shape[0]), args.max_samples)
        rec_xs = [x[:n] for x in xs]
        if cfg.n_cond > 0:
            # Label-blind probe (see module docstring / driver).
            rec_xs[-1] = eval_mod.label_blind_cond(n, cfg.n_cond)
        result.update(eval_mod.recognition_accuracy(
            params, rec_xs, labels[:n], cfg, k=args.knn_k, **ekw
        ))
    if args.mll_samples > 0:
        result.update(eval_mod.marginal_log_likelihood(
            params, xs, cfg, n_importance=args.mll_samples,
            seed=args.seed, max_samples=args.max_samples, **ekw
        ))

    line = json.dumps(result)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
