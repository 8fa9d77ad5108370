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
                   default="resample",
                   help="must match the encoding the model was trained on "
                        "(checked against the trajectory arch width)")
    p.add_argument("--rbf-centers", type=int, default=100)
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

    from vae_assoc_tpu.configs import config_from_dict
    from vae_assoc_tpu.data.pipeline import PairedDataset
    from vae_assoc_tpu.train import eval as eval_mod
    from vae_assoc_tpu.train.step import eval_params, init_train_state
    from vae_assoc_tpu.utils import checkpoint as ckpt

    model_dir = os.path.abspath(os.path.expanduser(args.model_dir))
    cfg_path = os.path.join(model_dir, "model_config.json")
    if not os.path.exists(cfg_path):
        raise SystemExit(
            f"no model_config.json under {model_dir} — write the model with "
            "AssocVariationalAutoEncoder.save_model() (or the driver's "
            "--ckpt-dir, which writes the same layout)"
        )
    with open(cfg_path) as f:
        cfg, tc = config_from_dict(json.load(f))
    state = ckpt.restore(model_dir, init_train_state(cfg, tc), step=args.step)
    # EMA-trained models evaluate on the debiased averaged weights, the
    # same choice the driver makes post-train.
    params = eval_params(tc, state)

    kw = dict(traj_encoding=args.traj_encoding, rbf_centers=args.rbf_centers)
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
    result.update({k: float(v) for k, v in em.items()
                   if not k.startswith("mse_")})
    if labels is not None and xs[0].shape[0] >= 2:
        n = min(int(xs[0].shape[0]), args.max_samples)
        rec_xs = [x[:n] for x in xs]
        if cfg.n_cond > 0:
            # Label-blind probe (see module docstring / driver).
            rec_xs[-1] = np.full((n, cfg.n_cond), 1.0 / cfg.n_cond, np.float32)
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
