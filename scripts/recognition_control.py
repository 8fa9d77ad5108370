"""Latent-recognition A/B on TPU: association term ON vs OFF.

The paper's second metric (SURVEY.md §0) is character recognition from the
latent encodings; `train.eval.recognition_accuracy` measures it as
leave-one-out k-NN accuracy over z-means, per modality and cross-modally.
This script trains config 3 twice — once with the default assoc_lambda and
once with assoc_lambda=0 — and prints both recognition grids. Expected
(measured, BASELINE.md "Latent recognition"): same-modality ≈1.0 in both
runs; cross-modal transfer ≈0.99 with the association term and ≈10-class
chance without it — the metric detects exactly what the term does.

Run:  PYTHONPATH=/root/repo python scripts/recognition_control.py
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from vae_assoc_tpu.configs import baseline_config
from vae_assoc_tpu.data.pipeline import PairedDataset
from vae_assoc_tpu.train.eval import recognition_accuracy
from vae_assoc_tpu.train.loop import train_loop_fused

ds = PairedDataset.from_synthetic(8192, seed=0)
imgs, trajs = ds.features()
for lam in (None, 0.0):
    cfg, tc = baseline_config(3, batch_size=1024)
    tc = dataclasses.replace(tc, compute_dtype=jnp.bfloat16, use_pallas=True)
    if lam is not None:
        cfg = dataclasses.replace(cfg, assoc_lambda=lam)
    state, _ = train_loop_fused(
        cfg, tc, [np.asarray(imgs), np.asarray(trajs)], epochs=60
    )
    rec = recognition_accuracy(
        state.params, [imgs, trajs], ds.labels, cfg,
        compute_dtype=tc.compute_dtype, use_pallas=tc.use_pallas,
    )
    print(
        f"lambda={'default' if lam is None else lam}:",
        " ".join(f"{k}={v:.3f}" for k, v in sorted(rec.items())),
    )
