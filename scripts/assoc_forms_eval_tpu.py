"""Quality A/B of the association-term forms on TPU (config 3).

SURVEY.md §7 flags the reference's exact association form as an unverified
[R] reconstruction, so the framework ships all candidate readings
(`AssocConfig.assoc_form`: mean_l2 / sample_l2 / sym_kl) plus the modern
CLIP-style `infonce`. This script answers the follow-up question — do the
alternates WORK as objectives, and how do they compare? — by training
config 3 once per form at an identical budget and measuring:

- cross-modal generation MSE both directions (the BASELINE.json quality
  gate metric), and
- latent-recognition transfer (leave-one-out k-NN, the paper's second
  metric): classify one modality's latents against the OTHER modality's
  reference set — a direct readout of how well each form aligns the two
  latent spaces.

Results are recorded in BASELINE.md "Association forms". Run:
  PYTHONPATH=/root/repo python scripts/assoc_forms_eval_tpu.py
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from vae_assoc_tpu.configs import baseline_config
from vae_assoc_tpu.data.pipeline import PairedDataset
from vae_assoc_tpu.ops.losses import ASSOC_FORMS
from vae_assoc_tpu.train.eval import cross_modal_mse, recognition_accuracy
from vae_assoc_tpu.train.loop import train_loop_fused

EPOCHS = 60

ds = PairedDataset.from_synthetic(8192, seed=0)
imgs, trajs = ds.features()
data = [np.asarray(imgs), np.asarray(trajs)]

for form in ASSOC_FORMS:
    cfg, tc = baseline_config(3, batch_size=1024)
    # Same spelling as recognition_control.py; the mega path falls back to
    # the composable kernels for non-default forms (models/assoc.py).
    tc = dataclasses.replace(tc, compute_dtype=jnp.bfloat16, use_pallas=True)
    cfg = dataclasses.replace(cfg, assoc_form=form)
    state, history = train_loop_fused(cfg, tc, data, epochs=EPOCHS)
    final = history[-1]["total"]
    mse = cross_modal_mse(
        state.params, [imgs, trajs], cfg,
        compute_dtype=tc.compute_dtype, use_pallas=tc.use_pallas,
    )
    rec = recognition_accuracy(
        state.params, [imgs, trajs], ds.labels, cfg,
        compute_dtype=tc.compute_dtype, use_pallas=tc.use_pallas,
    )
    print(
        f"{form:9s} total={final:8.2f} "
        f"img->traj={float(mse['image->trajectory']):.4f} "
        f"traj->img={float(mse['trajectory->image']):.4f} "
        + " ".join(f"{k}={float(v):.3f}" for k, v in sorted(rec.items())),
        flush=True,
    )
