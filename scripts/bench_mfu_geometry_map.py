"""Attribute the residual MFU gap: geometry map across widths/latents.

bench_mfu_aligned.py falsified the strong form of the PERF.md roofline
claim: full lane alignment (1024/512 inputs, 512 hiddens, n_z=128) moved
MFU 0.26 -> 0.32, not the >=2x the geometry attribution implied. This
script maps MFU across geometries to find what actually binds:

  - n_z alone (reference widths, n_z=128): is head padding the lever?
  - hidden width (2048 / 4096 at n_z=128): matmul FLOPs grow ~W^2 while
    transcendental (VPU) work grows ~W. If MFU climbs with width, the
    binding resource at reference scale is the VPU/elementwise stream,
    not MXU tiling.

Same regime as bench.py (train_loop_fused, bf16, mega, batch 16384).
Run:  PYTHONPATH=/root/repo python scripts/bench_mfu_geometry_map.py
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices())

from bench import _PEAK_BF16_FLOPS, _model_flops_per_step
from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.train.loop import train_loop_fused

BATCH = 16384
EPOCH_SAMPLES = 65536


def arch(n_input, hidden, n_z):
    return dict(
        n_input=n_input, n_z=n_z,
        n_hidden_recog_1=hidden, n_hidden_recog_2=hidden,
        n_hidden_gener_1=hidden, n_hidden_gener_2=hidden,
    )


ARMS = [
    ("anchor_784_500_z20", arch(784, 500, 20), arch(200, 500, 20)),
    ("z128_only_784_500", arch(784, 500, 128), arch(200, 500, 128)),
    ("aligned_1024_512_z128", arch(1024, 512, 128), arch(512, 512, 128)),
    # megakernel with the round-5 raised-VMEM plan (weights ~17 MiB resident)
    ("aligned_1024_1024_z128", arch(1024, 1024, 128), arch(512, 1024, 128)),
    # beyond the mega/composable VMEM plans: rides the loud fallback chain
    # down to XLA (the dispatch bug this script found is fixed — these
    # previously Mosaic-OOM'd at compile time)
    ("wide_1024_2048_z128", arch(1024, 2048, 128), arch(512, 2048, 128)),
    ("wide_1024_4096_z128", arch(1024, 4096, 128), arch(512, 4096, 128)),
]


def run_arm(name, a_img, a_traj, epochs=8, repeats=3):
    cfg = AssocConfig(
        [
            ModalityConfig("image", a_img, recon="bernoulli"),
            ModalityConfig("trajectory", a_traj, recon="gaussian"),
        ],
        assoc_lambda=1.0,
    )
    tc = TrainConfig(batch_size=BATCH, compute_dtype=jnp.bfloat16,
                     steps_per_call=4, use_pallas="mega")
    rng = np.random.default_rng(0)
    data = [
        jax.device_put(rng.uniform(0, 1, (EPOCH_SAMPLES, a_img["n_input"]))
                       .astype(np.float32)),
        jax.device_put(rng.normal(size=(EPOCH_SAMPLES, a_traj["n_input"]))
                       .astype(np.float32)),
    ]
    jax.device_get(data[0][:1])
    state, _ = train_loop_fused(cfg, tc, data, epochs=epochs, shuffle=True)
    sps = 0.0
    for _ in range(repeats):
        state, history = train_loop_fused(
            cfg, tc, data, epochs=epochs, state=state, shuffle=True
        )
        sps = max(sps, history[-1]["samples_per_sec"])
    flops = _model_flops_per_step(cfg, tc)
    rec = dict(arm=name, samples_per_sec=round(sps, 1))
    if flops:
        achieved = flops * (sps / BATCH)
        rec["model_flops_per_step"] = round(flops)
        rec["achieved_tflops"] = round(achieved / 1e12, 1)
        peak = _PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
        if peak:
            rec["mfu"] = round(achieved / peak, 3)
    print(json.dumps(rec), flush=True)
    return rec


for name, a_img, a_traj in ARMS:
    run_arm(name, a_img, a_traj)
