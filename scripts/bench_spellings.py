"""Saturation throughput for the NON-default spellings (VERDICT r3 #3).

The 4.4M samples/s headline covers only the parity spelling (depth-2,
unconditional, mean_l2, megakernel). This measures, at the same
saturation regime (batch 16384, bf16, fused loop, best-of-3,
device_get-forced):

  - conditional (n_cond=10) x composable kernels and x the megakernel
    (the round-4 mega-conditional extension)
  - the three alternate assoc forms (sample_l2 / sym_kl / infonce) on the
    composable-kernel path (they are outside the megakernel's closed
    world; the loud fallback fires once per build)
  - mean_l2 on both paths, as the same-session anchor rows

All arms warm first, then repeats interleave so every arm sees the same
thermal/link regime. Results -> BASELINE.md "Saturation throughput by
spelling" + docs/PERF.md.

Run: PYTHONPATH=/root/repo python scripts/bench_spellings.py
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu"

from vae_assoc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/.cache/vae_assoc_bench_xla")  # rerun != recompile

from vae_assoc_tpu.configs import baseline_config
from vae_assoc_tpu.data.pipeline import PairedDataset
from vae_assoc_tpu.train.loop import train_loop_fused

N = 65536
BATCH = 16384
EPOCHS = 12
REPS = 3
N_COND = 10

ds = PairedDataset.from_synthetic(N, seed=0)
imgs, trajs = ds.features()
jax.device_get(imgs[:1])
rng = np.random.default_rng(0)
onehot = np.eye(N_COND, dtype=np.float32)[rng.integers(0, N_COND, N)]


def make_arm(*, use_pallas, n_cond=0, assoc_form="mean_l2"):
    cfg, tc = baseline_config(
        3, batch_size=BATCH, compute_dtype=jnp.bfloat16,
        steps_per_call=4, use_pallas=use_pallas,
    )
    cfg = dataclasses.replace(cfg, assoc_form=assoc_form)
    if n_cond:
        cfg = dataclasses.replace(
            cfg,
            modalities=tuple(
                dataclasses.replace(m, n_cond=n_cond) for m in cfg.modalities
            ),
        )
    data = [imgs, trajs] + ([onehot] if n_cond else [])
    return cfg, tc, data


ARMS = {
    "mean_l2   composable        ": make_arm(use_pallas=True),
    "mean_l2   mega (headline)   ": make_arm(use_pallas="mega"),
    "cond=10   composable        ": make_arm(use_pallas=True, n_cond=N_COND),
    "cond=10   mega              ": make_arm(use_pallas="mega", n_cond=N_COND),
    "sample_l2 composable        ": make_arm(use_pallas=True, assoc_form="sample_l2"),
    "sym_kl    composable        ": make_arm(use_pallas=True, assoc_form="sym_kl"),
    "sym_kl    mega (round 4)    ": make_arm(use_pallas="mega", assoc_form="sym_kl"),
    "infonce   composable        ": make_arm(use_pallas=True, assoc_form="infonce"),
    "infonce   mega (round 4)    ": make_arm(use_pallas="mega", assoc_form="infonce"),
}

states = {}
for name, (cfg, tc, data) in ARMS.items():
    state, _ = train_loop_fused(cfg, tc, data, epochs=EPOCHS, shuffle=True)
    states[name] = state
    print(f"warm {name}: compiled", flush=True)

best = {name: 0.0 for name in ARMS}
for rep in range(REPS):
    for name, (cfg, tc, data) in ARMS.items():
        state, hist = train_loop_fused(
            cfg, tc, data, epochs=EPOCHS, state=states[name], shuffle=True
        )
        states[name] = state
        best[name] = max(best[name], hist[-1]["samples_per_sec"])

print(f"\nfused loop, batch {BATCH}, bf16, best of {REPS} (interleaved):")
for name, sps in best.items():
    print(f"  {name}: {sps:12,.0f} samples/s/chip")
