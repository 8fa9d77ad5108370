"""A/B sample_l2 on the megakernel vs the composable path (VERDICT r4 #6).

Round 4's spellings table has sample_l2 only on the composable path
(4.09M samples/s) with a ~10% tax vs the 4.48M mega anchor — the mega
path could not serve it (z stayed in-kernel). Round 5 surfaces ε from the
tower forward, so sample_l2 recomputes z = μ + σ·ε in XLA and rides the
mega path. Arms interleave in one session at the bench.py regime
(batch 16384, bf16, fused loop, best-of-3, device_get-forced inside
train_loop_fused):

  sample_l2 composable  — the round-4 row, same-session anchor
  sample_l2 mega        — the round-5 path
  mean_l2   mega        — the headline anchor (context)

Run: PYTHONPATH=/root/repo python scripts/bench_sample_l2_mega.py
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu"

from vae_assoc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/.cache/vae_assoc_bench_xla")

from vae_assoc_tpu.configs import baseline_config
from vae_assoc_tpu.data.pipeline import PairedDataset
from vae_assoc_tpu.train.loop import train_loop_fused

N = 65536
BATCH = 16384
EPOCHS = 12
REPS = 3

ds = PairedDataset.from_synthetic(N, seed=0)
imgs, trajs = ds.features()
jax.device_get(imgs[:1])


def make_arm(*, use_pallas, assoc_form):
    cfg, tc = baseline_config(
        3, batch_size=BATCH, compute_dtype=jnp.bfloat16,
        steps_per_call=4, use_pallas=use_pallas,
    )
    return dataclasses.replace(cfg, assoc_form=assoc_form), tc


ARMS = {
    "sample_l2 composable (r4 row)": make_arm(use_pallas=True, assoc_form="sample_l2"),
    "sample_l2 mega (round 5)     ": make_arm(use_pallas="mega", assoc_form="sample_l2"),
    "mean_l2   mega (headline)    ": make_arm(use_pallas="mega", assoc_form="mean_l2"),
}

states = {}
for name, (cfg, tc) in ARMS.items():
    state, _ = train_loop_fused(cfg, tc, [imgs, trajs], epochs=EPOCHS, shuffle=True)
    states[name] = state
    print(f"warm {name}: compiled", flush=True)

best = {name: 0.0 for name in ARMS}
for rep in range(REPS):
    for name, (cfg, tc) in ARMS.items():
        state, hist = train_loop_fused(
            cfg, tc, [imgs, trajs], epochs=EPOCHS, state=states[name], shuffle=True
        )
        states[name] = state
        best[name] = max(best[name], hist[-1]["samples_per_sec"])
        print(f"rep {rep} {name}: {hist[-1]['samples_per_sec']:12,.0f}", flush=True)

print(f"\nfused loop, batch {BATCH}, bf16, best of {REPS} (interleaved):")
for name, sps in best.items():
    print(f"  {name}: {sps:12,.0f} samples/s/chip")
