"""Measured A/B: E-model vmapped sweep (train/sweep.py) vs E sequential
single-model runs, config-3 joint model, real TPU.

The sweep's claim is that E reference-scale towers batched by vmap fill
the MXU better than E sequential runs of an MXU-underutilizing model
(docs/PERF.md "Where the remaining ~4× goes"). Methodology per
docs/PERF.md: one process, interleaved repeats, best-of-3,
`device_get`-forced completion; steps fused with lax.scan so the
high-latency link is out of the reading. "model-samples/s" = samples/s
summed over all E models — the number to compare against the single-run
column times E.

Run: PYTHONPATH=/root/repo python scripts/bench_sweep.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu"

from vae_assoc_tpu.configs import baseline_config
from vae_assoc_tpu.train.step import init_train_state, make_train_step
from vae_assoc_tpu.train.sweep import init_sweep_state, make_sweep_step

E = 8
SPC = 50  # steps per fused call
REPS = 3


def stage(rng, b, spc):
    return [
        jnp.asarray(rng.uniform(0, 1, (spc, b, 784)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(spc, b, 200)).astype(np.float32)),
    ]


def run_case(batch, compute_dtype):
    cfg, tc = baseline_config(
        3, batch_size=batch, steps_per_call=SPC, compute_dtype=compute_dtype
    )
    rng = np.random.default_rng(0)
    xs = stage(rng, batch, SPC)

    single = make_train_step(cfg, tc)
    sweep = make_sweep_step(cfg, tc)

    def time_single():
        st = init_train_state(cfg, tc)
        st, m = single(st, xs)  # compile + warm
        jax.device_get(m)
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            st, m = single(st, xs)
            jax.device_get(m)
            best = min(best, time.perf_counter() - t0)
        return SPC * batch / best

    def time_sweep():
        st = init_sweep_state(cfg, tc, list(range(E)))
        st, m = sweep(st, xs)
        jax.device_get(m)
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            st, m = sweep(st, xs)
            jax.device_get(m)
            best = min(best, time.perf_counter() - t0)
        return SPC * batch * E / best

    # Interleave the arms so link drift hits both equally.
    s1 = time_single()
    w1 = time_sweep()
    s2 = time_single()
    w2 = time_sweep()
    single_sps, sweep_sps = max(s1, s2), max(w1, w2)
    return single_sps, sweep_sps


print(f"E={E} models, {SPC} steps/call, best-of-{REPS}, interleaved arms")
print(f"{'regime':>24} {'1-model samples/s':>18} {'sweep model-samples/s':>22} "
      f"{'vs E sequential':>16}")
for batch, dt, label in (
    (64, jnp.float32, "reference b64 fp32"),
    (256, jnp.bfloat16, "b256 bf16"),
    (1024, jnp.bfloat16, "b1024 bf16"),
    (4096, jnp.bfloat16, "b4096 bf16 (bench regime)"),
):
    single_sps, sweep_sps = run_case(batch, dt)
    print(f"{label:>24} {single_sps:>18,.0f} {sweep_sps:>22,.0f} "
          f"{sweep_sps / single_sps:>15.2f}x")
