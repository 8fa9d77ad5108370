"""Measure TrainConfig.remat's activation-memory effect on the real TPU.

Compiles the SAME deep-tower train step with remat off/on and reports
XLA's memory analysis (temp = activation/workspace HBM) plus stepped
wall-clock, so docs/PERF.md carries a measured claim instead of a
theoretical one. Runs single-chip; remat is orthogonal to the mesh.

Usage: PYTHONPATH=/root/repo python scripts/bench_remat.py
"""

import time

import jax
import numpy as np

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.train.step import init_train_state, make_train_step

DEPTH, HIDDEN, BATCH, STEPS = 8, 2048, 8192, 10


def arch(n_in, n_z=20):
    d = dict(n_input=n_in, n_z=n_z)
    for k in range(1, DEPTH + 1):
        d[f"n_hidden_recog_{k}"] = HIDDEN
        d[f"n_hidden_gener_{k}"] = HIDDEN
    return d


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    cfg = AssocConfig(
        [
            ModalityConfig("image", arch(784), recon="bernoulli"),
            ModalityConfig("trajectory", arch(200), recon="gaussian"),
        ],
        assoc_lambda=1.0,
    )
    rng = np.random.default_rng(0)
    xs = [
        rng.uniform(0, 1, (BATCH, 784)).astype(np.float32),
        rng.normal(size=(BATCH, 200)).astype(np.float32),
    ]
    rows = {}
    for remat in (False, True):
        tc = TrainConfig(batch_size=BATCH, remat=remat)
        state = init_train_state(cfg, tc)
        step = make_train_step(cfg, tc)
        lowered = step.lower(state, xs)
        mem = lowered.compile().memory_analysis()
        state, m = step(state, xs)  # warm
        jax.device_get(m["total"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = step(state, xs)
        jax.device_get(m["total"])  # axon: block_until_ready returns at enqueue
        dt = (time.perf_counter() - t0) / STEPS
        rows[remat] = (mem, dt)
        print(
            f"remat={remat}: temp {mem.temp_size_in_bytes/2**20:8.1f} MiB  "
            f"args {mem.argument_size_in_bytes/2**20:8.1f} MiB  "
            f"out {mem.output_size_in_bytes/2**20:8.1f} MiB  "
            f"{dt*1e3:7.2f} ms/step  "
            f"({BATCH/dt/1e6:.2f}M samples/s)",
            flush=True,
        )
    off, on = rows[False], rows[True]
    print(
        f"temp HBM: {off[0].temp_size_in_bytes/2**20:.1f} -> "
        f"{on[0].temp_size_in_bytes/2**20:.1f} MiB "
        f"({off[0].temp_size_in_bytes/max(on[0].temp_size_in_bytes,1):.2f}x less), "
        f"step time {off[1]*1e3:.2f} -> {on[1]*1e3:.2f} ms "
        f"({on[1]/off[1]:.2f}x)"
    )


if __name__ == "__main__":
    main()
