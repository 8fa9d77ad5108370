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
    # Both arms built up front, timed INTERLEAVED best-of-3 (the CLAUDE.md
    # perf-measurement protocol: one process, interleaved repeats,
    # device_get-forced) so tunnel-link drift hits both arms equally.
    arms = {}
    for remat in (False, True):
        tc = TrainConfig(batch_size=BATCH, remat=remat)
        state = init_train_state(cfg, tc)
        step = make_train_step(cfg, tc)
        mem = step.lower(state, xs).compile().memory_analysis()
        state, m = step(state, xs)  # warm/compile
        jax.device_get(m["total"])
        arms[remat] = dict(step=step, state=state, mem=mem, best=float("inf"))
        print(
            f"remat={remat}: temp {mem.temp_size_in_bytes/2**20:8.1f} MiB  "
            f"args {mem.argument_size_in_bytes/2**20:8.1f} MiB  "
            f"out {mem.output_size_in_bytes/2**20:8.1f} MiB",
            flush=True,
        )
    for rep in range(3):
        for remat, a in arms.items():
            t0 = time.perf_counter()
            for _ in range(STEPS):
                a["state"], m = a["step"](a["state"], xs)
            jax.device_get(m["total"])  # axon: block returns at enqueue
            dt = (time.perf_counter() - t0) / STEPS
            a["best"] = min(a["best"], dt)
            print(f"  rep {rep} remat={remat}: {dt*1e3:7.2f} ms/step",
                  flush=True)
    off, on = arms[False], arms[True]
    print(
        f"temp HBM: {off['mem'].temp_size_in_bytes/2**20:.1f} -> "
        f"{on['mem'].temp_size_in_bytes/2**20:.1f} MiB; "
        f"best-of-3 step time {off['best']*1e3:.2f} -> "
        f"{on['best']*1e3:.2f} ms ({on['best']/off['best']:.2f}x)"
    )


if __name__ == "__main__":
    main()
