"""TPU serving smoke: warm the bucketed Predictor and report request latency.

Trains a reference-scale joint model briefly, snapshots it into a
`Predictor`, warms the power-of-two buckets, then measures end-to-end
request latency (host numpy in → host numpy out, so device→host transfer
is included — `np.asarray` forces completion, which matters on this
backend where `block_until_ready` returns at enqueue; see docs/PERF.md
"Measurement discipline"). Prints a p50/p95 table per bucket; BASELINE.md
records the result. Run: `python scripts/serve_smoke_tpu.py`.
"""

import time

import numpy as np
import jax

import vae_assoc_tpu as vat
from vae_assoc_tpu.serve import Predictor

REPS = 25
BUCKETS = (1, 64, 256, 1024)


def main():
    print("backend:", jax.default_backend(), flush=True)
    arch_img = vat.default_image_arch()
    arch_traj = vat.default_traj_arch()
    model = vat.AssocVariationalAutoEncoder(
        [arch_img, arch_traj],
        recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"],
        assoc_lambda=1.0,
    )
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (256, arch_img["n_input"])).astype(np.float32)
    trajs = rng.normal(size=(256, arch_traj["n_input"])).astype(np.float32)
    for _ in range(5):
        model.partial_fit([imgs, trajs])

    pred = Predictor.from_model(model)
    t0 = time.perf_counter()
    pred.warmup(BUCKETS)
    print(f"warmup({BUCKETS}): {time.perf_counter() - t0:.1f}s", flush=True)

    print(f"{'bucket':>7} {'p50_ms':>9} {'p95_ms':>9}")
    rows = []
    for b in BUCKETS:
        x = rng.uniform(0, 1, (b, arch_img["n_input"])).astype(np.float32)
        lat = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = pred.cross_generate(x, "image", "trajectory")  # np out: forced
            lat.append((time.perf_counter() - t0) * 1e3)
        assert out.shape == (b, arch_traj["n_input"])
        p50, p95 = np.percentile(lat, 50), np.percentile(lat, 95)
        rows.append((b, p50, p95))
        print(f"{b:>7} {p50:>9.2f} {p95:>9.2f}", flush=True)
    return rows


if __name__ == "__main__":
    main()
