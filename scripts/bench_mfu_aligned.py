"""Falsify (or demonstrate) the MFU-ceiling claim with a lane-aligned arch.

docs/PERF.md "MFU and the roofline" attributes the headline config's ~26%
MFU to the reference GEOMETRY — n_z=20 heads padding 20→128 lanes (6.4×
multiply-by-padding), 784/200-wide edges, and VPU transcendentals — and
predicts that "the lever that would move it is a wider model (512-multiple
hidden dims, bigger n_z), not a better kernel". That is a testable
prediction the repo had never run (VERDICT r4 weak #3 / next #3).

This script runs it: the SAME code path (bench.py's regime —
`train_loop_fused`, bf16, `use_pallas="mega"`, saturation batch 16384,
best-of-N timed calls, cost_analysis FLOPs at steps_per_call=1) on two
arms in one process, interleaved:

  anchor   — the headline reference geometry: 784/200 inputs, 500 hiddens,
             n_z=20 (the published 26% MFU row);
  aligned  — every matmul dim a hardware multiple: 1024/512 inputs,
             512 hiddens, n_z=128 (lane-exact heads, 128-multiple edges).

Prints one JSON line per arm with samples/s, FLOPs/step, achieved TFLOP/s
and MFU vs the v5e bf16 peak, plus a final comparison line. Outcome and
interpretation land in docs/PERF.md ("Roofline validated") and BASELINE.md.

Run:  PYTHONPATH=/root/repo python scripts/bench_mfu_aligned.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices())

from bench import _PEAK_BF16_FLOPS, _model_flops_per_step
from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.train.loop import train_loop_fused

BATCH = 16384
EPOCH_SAMPLES = 65536
REPEATS = 5


def arch(n_input, hidden, n_z):
    return dict(
        n_input=n_input, n_z=n_z,
        n_hidden_recog_1=hidden, n_hidden_recog_2=hidden,
        n_hidden_gener_1=hidden, n_hidden_gener_2=hidden,
    )


ARMS = {
    "anchor_784_500_z20": (arch(784, 500, 20), arch(200, 500, 20)),
    "aligned_1024_512_z128": (arch(1024, 512, 128), arch(512, 512, 128)),
}


def run_arm(name, archs):
    cfg = AssocConfig(
        [
            ModalityConfig("image", archs[0], recon="bernoulli"),
            ModalityConfig("trajectory", archs[1], recon="gaussian"),
        ],
        assoc_lambda=1.0,
    )
    tc = TrainConfig(
        batch_size=BATCH, compute_dtype=jnp.bfloat16, steps_per_call=4,
        use_pallas="mega",
    )
    rng = np.random.default_rng(0)
    data = [
        jax.device_put(rng.uniform(0, 1, (EPOCH_SAMPLES, archs[0]["n_input"]))
                       .astype(np.float32)),
        jax.device_put(rng.normal(size=(EPOCH_SAMPLES, archs[1]["n_input"]))
                       .astype(np.float32)),
    ]
    jax.device_get(data[0][:1])  # staged before timing

    state, _ = train_loop_fused(cfg, tc, data, epochs=12, shuffle=True)  # warm
    sps = 0.0
    for _ in range(REPEATS):
        state, history = train_loop_fused(
            cfg, tc, data, epochs=12, state=state, shuffle=True
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


# Interleave the arms (best-of per arm, alternating) — same discipline as
# every A/B in docs/PERF.md: the tunnel's latency varies on minutes scales,
# so both arms must sample the same window.
results = {}
for rep in range(2):
    for name, archs in ARMS.items():
        t0 = time.perf_counter()
        rec = run_arm(name, archs)
        rec["wall_s"] = round(time.perf_counter() - t0, 1)
        prev = results.get(name)
        if prev is None or rec.get("mfu", 0) > prev.get("mfu", 0):
            results[name] = rec

a, b = results["anchor_784_500_z20"], results["aligned_1024_512_z128"]
print(json.dumps({
    "comparison": "aligned_vs_anchor",
    "anchor_mfu": a.get("mfu"),
    "aligned_mfu": b.get("mfu"),
    "mfu_ratio": round(b["mfu"] / a["mfu"], 2) if a.get("mfu") and b.get("mfu") else None,
    "prediction": "PERF.md roofline: aligned should land well above the "
                  "anchor's ~0.26 if the geometry attribution is right",
}))
