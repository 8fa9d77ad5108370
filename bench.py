"""Headline benchmark: joint-VAE training samples/sec/chip on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The baseline is the CPU TensorFlow oracle (`benchmarks/oracle_tf.py`) — a
faithful TF re-implementation of the reference's training regime, the
reference itself publishing no numbers (BASELINE.json:13). Measured on this
host's CPU: 3787 samples/sec at the reference's batch 64, 7554 samples/sec
at batch 1024 (best case). We compare against the oracle's BEST number.
Target: ≥10× (BASELINE.json:5).

The measured path is end-to-end steady-state training: device-resident
data, per-epoch device-side shuffle gathers, multi-step `lax.scan` train
calls (forward + backward + Adam fused in one XLA program), bf16 matmuls
with fp32 accumulation.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

# CPU TF oracle samples/sec on this host (benchmarks/oracle_tf.py):
# batch 64 → 3787, batch 1024 → 7554. Use the best.
ORACLE_SAMPLES_PER_SEC = 7554.0


def main():
    from vae_assoc_tpu.configs import baseline_config
    from vae_assoc_tpu.data.pipeline import PairedDataset
    from vae_assoc_tpu.train.loop import train_loop_fused

    cfg, tc = baseline_config(
        3,
        batch_size=16384,  # saturates the chip (sweep: 4096→2.8M, 16384→3.3M)
        compute_dtype=jnp.bfloat16,
        steps_per_call=4,
        use_pallas="mega",  # per-modality tower megakernels: +13% over the
        # composable Pallas kernels, which are +14% over XLA (docs/PERF.md)
    )

    # Synthetic paired dataset, featurized on device by the input pipeline —
    # features stay in HBM (device arrays pass straight into the train loop;
    # a host round-trip here would re-pay the device link twice).
    ds = PairedDataset.from_synthetic(65536, seed=0)
    imgs, trajs = ds.features()
    data = [imgs, trajs]
    jax.device_get(imgs[:1])  # force featurization to finish before timing

    # First call compiles; later calls hit the jit cache → steady state.
    # The fused loop runs shuffle + gather + every train step of all epochs
    # as one device program (single host round-trip), so the measured
    # number includes the full input pipeline, not just the matmuls. Take
    # the best of a few timed repeats — the remote device link occasionally
    # adds multi-second latency spikes that would understate steady state.
    state, _ = train_loop_fused(cfg, tc, data, epochs=12, shuffle=True)
    sps = 0.0
    for _ in range(5):  # each repeat ~3 s; the link's latency spikes are
        # intermittent, so more repeats = a tighter best-of estimate
        state, history = train_loop_fused(
            cfg, tc, data, epochs=12, state=state, shuffle=True
        )
        sps = max(sps, history[-1]["samples_per_sec"])
    n_chips = 1  # single-chip measurement; metric is per chip
    value = sps / n_chips

    print(
        json.dumps(
            {
                "metric": "joint_vae_train_samples_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(value / ORACLE_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
