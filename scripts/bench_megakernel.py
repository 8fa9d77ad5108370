"""Measured experiment: composable Pallas kernels vs the tower megakernel.

Times the full fused training loop (shuffle + gather + steps, one device
program) at the headline bench shapes for use_pallas=True (composable
enc/sampler/dec/loss kernels) vs use_pallas="mega" (one forward launch
per modality, split fused backward). Timing discipline per docs/PERF.md:
device_get-forced completion, best of N repeats (the device link injects
latency spikes). Result recorded in docs/PERF.md.
"""

import jax
import jax.numpy as jnp


def run(mode, data, epochs=12, repeats=3):
    from vae_assoc_tpu.configs import baseline_config
    from vae_assoc_tpu.train.loop import train_loop_fused

    cfg, tc = baseline_config(
        3, batch_size=16384, compute_dtype=jnp.bfloat16,
        steps_per_call=4, use_pallas=mode,
    )
    # Warm compile; thread the (donated) state through timed repeats so no
    # state re-initialization dispatches land inside the timed region —
    # identical protocol to bench.py.
    state, _ = train_loop_fused(cfg, tc, data, epochs=epochs, shuffle=True)
    best = 0.0
    for _ in range(repeats):
        state, hist = train_loop_fused(
            cfg, tc, data, epochs=epochs, state=state, shuffle=True
        )
        best = max(best, hist[-1]["samples_per_sec"])
    return best


def main():
    from vae_assoc_tpu.data.pipeline import PairedDataset

    assert jax.default_backend() == "tpu"
    ds = PairedDataset.from_synthetic(65536, seed=0)
    imgs, trajs = ds.features()
    jax.device_get(imgs[:1])
    data = [imgs, trajs]

    for mode in (True, "mega"):
        sps = run(mode, data)
        print(f"use_pallas={mode!r}: {sps:,.0f} samples/sec/chip", flush=True)


if __name__ == "__main__":
    main()
