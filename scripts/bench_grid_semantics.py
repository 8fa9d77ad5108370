"""Measured experiment: 'parallel' grid dimension semantics on the forward
Pallas kernels (kernels/mlp._fwd_compiler_params).

The forward kernels' grid steps are independent (each writes only its own
batch-tile rows), so declaring dimension_semantics=("parallel",) is always
legal; this measures whether Mosaic turns that into anything on v5e (a
single-TensorCore part — the main known consumer of 'parallel' is megacore
partitioning on dual-core parts). Backward kernels accumulate across grid
steps and must keep 'arbitrary'.

Protocol (docs/PERF.md): interleaved arm blocks (off/on, repeated) so link
drift cannot masquerade as an effect; each block re-traces from scratch
(jax.clear_caches — the knob is module state, not part of any cache key);
timing from train_loop_fused's device_get-forced samples/sec, best of the
arm's blocks.
"""

import jax
import jax.numpy as jnp

from vae_assoc_tpu.kernels import mlp


def run_block(mode, data, epochs=12, timed_calls=2):
    from vae_assoc_tpu.configs import baseline_config
    from vae_assoc_tpu.train.loop import train_loop_fused

    cfg, tc = baseline_config(
        3, batch_size=16384, compute_dtype=jnp.bfloat16,
        steps_per_call=4, use_pallas=mode,
    )
    state, _ = train_loop_fused(cfg, tc, data, epochs=epochs, shuffle=True)
    best = 0.0
    for _ in range(timed_calls):
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

    # Restore the SHIPPED default (True) whatever happens mid-arm — a
    # link timeout must not leave module state on the losing arm, and a
    # live session calling main() must keep the production declaration.
    try:
        for mode in ("mega", True):
            results = {False: [], True: []}
            for block in range(2):
                for knob in (False, True):
                    mlp._PARALLEL_FWD_GRID = knob
                    jax.clear_caches()  # force a full retrace under the knob
                    sps = run_block(mode, data)
                    results[knob].append(sps)
                    print(f"use_pallas={mode!r} parallel_grid={knob} "
                          f"block {block}: {sps:,.0f} samples/s", flush=True)
            off, on = max(results[False]), max(results[True])
            print(f"== use_pallas={mode!r}: off {off:,.0f} vs on {on:,.0f} "
                  f"({(on / off - 1) * 100:+.1f}%)", flush=True)
    finally:
        mlp._PARALLEL_FWD_GRID = True
        jax.clear_caches()


if __name__ == "__main__":
    main()
