"""A/B the round-5 infonce changes at the saturation batch (VERDICT r4 #5).

Arms, interleaved in one session (bench.py regime — train_loop_fused,
bf16, "mega" dispatch, batch 16384):

  dense    — the round-4 spelling: the [16384, 16384] logit matrix
             materializes per pair per direction (forced by raising the
             streaming threshold), the measured 0.79M samples/s row;
  streamed — the default since round 5: blockwise running-max logsumexp,
             the logit matrix never exists (ops/losses._lse_rows_streamed);
  dp_step_local / dp_step_global — STEP-level arms through the 1-chip DP
             mesh (device-resident shards, repeated jitted-step calls):
             isolates the assoc_negatives="global" code-path overhead —
             the all_gather folds away on one device (wire cost on a real
             mesh is [B_local, n_z] ≈ 1.3 MB/pair vs ~0.85 GB/step of
             tower traffic). An epoch-loop arm would measure host shuffle
             + axon-tunnel staging instead (~6.5k samples/s).

Run:  PYTHONPATH=/root/repo python scripts/bench_infonce.py
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices())

from vae_assoc_tpu.configs import baseline_config
from vae_assoc_tpu.ops import losses
from vae_assoc_tpu.train.loop import train_loop_fused

BATCH = 16384
EPOCH_SAMPLES = 65536
DENSE_THRESHOLD = 1 << 30

rng = np.random.default_rng(0)
data = None

_NEW_INFONCE = losses._infonce


def _round4_infonce(z_means, temp, *, negatives="local", gather_axis=None):
    """The round-4 spelling, for the same-session baseline arm: ONE [B,B]
    matmul per pair, both softmax reductions over the materialized matrix
    (the 0.79M BASELINE.md row)."""
    zs = [jnp.asarray(z, jnp.float32) for z in z_means]
    inv_t = jnp.float32(1.0 / temp)
    normed = [
        z * jax.lax.rsqrt(jnp.sum(z * z, axis=-1, keepdims=True) + 1e-12)
        for z in zs
    ]
    total = jnp.zeros(zs[0].shape[0], dtype=jnp.float32)
    for i in range(len(zs)):
        for j in range(i + 1, len(zs)):
            logits = (normed[i] @ normed[j].T) * inv_t
            pos = jnp.diagonal(logits)
            ce_row = jax.nn.logsumexp(logits, axis=1) - pos
            ce_col = jax.nn.logsumexp(logits, axis=0) - pos
            total = total + 0.5 * (ce_row + ce_col)
    return total


def run_arm(name, *, negatives, dense, seed, round4=False):
    global data
    losses._infonce = _round4_infonce if round4 else _NEW_INFONCE
    losses._INFONCE_STREAM_MIN_B = DENSE_THRESHOLD if dense else 8192
    cfg, tc = baseline_config(
        3, batch_size=BATCH, compute_dtype=jnp.bfloat16, steps_per_call=4,
        use_pallas="mega", seed=seed,  # distinct seed => distinct compiled
        # program per arm (the step factories are lru_cached on (cfg, tc))
    )
    cfg = dataclasses.replace(cfg, assoc_form="infonce",
                              assoc_negatives=negatives or "local")
    if data is None:
        data = [
            jax.device_put(rng.uniform(0, 1, (EPOCH_SAMPLES, 784))
                           .astype(np.float32)),
            jax.device_put(rng.normal(size=(EPOCH_SAMPLES, 200))
                           .astype(np.float32)),
        ]
        jax.device_get(data[0][:1])
    if negatives is not None:
        # STEP-level arm through the 1-chip DP mesh (the layout where the
        # data_axis threading and the all_gather are real): device-resident
        # shards, repeated jitted-step calls, device_get-forced. An
        # epoch-loop arm would measure host shuffle + tunnel staging
        # (~6.5k samples/s — the axon link), not the loss path.
        import time

        from vae_assoc_tpu.parallel import (
            init_dp_train_state,
            make_dp_train_step,
            make_mesh,
            shard_batch,
        )

        mesh = make_mesh(1)
        state = init_dp_train_state(cfg, tc, mesh)
        step_fn = make_dp_train_step(cfg, tc, mesh)
        spc = tc.steps_per_call
        xs = shard_batch(
            mesh,
            [np.asarray(jax.device_get(d)).reshape(spc, BATCH, -1)
             for d in data],
            leading_scan_axis=True,
        )
        for _ in range(3):  # warm: compile + link settle
            state, m = step_fn(state, xs)
        jax.device_get(m["total"])
        sps = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                state, m = step_fn(state, xs)
            jax.device_get(m["total"])
            dt = time.perf_counter() - t0
            sps = max(sps, 8 * spc * BATCH / dt)
    else:
        state, _ = train_loop_fused(cfg, tc, data, epochs=6, shuffle=True)
        sps = 0.0
        for _ in range(3):
            state, hist = train_loop_fused(cfg, tc, data, epochs=6,
                                           state=state, shuffle=True)
            sps = max(sps, hist[-1]["samples_per_sec"])
    print(json.dumps(dict(arm=name, samples_per_sec=round(sps, 1))), flush=True)
    return sps


results = {}
for rep in range(2):
    for name, kw in (
        ("round4_onematmul", dict(negatives=None, dense=True, seed=1,
                                  round4=True)),
        ("infonce_dense2", dict(negatives=None, dense=True, seed=2)),
        ("infonce_streamed", dict(negatives=None, dense=False, seed=3)),
        ("dp_step_local", dict(negatives="local", dense=False, seed=4)),
        ("dp_step_global", dict(negatives="global", dense=False, seed=5)),
    ):
        sps = run_arm(name, **kw)
        results[name] = max(results.get(name, 0.0), sps)

print(json.dumps({"best": results,
                  "speedup_vs_round4": round(
                      results["infonce_streamed"]
                      / results["round4_onematmul"], 2)}))
