"""Upper-bound the megakernel assoc-fold idea (VERDICT round-2 #8).

Proposal: fold the association term's μ-interaction into the megakernel
pass instead of "round-tripping μ through XLA". Before building it,
measure the ceiling: time the full mega-path train step against a
variant whose XLA-side epilogue (assoc term + the per-term means over
the kernel outputs) is deleted. The delta is everything a fold could
possibly save — if it is ~0, the fold cannot win and the negative result
goes to docs/PERF.md with this number attached.

Arithmetic expectation: μ is [B, n_z=20] per modality; at B=16384 that
is 1.3 MB/modality — ~3 µs of HBM traffic against a ~3.7 ms step.

Run: PYTHONPATH=/root/repo python scripts/bench_assoc_fold_bound.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu"

from vae_assoc_tpu.configs import baseline_config
from vae_assoc_tpu.kernels.megakernel import vae_tower_fused
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.ops import losses
from vae_assoc_tpu.train.step import init_train_state, make_optimizer

B = 16384
cfg, tc = baseline_config(5, batch_size=B, use_pallas="mega", steps_per_call=1)
opt = make_optimizer(tc)
rng = np.random.default_rng(0)
xs = [
    jnp.asarray(rng.uniform(0, 1, (B, 784)).astype(np.float32)),
    jnp.asarray(rng.normal(size=(B, 200)).astype(np.float32)),
]


def loss_full(params, xs, key):
    return assoc_mod.assoc_loss_fn(
        params, list(xs), cfg, key=key, compute_dtype=tc.compute_dtype,
        use_pallas="mega",
    )[0]


def loss_no_epilogue(params, xs, key):
    """Mega towers only: per-sample terms summed with a single jnp.sum —
    no assoc term, no per-term means (the entire XLA epilogue removed)."""
    keys = jax.random.split(key, len(cfg.modalities))
    total = jnp.float32(0.0)
    for p, x, m, kk in zip(params["modalities"], xs, cfg.modalities, keys):
        out = vae_tower_fused(
            p, x, kind=m.recon, key=kk, compute_dtype=tc.compute_dtype
        )
        total = total + jnp.sum(out["recon_term"]) + jnp.sum(out["kl_term"])
    return total / B


def step_of(loss_fn):
    @jax.jit
    def step(params, o_state, xs, key):
        g = jax.grad(loss_fn)(params, xs, key)
        updates, o_state = opt.update(g, o_state, params)
        import optax

        return optax.apply_updates(params, updates), o_state

    return step


def timeit(step, params, o_state, reps=30):
    key = jax.random.key(0)
    params, o_state = step(params, o_state, xs, key)  # compile
    jax.device_get(jax.tree.leaves(params)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(reps):
            params, o_state = step(params, o_state, xs, jax.random.key(i))
        jax.device_get(jax.tree.leaves(params)[0])
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


state = init_train_state(cfg, tc)
for name, fn in (("full (assoc + means in XLA)", loss_full),
                 ("no-epilogue bound", loss_no_epilogue)):
    params = jax.tree.map(jnp.copy, state.params)
    o = opt.init(params)
    ms = timeit(step_of(fn), params, o)
    print(f"{name:28s} {ms:7.3f} ms/step  {B / (ms / 1e3):,.0f} samples/s",
          flush=True)
