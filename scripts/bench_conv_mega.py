"""Config-4 e2e A/B: XLA convs vs composable banded kernels vs the
conv-tower megakernel (VERDICT r3 #1 — fire the unfired shot at the
measured 55% boundary-fusion residual).

Three arms, SAME session, interleaved repeats (docs/PERF.md "Measurement
discipline" — layer-isolation wins can be e2e losses, so the decision
reading is the full train step in one process):

  A. encoder="conv",        use_pallas=True    (XLA convs — the 942k default)
  B. encoder="conv_pallas", use_pallas=True    (composable banded kernels)
  C. encoder="conv",        use_pallas="mega"  (conv-tower megakernel +
                                                MLP tower megakernel)

plus an isolation leg (tower fwd+bwd alone, XLA vs conv-mega) so the e2e
delta decomposes into tower vs remainder.

Regime matches the BASELINE.md config-4 rows: batch 2048, bf16 compute
policy, 10-step scan per device call, best-of-3 timed repeats,
device_get-forced (axon: block_until_ready returns at enqueue).

Run: PYTHONPATH=/root/repo python scripts/bench_conv_mega.py
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu"

from vae_assoc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/.cache/vae_assoc_bench_xla")  # rerun != recompile

from vae_assoc_tpu.configs import baseline_config
from vae_assoc_tpu.train.step import init_train_state, make_train_step

B = 2048
SPC = 10  # steps per device call (amortizes the axon link RTT)
REPS = 3

rng = np.random.default_rng(0)
x_img = rng.uniform(0, 1, (SPC, B, 784)).astype(np.float32)
x_traj = rng.normal(size=(SPC, B, 200)).astype(np.float32)  # 2 dims x 100 steps


def make_arm(encoder, use_pallas):
    cfg, tc = baseline_config(4)
    cfg = dataclasses.replace(
        cfg,
        modalities=(
            dataclasses.replace(cfg.modalities[0], encoder=encoder),
            cfg.modalities[1],
        ),
    )
    tc = dataclasses.replace(
        tc,
        batch_size=B,
        compute_dtype=jnp.bfloat16,
        use_pallas=use_pallas,
        steps_per_call=SPC,
    )
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    xs = [jnp.asarray(x_img), jnp.asarray(x_traj)]
    return state, step, xs


def time_arm(state, step, xs):
    """seconds per device call (SPC steps), one timed run."""
    t0 = time.perf_counter()
    state, m = step(state, xs)
    jax.device_get(m["total"])
    return time.perf_counter() - t0, state


arms = {
    "A xla-convs   (conv,        True)  ": make_arm("conv", True),
    "B banded      (conv_pallas, True)  ": make_arm("conv_pallas", True),
    "C conv-mega   (conv_pallas, 'mega')": make_arm("conv_pallas", "mega"),
    "D mega-defaul (conv,        'mega')": make_arm("conv", "mega"),
}

# Warm up every arm (compile) before any timing.
for name in arms:
    state, step, xs = arms[name]
    t, state = time_arm(state, step, xs)
    arms[name] = (state, step, xs)
    print(f"warmup {name}: {t:.1f}s (compile)", flush=True)

best = {name: 1e9 for name in arms}
for rep in range(REPS):
    for name in arms:  # interleaved: same thermal/link regime for all arms
        state, step, xs = arms[name]
        t, state = time_arm(state, step, xs)
        arms[name] = (state, step, xs)
        best[name] = min(best[name], t)

print(f"\nconfig-4 e2e train step, batch {B}, bf16, {SPC}-step scan, "
      f"best of {REPS} (interleaved):")
for name, t in best.items():
    sps = SPC * B / t
    print(f"  {name}: {t * 1e3 / SPC:7.2f} ms/step  = {sps:12,.0f} samples/s")

# ---------------------------------------------------------------------------
# Isolation leg: conv tower fwd+bwd alone (XLA vs conv-mega), for the ledger.
# ---------------------------------------------------------------------------
import jax.lax as lax

from vae_assoc_tpu.kernels.conv_mega import conv_tower_fused
from vae_assoc_tpu.models import conv as mconv
from vae_assoc_tpu.ops import losses

N = 50
params = mconv.init_conv_vae_params(
    jax.random.key(0),
    dict(n_input=784, n_z=20, n_hidden_recog_1=500, n_hidden_recog_2=500,
         n_hidden_gener_1=500, n_hidden_gener_2=500),
)
x1 = jnp.asarray(x_img[0])
eps1 = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))


def loss_xla(p, x, eps):
    mu, lv = mconv.encode_conv(p, x, compute_dtype=jnp.bfloat16)
    z = mu + jnp.exp(0.5 * lv) * eps
    r = mconv.decode_conv(p, z, compute_dtype=jnp.bfloat16)
    rec = losses.bernoulli_recon(x, logits=r)
    return jnp.mean(rec) + jnp.mean(losses.kl_divergence(mu, lv))


def loss_mega(p, x, eps):
    o = conv_tower_fused(p, x, kind="bernoulli", eps=eps,
                         compute_dtype=jnp.bfloat16)
    return jnp.mean(o["recon_term"]) + jnp.mean(o["kl_term"])


def serial_grad(lossfn):
    g = jax.grad(lossfn)

    @jax.jit
    def many(p, x, eps):
        def body(i, s):
            gg = g(p, x + s * 1e-30, eps)
            return s + sum(jnp.sum(t) for t in jax.tree.leaves(gg))

        return lax.fori_loop(0, N, body, jnp.float32(0))

    return many


for name, fn in (("xla ", serial_grad(loss_xla)),
                 ("mega", serial_grad(loss_mega))):
    jax.device_get(fn(params, x1, eps1))
    b = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(fn(params, x1, eps1))
        b = min(b, time.perf_counter() - t0)
    print(f"tower fwd+bwd {name}: {b / N * 1e3:7.2f} ms "
          f"(batch {B}, bf16, {N} serial reps)")
