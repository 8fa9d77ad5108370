"""Per-layer A/B: XLA conv vs banded Pallas vs whole-geometry dense
matmul (kernels/conv_dense.py), config-4 shapes, bf16 policy, fwd and
fwd+bwd. The dense formulation targets the MXU-hostile edge convs
(cin=1 / cout=1); the middle convs are expected to LOSE dense (FLOP
balloon ~22×) — measured either way.

Run: PYTHONPATH=/root/repo python scripts/bench_conv_dense.py
"""
import time

import numpy as np

import jax
import jax.lax as lax
import jax.numpy as jnp

assert jax.default_backend() == "tpu"

from vae_assoc_tpu.kernels import conv_banded as cb
from vae_assoc_tpu.kernels.conv_dense import conv3x3_s2_dense, convt3x3_s2_dense
from vae_assoc_tpu.models import conv as mconv

B, N = 2048, 50
rng = np.random.default_rng(0)
CD = jnp.bfloat16


def bench(fn, x, w, reps=3):
    @jax.jit
    def many(x, w):
        def body(i, s):
            return s + jnp.sum(fn(x + s * 1e-30, w).astype(jnp.float32))
        return lax.fori_loop(0, N, body, jnp.float32(0))

    jax.device_get(many(x, w))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(many(x, w))
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3


def bench_grad(fn, x, w, reps=3):
    g = jax.grad(lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32)),
                 argnums=(0, 1))

    @jax.jit
    def many(x, w):
        def body(i, s):
            gx, gw = g(x + s * 1e-30, w)
            return s + jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gw.astype(jnp.float32))
        return lax.fori_loop(0, N, body, jnp.float32(0))

    jax.device_get(many(x, w))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(many(x, w))
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3


def xla_s2(x, w):
    return lax.conv_general_dilated(x, w, (2, 2), "SAME",
                                    dimension_numbers=mconv._DN)


def xla_t2(x, w):
    return lax.conv_transpose(x, w, (2, 2), "SAME",
                              dimension_numbers=mconv._DN)


cases = [
    ("conv1  1->32 ", (B, 28, 28, 1), (3, 3, 1, 32), xla_s2,
     lambda x, w: cb.conv3x3_s2(x, w, jnp.zeros((32,), jnp.float32), compute_dtype=CD),
     lambda x, w: conv3x3_s2_dense(x, w, jnp.zeros((32,), jnp.float32), compute_dtype=CD)),
    ("conv2 32->64 ", (B, 14, 14, 32), (3, 3, 32, 64), xla_s2,
     lambda x, w: cb.conv3x3_s2(x, w, jnp.zeros((64,), jnp.float32), compute_dtype=CD),
     lambda x, w: conv3x3_s2_dense(x, w, jnp.zeros((64,), jnp.float32), compute_dtype=CD)),
    ("convt1 64->32", (B, 7, 7, 64), (3, 3, 64, 32), xla_t2,
     lambda x, w: cb.convt3x3_s2(x, w, jnp.zeros((32,), jnp.float32), compute_dtype=CD),
     lambda x, w: convt3x3_s2_dense(x, w, jnp.zeros((32,), jnp.float32), compute_dtype=CD)),
    ("convt2 32->1 ", (B, 14, 14, 32), (3, 3, 32, 1), xla_t2,
     lambda x, w: cb.convt3x3_s2(x, w, jnp.zeros((1,), jnp.float32), compute_dtype=CD),
     lambda x, w: convt3x3_s2_dense(x, w, jnp.zeros((1,), jnp.float32), compute_dtype=CD)),
]

print(f"batch {B}, {N} serial reps; ms per layer (best of 3)")
for name, xs, ws, fx, fb, fd in cases:
    x = jnp.asarray(rng.normal(size=xs).astype(np.float32))
    w = jnp.asarray((rng.normal(size=ws) * 0.05).astype(np.float32))
    tx, tb, td = bench(fx, x, w), bench(fb, x, w), bench(fd, x, w)
    gx, gb, gd = bench_grad(fx, x, w), bench_grad(fb, x, w), bench_grad(fd, x, w)
    print(f"{name} fwd: xla {tx:6.3f} banded {tb:6.3f} dense {td:6.3f} | "
          f"fwd+bwd: xla {gx:6.3f} banded {gb:6.3f} dense {gd:6.3f}", flush=True)
