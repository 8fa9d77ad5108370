"""Per-layer conv A/B on TPU: XLA native convs vs the im2col Pallas
kernels (kernels/conv.py) vs the banded-matmul Pallas kernels
(kernels/conv_banded.py), at the config-4 shapes and the bf16 compute
policy. Serialized fori_loop repetitions amortize the device-link RTT out
of the reading (docs/PERF.md "Measurement discipline").
Run: python scripts/bench_conv.py
"""

import time
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu"
from vae_assoc_tpu.kernels import conv as kconv
from vae_assoc_tpu.kernels import conv_banded as cb
from vae_assoc_tpu.models import conv as mconv
import jax.lax as lax

B, N = 1024, 100
rng = np.random.default_rng(0)

def bench(convfn, x, w, reps=5):
    @jax.jit
    def many(x, w):
        def body(i, s):
            return s + jnp.sum(convfn(x + s * 1e-30, w))
        return lax.fori_loop(0, N, body, jnp.float32(0))
    jax.device_get(many(x, w))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(many(x, w))
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3

def xla_s2(x, w):
    return lax.conv_general_dilated(x, w, (2,2), "SAME", dimension_numbers=mconv._DN)
def xla_t2(x, w):
    return lax.conv_transpose(x, w, (2,2), "SAME", dimension_numbers=mconv._DN)

cases = [
    ("conv1 28x28x1->14x14x32 ", (B,28,28,1), (3,3,1,32), xla_s2,
     lambda x,w: kconv.conv3x3_s2(x, w, jnp.zeros((32,), jnp.float32), compute_dtype=jnp.bfloat16),
     lambda x,w: cb.conv3x3_s2(x, w, jnp.zeros((32,), jnp.float32), compute_dtype=jnp.bfloat16)),
    ("conv2 14x14x32->7x7x64  ", (B,14,14,32), (3,3,32,64), xla_s2,
     lambda x,w: kconv.conv3x3_s2(x, w, jnp.zeros((64,), jnp.float32), compute_dtype=jnp.bfloat16),
     lambda x,w: cb.conv3x3_s2(x, w, jnp.zeros((64,), jnp.float32), compute_dtype=jnp.bfloat16)),
    ("convt1 7x7x64->14x14x32 ", (B,7,7,64), (3,3,64,32), xla_t2,
     lambda x,w: kconv.convt3x3_s2(x, w, jnp.zeros((32,), jnp.float32), compute_dtype=jnp.bfloat16),
     lambda x,w: cb.convt3x3_s2(x, w, jnp.zeros((32,), jnp.float32), compute_dtype=jnp.bfloat16)),
    ("convt2 14x14x32->28x28x1", (B,14,14,32), (3,3,32,1), xla_t2,
     lambda x,w: kconv.convt3x3_s2(x, w, jnp.zeros((1,), jnp.float32), compute_dtype=jnp.bfloat16),
     lambda x,w: cb.convt3x3_s2(x, w, jnp.zeros((1,), jnp.float32), compute_dtype=jnp.bfloat16)),
]
print(f"batch {B}, {N} serial convs; ms per conv fwd (best of 5)")
tots = [0.0, 0.0, 0.0]
for name, xs, ws, fx, fi, fb in cases:
    x = jnp.asarray(rng.normal(size=xs).astype(np.float32))
    w = jnp.asarray((rng.normal(size=ws)*0.05).astype(np.float32))
    tx, ti, tb = bench(fx, x, w), bench(fi, x, w), bench(fb, x, w)
    tots[0] += tx; tots[1] += ti; tots[2] += tb
    print(f"{name} xla {tx:7.3f}  im2col {ti:7.3f}  banded {tb:7.3f}  banded/xla {tb/tx:5.2f}x", flush=True)
print(f"{'TOTAL':25s} xla {tots[0]:7.3f}  im2col {tots[1]:7.3f}  banded {tots[2]:7.3f}  banded/xla {tots[2]/tots[0]:5.2f}x")
