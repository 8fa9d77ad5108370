"""Minimal TPU Mosaic-lowering probe for the conv-tower megakernel:
compiles and executes conv_tower_fused's fwd + param grads at a small
batch, checks against the jnp conv path. Exists because Mosaic layout
inference runs only on real lowering — interpret-mode tests cannot catch
e.g. rank-1 reshape aborts (seen 2026-08-19: inferReshape SIGABRT).

Run: PYTHONPATH=/root/repo python scripts/probe_conv_mega_tpu.py
"""

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu"

from vae_assoc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/.cache/vae_assoc_bench_xla")  # rerun != recompile

from vae_assoc_tpu.kernels.conv_mega import conv_tower_fused
from vae_assoc_tpu.models import conv as mconv
from vae_assoc_tpu.ops import losses

B = 256
rng = np.random.default_rng(0)
params = mconv.init_conv_vae_params(
    jax.random.key(0),
    dict(n_input=784, n_z=20, n_hidden_recog_1=500, n_hidden_recog_2=500,
         n_hidden_gener_1=500, n_hidden_gener_2=500),
)
x = jnp.asarray(rng.uniform(0, 1, (B, 784)).astype(np.float32))
eps = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))


def loss_mega(p):
    o = conv_tower_fused(p, x, kind="bernoulli", eps=eps)
    return jnp.mean(o["recon_term"]) + jnp.mean(o["kl_term"])


def loss_ref(p):
    mu, lv = mconv.encode_conv(p, x)
    z = mu + jnp.exp(0.5 * lv) * eps
    r = mconv.decode_conv(p, z)
    rec = losses.bernoulli_recon(x, logits=r)
    return jnp.mean(rec) + jnp.mean(losses.kl_divergence(mu, lv))


lm, gm = jax.device_get(jax.jit(jax.value_and_grad(loss_mega))(params))
lr, gr = jax.device_get(jax.jit(jax.value_and_grad(loss_ref))(params))
print("loss mega/ref:", lm, lr, "rel", abs(lm - lr) / abs(lr))
rows = []
for (k, a), (_, b) in zip(
    sorted(jax.tree_util.tree_leaves_with_path(gm), key=lambda kv: str(kv[0])),
    sorted(jax.tree_util.tree_leaves_with_path(gr), key=lambda kv: str(kv[0])),
):
    scale = np.abs(b).max() + 1e-8
    rows.append((float(np.abs(a - b).max() / scale), jax.tree_util.keystr(k), a.shape))
rows.sort(reverse=True)
for r in rows[:6]:
    print("  %.2e  %s %s" % r)
worst = rows[0][0]
print("worst grad rel-maxabs:", worst)
assert abs(lm - lr) / abs(lr) < 5e-4, "loss mismatch"
assert worst < 5e-3, "grad mismatch"
print("CONV-MEGA TPU PROBE PASSED")
