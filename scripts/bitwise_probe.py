"""Per-primitive bitwise-agreement sweep: numpy vs XLA CPU at fp32.

Produces the evidence table in docs/PARITY.md: which elementwise and
reduction primitives agree to the bit between numpy and XLA CPU, and the
max ULP gap where they cannot (different libm / FMA contraction / BLAS
accumulation order). Run: `python scripts/bitwise_probe.py`.
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

rng = np.random.default_rng(0)


def cmp(name, a_np, a_jx):
    a_jx = np.asarray(a_jx)
    same = np.sum(a_np.view(np.uint32) == a_jx.view(np.uint32))
    n = a_np.size
    if same == n:
        print(f"{name}: BITWISE ({n})")
    else:
        ulp = np.abs(
            a_np.view(np.int32).astype(np.int64) - a_jx.view(np.int32).astype(np.int64)
        )
        print(f"{name}: {n - same}/{n} differ, max ULP {ulp.max()}")


x = rng.normal(scale=4, size=200000).astype(np.float32)
xp = rng.uniform(1e-10, 1.0, 200000).astype(np.float32)

cmp("exp", np.exp(x), jax.jit(jnp.exp)(x))
cmp("log", np.log(xp), jax.jit(jnp.log)(xp))
cmp("log1p", np.log1p(np.abs(x)), jax.jit(jnp.log1p)(jnp.abs(x)))
cmp("sqrt", np.sqrt(xp), jax.jit(jnp.sqrt)(xp))
cmp("sigmoid", 1 / (1 + np.exp(-x)), jax.jit(jax.nn.sigmoid)(x))
cmp("mul-add chain (FMA contraction)", x * x + xp, jax.jit(lambda a, b: a * a + b)(x, xp))

m = rng.normal(size=(64, 784)).astype(np.float32)
cmp("np.sum vs jnp.sum axis=-1 (both unpinned)", np.sum(m, axis=1), jax.jit(lambda a: jnp.sum(a, axis=1))(m))
cmp("np.mean vs jnp.mean (both unpinned)", np.mean(m, axis=1), jax.jit(lambda a: jnp.mean(a, axis=1))(m))


def seqsum_jx(a):
    out = a[:, 0]
    for i in range(1, a.shape[1]):
        out = out + a[:, i]
    return out


cmp("pinned: np.cumsum[-1] vs jax sequential chain", np.cumsum(m, axis=1)[:, -1], jax.jit(seqsum_jx)(m))

v = rng.normal(size=4096).astype(np.float32) * 100
cmp("divide by 784", v / np.float32(784), jax.jit(lambda a: a / jnp.float32(784))(v))
cmp("multiply by fp32(1/784)", v * np.float32(1.0 / 784), jax.jit(lambda a: a * jnp.float32(1.0 / 784))(v))

a = rng.normal(size=(64, 784)).astype(np.float32)
w = rng.normal(size=(784, 500)).astype(np.float32) * 0.05
cmp(
    "matmul 64x784x500 (HIGHEST)",
    a @ w,
    jax.jit(lambda a, w: jnp.dot(a, w, precision=jax.lax.Precision.HIGHEST))(a, w),
)
