"""Whole-geometry dense conv formulation (kernels/conv_dense.py):
parity vs lax at every config-4 geometry (fwd + grads), the hybrid
dispatch inside the banded layer ops, and shard_map composability
(pure jnp — no fallback gymnastics needed)."""

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vae_assoc_tpu.kernels import conv_banded as cb
from vae_assoc_tpu.kernels.conv_dense import (
    conv3x3_s2_dense,
    convt3x3_s2_dense,
)
from vae_assoc_tpu.models.conv import _DN

HI = lax.Precision.HIGHEST


def _xla_s2(x, w):
    return lax.conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=_DN, precision=HI
    )


def _xla_t2(x, w):
    return lax.conv_transpose(
        x, w, (2, 2), "SAME", dimension_numbers=_DN, precision=HI
    )


CASES = [
    ((5, 28, 28, 1), (3, 3, 1, 32), conv3x3_s2_dense, _xla_s2),
    ((5, 14, 14, 32), (3, 3, 32, 64), conv3x3_s2_dense, _xla_s2),
    ((5, 7, 7, 64), (3, 3, 64, 32), convt3x3_s2_dense, _xla_t2),
    ((5, 14, 14, 32), (3, 3, 32, 1), convt3x3_s2_dense, _xla_t2),
]


@pytest.mark.parametrize("shape,wsh,fn,ref", CASES)
def test_dense_conv_matches_lax(rng, shape, wsh, fn, ref):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray((rng.normal(size=wsh) * 0.1).astype(np.float32))
    b = jnp.zeros((wsh[3],), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fn(x, w, b)), np.asarray(ref(x, w) + b),
        rtol=1e-5, atol=1e-5,
    )
    g = jax.grad(lambda x, w: jnp.sum(jnp.sin(fn(x, w, b))), argnums=(0, 1))
    gr = jax.grad(lambda x, w: jnp.sum(jnp.sin(ref(x, w) + b)), argnums=(0, 1))
    for a, want in zip(g(x, w), gr(x, w)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(want), rtol=1e-4, atol=5e-5
        )


def test_banded_layer_ops_dispatch_edges_to_dense(rng, monkeypatch):
    """With the DENSE_EDGES knob on (off by default — measured ~5% slower
    end-to-end, docs/PERF.md), conv3x3_s2 with cin=1 and convt3x3_s2 with
    cout=1 route through the dense formulation with lax-equal math."""
    monkeypatch.setattr(cb, "DENSE_EDGES", True)
    x = jnp.asarray(rng.uniform(0, 1, (4, 28, 28, 1)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 1, 32)) * 0.1).astype(np.float32))
    b = jnp.zeros((32,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(cb.conv3x3_s2(x, w, b)),
        np.asarray(_xla_s2(x, w) + b), rtol=1e-5, atol=1e-5,
    )
    xt = jnp.asarray(rng.normal(size=(4, 14, 14, 32)).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(3, 3, 32, 1)) * 0.1).astype(np.float32))
    bt = jnp.zeros((1,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(cb.convt3x3_s2(xt, wt, bt)),
        np.asarray(_xla_t2(xt, wt) + bt), rtol=1e-5, atol=1e-5,
    )


def test_dense_conv_under_shard_map(rng):
    """Pure-jnp formulation composes with shard_map directly: per-shard
    results equal the sliced full-batch result."""
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    x = jnp.asarray(rng.normal(size=(16, 28, 28, 1)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 1, 32)) * 0.1).astype(np.float32))
    b = jnp.zeros((32,), jnp.float32)

    out = jax.jit(
        jax.shard_map(
            lambda x, w: conv3x3_s2_dense(x, w, b),
            mesh=mesh, in_specs=(P("data"), P()), out_specs=P("data"),
        )
    )(x, w)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(conv3x3_s2_dense(x, w, b)),
        rtol=1e-5, atol=1e-6,
    )
