"""Whole-geometry dense formulation for the tiny-channel edge convs.

The measured conv ledger (docs/PERF.md "Conv kernels") shows config-4's
edge convolutions are MXU-hostile in ANY formulation that keeps channels
on the lane axis: conv1 has cin=1 (K=28 lanes of a 128-lane tile) and
convt2 has cout=1. The endpoint of the banded idea fixes both: absorb
the ENTIRE 2-D geometry — rows and columns — into one dense matrix and
run the layer as a single MXU matmul:

    conv1:  [B, 784]  @ M[784, 14·14·32=6272]
    convt2: [B, 6272] @ M[6272, 784]

M[(r·w+c)·cin+ci, (o·ow+p)·cout+co] = w[dy, dx, ci, co] wherever the
tap geometry matches (constant 0/1 selector ⊗ the HWIO kernel — a
differentiable einsum, like `conv_banded._build_ms` but 2-D). The FLOP
count balloons ~40-90× over the convolution's useful FLOPs, but at
these shapes the dense matmul is still tiny for the MXU (~20 GFLOP at
batch 2048 ≈ 0.1 ms) while the convolution formulations pay layout
waste that costs far more. This is deliberately NOT worthwhile for the
middle convs (cin=32→cout=64: the same trick balloons to ~80 GFLOP and
loses — measured in scripts/bench_conv_dense.py).

Pure jnp/XLA: autodiff gives dM/dx as the mirrored matmuls and dw via
the selector einsum's transpose; composes with jit/grad/shard_map/GSPMD
unchanged (it is just a dense layer).
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from vae_assoc_tpu.models.conv import _precision

_K = 3


@functools.lru_cache(maxsize=16)
def _sel_s2(h: int, w: int):
    """0/1 selector [9, h·w, oh·ow] for SAME stride-2 conv: tap (dy, dx)
    reads input (2o+dy, 2p+dx) for output (o, p) — same border semantics
    as `conv_banded.conv3x3_s2` / lax SAME. NUMPY (never cache tracers)."""
    oh, ow = h // 2, w // 2
    s = np.zeros((_K * _K, h * w, oh * ow), np.float32)
    for dy in range(_K):
        for dx in range(_K):
            for o in range(oh):
                r = 2 * o + dy
                if r >= h:
                    continue
                for p in range(ow):
                    c = 2 * p + dx
                    if c < w:
                        s[dy * _K + dx, r * w + c, o * ow + p] = 1.0
    return s


@functools.lru_cache(maxsize=16)
def _sel_t2(h: int, w: int):
    """0/1 selector [9, h·w, 2h·2w] for SAME stride-2 transposed conv:
    output (R, P) takes tap (dy, dx) from input ((R+dy)/2−1, (P+dx)/2−1)
    when both parities are even — the 2-D form of `conv_banded`'s
    row-parity/col-band rules (parity-tested vs lax.conv_transpose)."""
    oh, ow = 2 * h, 2 * w
    s = np.zeros((_K * _K, h * w, oh * ow), np.float32)
    for dy in range(_K):
        for dx in range(_K):
            for R in range(oh):
                if (R + dy) % 2:
                    continue
                r = (R + dy) // 2 - 1
                if not (0 <= r < h):
                    continue
                for P in range(ow):
                    if (P + dx) % 2:
                        continue
                    c = (P + dx) // 2 - 1
                    if 0 <= c < w:
                        s[dy * _K + dx, r * w + c, R * ow + P] = 1.0
    return s


def _dense_conv(x, w_hwio, b, sel, oh, ow, compute_dtype):
    bsz, h, w, cin = x.shape
    cout = w_hwio.shape[3]
    w9 = w_hwio.reshape(_K * _K, cin, cout)
    m = jnp.einsum("gIO,gio->IiOo", jnp.asarray(sel), w9).reshape(
        h * w * cin, oh * ow * cout
    )
    y = jnp.matmul(
        x.reshape(bsz, h * w * cin), m,
        precision=_precision(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(bsz, oh, ow, cout) + b


def conv3x3_s2_dense(x, w_hwio, b, *, compute_dtype=jnp.float32):
    """SAME strided conv as ONE dense matmul; matches lax SAME s2."""
    bsz, h, w, cin = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"conv3x3_s2_dense requires even dims, got {(h, w)}")
    return _dense_conv(x, w_hwio, b, _sel_s2(h, w), h // 2, w // 2,
                       compute_dtype)


def convt3x3_s2_dense(x, w_hwio, b, *, compute_dtype=jnp.float32):
    """SAME transposed conv as ONE dense matmul; matches lax.conv_transpose."""
    bsz, h, w, cin = x.shape
    return _dense_conv(x, w_hwio, b, _sel_t2(h, w), 2 * h, 2 * w,
                       compute_dtype)
