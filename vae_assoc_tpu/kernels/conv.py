"""Pallas TPU conv / transposed-conv kernels (BASELINE.json:10, config 4).

One linear primitive covers every convolution in the conv image tower —
forward, transposed, and all their gradients — as im2col + MXU matmul
with the 3×3 patch extraction done *inside* the kernel (6-D reshape/slice,
no HBM round-trip for patches):

    _conv_im2col(x, w2d; stride, dilate, pads, out_hw)

      stride=2, dilate=False → strided conv   (encoder downsampling)
      stride=1, dilate=True  → zero-dilated s1 conv == conv_transpose
                               (decoder upsampling; matches
                               lax.conv_transpose SAME: dilation 2 +
                               pad (2,1), kernel unflipped)

It is registered as a custom-VJP linear op whose backward is *also* these
kernels: dx is the transposed convolution (flipped kernel, mapped
stride/pads — the calculus is in `_conv_vjp_bwd`), and dw is a third
Pallas kernel accumulating patchesᵀ @ dy across batch tiles. Bias add and
softplus stay outside in XLA (elementwise — XLA fuses them into the
adjacent ops; autodiff handles their VJPs).

`encode_conv_fused` / `decode_conv_fused` mirror `models.conv.encode_conv`
/ `decode_conv` exactly (parity: tests/test_conv_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_assoc_tpu.kernels.mlp import (
    _interpret,
    _mm,
    _mm_tn,
    _pvary_like,
    _sds,
    _shardmap_interpret,
)
from vae_assoc_tpu.models.conv import (
    C2,
    IMG_SIZE,
    _FLAT,
    _SMALL,
    _dense,
    _precision,
)

_K = 3  # kernel size everywhere in the tower


def _dilate2(x):
    """[B,h,w,c] → [B,2h-1,2w-1,c] with zeros interleaved (lhs_dilation=2)."""
    b, h, w, c = x.shape
    t = jnp.stack([x, jnp.zeros_like(x)], axis=2).reshape(b, 2 * h, w, c)
    t = t[:, : 2 * h - 1]
    t = jnp.stack([t, jnp.zeros_like(t)], axis=3).reshape(b, 2 * h - 1, 2 * w, c)
    return t[:, :, : 2 * w - 1]


def _tap_s1(xp, dy, dx, oh, ow):
    """Stride-1 tap slice of padded input → [B, oh, ow, C]."""
    return xp[:, dy : dy + oh, dx : dx + ow, :]


def _tap_s2(v, dy, dx, oh, ow):
    """Stride-2 tap via parity view v = xp.reshape(B, H/2, 2, W/2, 2, C):
    row for output i, tap dy is 2i+dy → (row-block dy//2 .. +oh, phase dy%2)."""
    ry, py = dy // 2, dy % 2
    rx, px = dx // 2, dx % 2
    return v[:, ry : ry + oh, py, rx : rx + ow, px, :]


def _prep_input(x, stride, dilate, pads, oh):
    """Dilate + pad; for s2, return the parity view (Mosaic cannot
    concatenate the parity slices, so convs are computed as a SUM of 9
    per-tap matmuls instead of one im2col concat)."""
    if dilate:
        x = _dilate2(x)
    lo, hi = pads
    if stride == 2:
        assert lo == 0, "s2 parity extraction requires pad_lo == 0"
        hi = max(hi, 2 * oh + 2 - x.shape[1])  # pad to even ≥ 2·oh+2
    x = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    if stride == 2:
        b, hp, wp, c = x.shape
        return x.reshape(b, hp // 2, 2, wp // 2, 2, c)
    return x


def _taps(xv, stride, oh, ow):
    """Yield (tap_index, [B, oh, ow, C] slice) for the 9 kernel taps."""
    tap = _tap_s2 if stride == 2 else _tap_s1
    for dy in range(_K):
        for dx in range(_K):
            yield dy * _K + dx, tap(xv, dy, dx, oh, ow)


def _fwd_kernel(stride, dilate, pads, oh, ow, cin, cd, x_ref, w_ref, o_ref):
    tb = x_ref.shape[0]
    n = tb * oh * ow
    cout = w_ref.shape[1]
    xv = _prep_input(x_ref[:], stride, dilate, pads, oh)

    def body(tap_buf, acc):
        # Explicit scratch reuse: one live tap buffer + one accumulator,
        # not 9 unrolled lane-padded temps (VMEM stack would overflow).
        acc[:] = jnp.zeros_like(acc)
        for t, p in _taps(xv, stride, oh, ow):
            tap_buf[:] = p.reshape(n, cin)
            acc[:] += _mm(tap_buf[:], w_ref[t * cin : (t + 1) * cin, :], cd)
        o_ref[:] = acc[:].reshape(tb, oh, ow, cout)

    pl.run_scoped(
        body,
        tap_buf=pltpu.VMEM((n, cin), jnp.float32),
        acc=pltpu.VMEM((n, cout), jnp.float32),
    )


def _dw_kernel(stride, dilate, pads, oh, ow, cin, cd, x_ref, dy_ref, dw_ref):
    tb = x_ref.shape[0]
    n = tb * oh * ow
    xv = _prep_input(x_ref[:], stride, dilate, pads, oh)
    first = pl.program_id(0) == 0

    def body(tap_buf):
        dy2 = dy_ref[:].reshape(n, -1)
        for t, p in _taps(xv, stride, oh, ow):
            tap_buf[:] = p.reshape(n, cin)
            acc = _mm_tn(tap_buf[:], dy2, cd)
            lo = t * cin

            @pl.when(first)
            def _(lo=lo, acc=acc):
                dw_ref[lo : lo + cin, :] = acc

            @pl.when(jnp.logical_not(first))
            def _(lo=lo, acc=acc):
                dw_ref[lo : lo + cin, :] += acc

    pl.run_scoped(body, tap_buf=pltpu.VMEM((n, cin), jnp.float32))


def _pad128(c):
    return ((c + 127) // 128) * 128


def _conv_tile(b, h, cin, cout, dilate, oh, ow, budget=5 * 1024 * 1024):
    """Batch tile sized to the kernel's true VMEM footprint: Mosaic pads the
    minor (channel) dim to 128 lanes, so tiny-channel convs cost 128/c more
    than their logical size. Footprint ≈ tap scratch + accumulator + padded
    input view + output, times a 3× allowance for the dilate/pad SSA copies
    Mosaic keeps live (measured: ~2.2 MB/sample for the 28×28 cin=1 conv
    where the formula below gives 0.8 MB)."""
    hd = 2 * h - 1 if dilate else h
    per_sample = 3 * 4 * (
        oh * ow * (_pad128(cin) + _pad128(cout))  # tap scratch + acc
        + (hd + 3) ** 2 * _pad128(cin)  # padded/dilated input view
        + oh * ow * _pad128(cout)  # output block
    )
    limit = max(1, budget // max(per_sample, 1))
    for t in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if t <= limit and b % t == 0:
            return t
    return b


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _conv_im2col(x, w2d, stride, dilate, pads, out_hw, cd):
    """Linear conv: x [B,H,W,Cin] · w2d [9Cin,Cout] → [B,oh,ow,Cout] fp32."""
    return _conv_fwd_impl(x, w2d, stride, dilate, pads, out_hw, cd)


def _conv_fwd_impl(x, w2d, stride, dilate, pads, out_hw, cd):
    b, h, w, cin = x.shape
    cout = w2d.shape[1]
    oh = ow = out_hw
    tile = _conv_tile(b, h, cin, cout, dilate, oh, ow)
    grid = (b // tile,)
    kern = functools.partial(_fwd_kernel, stride, dilate, pads, oh, ow, cin, cd)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, oh, ow, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((b, oh, ow, cout), jnp.float32, x),
        interpret=_interpret(),
    )(x, w2d)


def _dw_impl(x, dy, stride, dilate, pads, out_hw, cd):
    b, h, w, cin = x.shape
    cout = dy.shape[-1]
    oh = ow = out_hw
    tile = _conv_tile(b, h, cin, cout, dilate, oh, ow)
    grid = (b // tile,)
    kern = functools.partial(_dw_kernel, stride, dilate, pads, oh, ow, cin, cd)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, oh, ow, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((9 * cin, cout), jnp.float32, x),
        interpret=_interpret(),
    )(x, dy)


def _flip_w2d(w2d, cin, cout):
    """[9Cin,Cout] → flipped-spatial, channel-transposed [9Cout,Cin]."""
    w = w2d.reshape(_K, _K, cin, cout)
    w = w[::-1, ::-1].transpose(0, 1, 3, 2)
    return w.reshape(_K * _K * cout, cin)


def _conv_vjp_fwd(x, w2d, stride, dilate, pads, out_hw, cd):
    return _conv_fwd_impl(x, w2d, stride, dilate, pads, out_hw, cd), (x, w2d)


def _conv_vjp_bwd(stride, dilate, pads, out_hw, cd, res, dy):
    x, w2d = res
    cin = x.shape[-1]
    cout = w2d.shape[1]
    wf = _flip_w2d(w2d, cin, cout)
    if stride == 2:
        # fwd: y(o) = Σ_k w[k]·xpad(2o+k), pads (0,1).
        # dx(i) = Σ_k wf[k]·dyd(i−2+k): s1 conv of zero-dilated dy,
        # pads (2,2), out clipped to the input size.
        dx = _conv_im2col(dy, wf, 1, True, (2, 2), x.shape[1], cd)
    else:
        # fwd (convT): y(o) = Σ_k w[k]·xdil_pad(o+k), pads (2,1).
        # dx(i) = Σ_k wf[k]·dy(2i+k): s2 conv of dy, pads (0,1).
        dx = _conv_im2col(dy, wf, 2, False, (0, 1), x.shape[1], cd)
    dw = _dw_impl(x, dy, stride, dilate, pads, out_hw, cd)
    return dx, dw


_conv_im2col.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)


# ---------------------------------------------------------------------------
# Public layer ops + fused tower (drop-ins for models.conv)
# ---------------------------------------------------------------------------


def conv3x3_s2(x, w_hwio, b, *, compute_dtype=jnp.float32):
    """SAME strided conv; matches lax.conv_general_dilated s2 in models.conv.

    Even spatial sizes only: for odd h, lax SAME-s2 emits ceil(h/2) rows
    while this formulation floors — reject loudly rather than silently
    diverge (config-4 geometry is 28/14, always even).
    """
    if x.shape[1] % 2 or x.shape[2] % 2:
        raise ValueError(
            f"conv3x3_s2 requires even spatial dims, got {x.shape[1:3]}"
        )
    if _shardmap_interpret(x):
        import jax.lax as lax

        from vae_assoc_tpu.models.conv import _DN

        return lax.conv_general_dilated(
            x, w_hwio, (2, 2), "SAME", dimension_numbers=_DN,
            precision=_precision(compute_dtype),
        ) + b
    cin, cout = w_hwio.shape[2], w_hwio.shape[3]
    (w2d,) = _pvary_like([w_hwio.reshape(_K * _K * cin, cout)], x)
    out_hw = x.shape[1] // 2
    y = _conv_im2col(x, w2d, 2, False, (0, 1), out_hw,
                     jnp.dtype(compute_dtype).name)
    return y + b


def convt3x3_s2(x, w_hwio, b, *, compute_dtype=jnp.float32):
    """SAME transposed conv; matches lax.conv_transpose s2 in models.conv."""
    if _shardmap_interpret(x):
        import jax.lax as lax

        from vae_assoc_tpu.models.conv import _DN

        return lax.conv_transpose(
            x, w_hwio, (2, 2), "SAME", dimension_numbers=_DN,
            precision=_precision(compute_dtype),
        ) + b
    cin, cout = w_hwio.shape[2], w_hwio.shape[3]
    (w2d,) = _pvary_like([w_hwio.reshape(_K * _K * cin, cout)], x)
    out_hw = x.shape[1] * 2
    y = _conv_im2col(x, w2d, 1, True, (2, 1), out_hw,
                     jnp.dtype(compute_dtype).name)
    return y + b


def make_conv_tower(conv_op, convt_op):
    """Build the (encode, decode) conv-tower pair over injected layer ops.

    Shared by the im2col (this module) and banded (kernels/conv_banded)
    formulations so the tower wiring — layer order, activations, dense
    heads, reshapes — exists exactly once and cannot silently diverge
    between variants.
    """

    def encode_conv_fused(params, x, *, compute_dtype=jnp.float32,
                          transfer=jax.nn.softplus):
        """Drop-in for models.conv.encode_conv with Pallas conv kernels."""
        prec = _precision(compute_dtype)
        r = params["recog"]
        img = x.astype(jnp.float32).reshape(-1, IMG_SIZE, IMG_SIZE, 1)
        h = transfer(conv_op(img, r["conv1"]["w"], r["conv1"]["b"],
                             compute_dtype=compute_dtype))
        h = transfer(conv_op(h, r["conv2"]["w"], r["conv2"]["b"],
                             compute_dtype=compute_dtype))
        h = transfer(_dense(r["dense"], h.reshape(h.shape[0], _FLAT), prec))
        return _dense(r["out_mean"], h, prec), _dense(r["out_logvar"], h, prec)

    def decode_conv_fused(params, z, *, compute_dtype=jnp.float32,
                          transfer=jax.nn.softplus):
        """Drop-in for models.conv.decode_conv with Pallas conv kernels."""
        prec = _precision(compute_dtype)
        g = params["gener"]
        h = transfer(_dense(g["dense1"], z, prec))
        h = transfer(_dense(g["dense2"], h, prec))
        h = h.reshape(-1, _SMALL, _SMALL, C2)
        h = transfer(convt_op(h, g["convt1"]["w"], g["convt1"]["b"],
                              compute_dtype=compute_dtype))
        h = convt_op(h, g["convt2"]["w"], g["convt2"]["b"],
                     compute_dtype=compute_dtype)
        return h.reshape(h.shape[0], IMG_SIZE * IMG_SIZE)

    return encode_conv_fused, decode_conv_fused


encode_conv_fused, decode_conv_fused = make_conv_tower(conv3x3_s2, convt3x3_s2)
