"""Pallas fused 3D shifted-window attention for the Swin backbone.

The XLA path (lrce_tpu/models/swin3d.py) spends most of its time in HBM
traffic: LayerNorm read/write, window partition/reverse transposes, and the
attention intermediates each cost a full pass over the activation tensor.
This kernel fuses, per (batch, d-row, h-row) grid cell:

    LayerNorm(norm1) -> window partition -> qkv -> per-head attention with
    relative-position bias (+ shifted-window mask) -> proj -> window reverse

into one VMEM-resident program: the activation is read ONCE from HBM and the
attention output written ONCE. The cyclic roll (shift) and the residual add
stay in XLA where they fuse with neighbors.

Numerics match the XLA path: f32 LayerNorm/softmax/matmul accumulation,
bf16 activations. The backward pass reuses the XLA implementation via
custom_vjp (fast fwd / correct-by-construction bwd).

Reference behavior being accelerated: WindowAttention3D + window partition
(reference lrce/feature_extractor/video_swin_ori.py:60-88,107-189,248-282).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _kernel(x_ref, ln_scale_ref, ln_bias_ref, qkv_w_ref, qkv_b_ref,
            proj_w_ref, proj_b_ref, bias_ref, mask_ref, out_ref, *,
            window: Tuple[int, int, int], num_heads: int, ln_eps: float,
            kh_rows: int):
    wd, wh, ww = window
    n = wd * wh * ww
    x = x_ref[0]  # (wd, kh_rows*wh, Wp, C) — kh_rows h-rows of windows
    _, _, wp, c = x.shape
    nw = wp // ww
    nwin = kh_rows * nw  # windows handled by this program
    hd = c // num_heads
    dt = x.dtype

    # LayerNorm over C in f32
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    y = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(jnp.float32)
    y = y.astype(dt)

    # window partition: (wd, KH, wh, nw, ww, C) -> (KH*nw, N, C)
    y = y.reshape(wd, kh_rows, wh, nw, ww, c)
    y = y.transpose(1, 3, 0, 2, 4, 5).reshape(nwin, n, c)

    # packed qkv: (nwin, N, 3C). Mosaic cannot split the lane (channel) dim in
    # registers, so heads are processed by static lane slices instead of a
    # (H, hd) reshape; the head loop unrolls at trace time.
    qkv = jnp.dot(y.reshape(nwin * n, c), qkv_w_ref[:].astype(dt),
                  preferred_element_type=jnp.float32)
    qkv = (qkv + qkv_b_ref[:].astype(jnp.float32)).astype(dt)
    qkv = qkv.reshape(nwin, n, 3 * c)

    scale = 1.0 / math.sqrt(hd)
    mask = mask_ref[0].reshape(nwin, n, n)  # (KH, nw, N, N) flattened
    ctx_heads = []
    for h in range(num_heads):
        qh = qkv[:, :, h * hd:(h + 1) * hd]                # (nwin, N, hd)
        kh = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        vh = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale    # (nwin, N, N)
        logits = logits + bias_ref[h][None] + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ctx_heads.append(jax.lax.dot_general(
            w, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))
    ctx = jnp.concatenate(ctx_heads, axis=-1).reshape(nwin * n, c)

    out = jnp.dot(ctx, proj_w_ref[:].astype(dt),
                  preferred_element_type=jnp.float32)
    out = (out + proj_b_ref[:].astype(jnp.float32)).astype(dt)

    # window reverse: (KH*nw, N, C) -> (wd, KH*wh, Wp, C)
    out = out.reshape(kh_rows, nw, wd, wh, ww, c).transpose(2, 0, 3, 1, 4, 5)
    out_ref[0] = out.reshape(wd, kh_rows * wh, wp, c)


def _xla_equivalent(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b,
                    rel_bias, mask, *, window, num_heads, ln_eps):
    """Pure-XLA reference of the fused op (LN1 -> window attn -> proj) on a
    pre-rolled (B, D, H, W, C) input. Used for the backward pass and tests."""
    from lrce_tpu.models.swin3d import window_partition, window_reverse
    from lrce_tpu.ops.nn import layer_norm

    b, d, h, w_, c = x.shape
    hd = c // num_heads
    y = layer_norm({"scale": ln_scale, "bias": ln_bias}, x, eps=ln_eps)
    win = window_partition(y, window)  # (B*nW, N, C)
    nb, n, _ = win.shape
    dt = win.dtype

    qkv = (jnp.dot(win, qkv_w.astype(dt), preferred_element_type=jnp.float32)
           + qkv_b.astype(jnp.float32)).astype(dt)
    qkv = qkv.reshape(nb, n, 3, num_heads, hd)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    logits = logits + rel_bias[None]
    n_windows = mask.shape[0] * mask.shape[1] * mask.shape[2]
    mask_flat = mask.reshape(n_windows, n, n)
    logits = (logits.reshape(b, n_windows, num_heads, n, n)
              + mask_flat[None, :, None]).reshape(nb, num_heads, n, n)
    wts = jax.nn.softmax(logits, axis=-1).astype(dt)
    ctx = jnp.einsum("bhnm,bhmd->bhnd", wts, v,
                     preferred_element_type=jnp.float32).astype(dt)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(nb, n, c)
    out = (jnp.dot(ctx, proj_w.astype(dt), preferred_element_type=jnp.float32)
           + proj_b.astype(jnp.float32)).astype(dt)
    return window_reverse(out, window, b, d, h, w_)


def _pick_kh_rows(c: int, nh: int) -> int:
    """How many h-rows of windows one program handles. Larger blocks give
    bigger matmuls and fewer launches but grow the VMEM footprint (logits
    are f32 with N padded to lane multiples); measured on v5e, kh=2 helps at
    C=512 (1.37 vs 1.56 ms/apply) and VMEM-OOMs at C=128."""
    if c >= 512 and nh % 2 == 0:
        return 2
    return 1


def _fused_fwd_impl(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b,
                    rel_bias, mask, *, window, num_heads, ln_eps, interpret,
                    kh_rows=None):
    b, d, h, w_, c = x.shape
    wd, wh, ww = window
    nd, nh, nw = d // wd, h // wh, w_ // ww
    n = wd * wh * ww
    kh = kh_rows if kh_rows is not None else _pick_kh_rows(c, nh)
    if nh % kh != 0:
        kh = 1

    grid = (b, nd, nh // kh)
    kernel = functools.partial(_kernel, window=window, num_heads=num_heads,
                               ln_eps=ln_eps, kh_rows=kh)
    flops = (2 * b * nd * nh * nw * n * c * 4 * c          # qkv + proj
             + 2 * b * nd * nh * nw * num_heads * n * n * (c // num_heads) * 2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wd, kh * wh, w_, c),
                         lambda bi, di, hi: (bi, di, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkv_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proj_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rel_bias (nH, N, N)
            pl.BlockSpec((1, kh, nw, n, n),
                         lambda bi, di, hi: (di, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # mask
        ],
        out_specs=pl.BlockSpec((1, wd, kh * wh, w_, c),
                               lambda bi, di, hi: (bi, di, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=x.size * 4,
                                      transcendentals=b * nd * nh * nw * n * n),
        interpret=interpret,
    )(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_window_attention(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b,
                           rel_bias, mask, window, num_heads, ln_eps=1e-5,
                           interpret=False):
    """Fused LN1 + 3D window attention + proj on a pre-rolled, pre-padded
    (B, D, H, W, C) tensor. D/H/W must be multiples of the window.

    mask: (nd, nh, nw, N, N) additive f32 (zeros when unshifted).
    rel_bias: (num_heads, N, N) f32 relative-position bias.
    """
    return _fused_fwd_impl(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b,
                           rel_bias, mask, window=window, num_heads=num_heads,
                           ln_eps=ln_eps, interpret=interpret)


def _fwd(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask,
         window, num_heads, ln_eps, interpret):
    out = _fused_fwd_impl(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b,
                          rel_bias, mask, window=window, num_heads=num_heads,
                          ln_eps=ln_eps, interpret=interpret)
    return out, (x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b, rel_bias,
                 mask)


def _bwd(window, num_heads, ln_eps, interpret, res, g):
    # Backward through the XLA-equivalent computation (recompute fwd).
    def f(*args):
        return _xla_equivalent(*args, window=window, num_heads=num_heads,
                               ln_eps=ln_eps)

    _, vjp = jax.vjp(f, *res)
    return vjp(g)


fused_window_attention.defvjp(_fwd, _bwd)
