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
bf16 activations. The backward pass is a second fused Pallas kernel
(flash-style: LN/qkv/softmax recomputed in VMEM from the saved block input,
dQ/dK/dV/dW accumulated across the sequential grid), so training never
materializes attention intermediates in HBM. Set LRCE_TPU_XLA_BWD=1 to fall
back to differentiating the XLA-equivalent computation instead.

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


def _pick_kh_rows(c: int, nh: int, dtype=jnp.bfloat16) -> int:
    """How many h-rows of windows one program handles. Larger blocks give
    bigger matmuls and fewer launches but grow the VMEM footprint (logits
    are f32 with N padded to lane multiples); measured on v5e, kh=2 helps at
    C=512 (1.37 vs 1.56 ms/apply) and VMEM-OOMs at C=128. f32 activations
    double the live set, so they stay at one h-row per program."""
    if c >= 512 and nh % 2 == 0 and jnp.dtype(dtype).itemsize <= 2:
        return 2
    return 1


def _fused_fwd_impl(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b,
                    rel_bias, mask, *, window, num_heads, ln_eps, interpret,
                    kh_rows=None):
    b, d, h, w_, c = x.shape
    wd, wh, ww = window
    nd, nh, nw = d // wd, h // wh, w_ // ww
    n = wd * wh * ww
    kh = kh_rows if kh_rows is not None else _pick_kh_rows(c, nh, x.dtype)
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
        # f32 activations (eval parity runs) roughly double the live set
        # past Mosaic's conservative default scoped-vmem budget. Raise the
        # budget ONLY for f32: at bf16 the default suffices, and on this
        # backend a raised budget on large-grid bf16 programs reproducibly
        # faults the TPU worker (double-buffered windows overlapping the
        # enlarged scoped region), while f32 parity runs are small.
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)
                         if not interpret and x.dtype == jnp.float32
                         else None),
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


def _bwd_kernel(x_ref, g_ref, ln_scale_ref, ln_bias_ref, qkv_w_ref, qkv_b_ref,
                proj_w_ref, bias_ref, mask_ref,
                dx_ref, dls_ref, dlb_ref, dqkvw_ref, dqkvb_ref, dpw_ref,
                drel_ref, *,
                window: Tuple[int, int, int], num_heads: int, ln_eps: float,
                kh_rows: int):
    """Fused backward for LN1 + window attention + proj on one
    (wd, kh*wh, Wp, C) tile: recomputes the forward in VMEM (flash-style)
    and produces dx for the tile plus weight/bias/rel-bias gradients
    accumulated across the sequential grid into constant-index output blocks
    (TPU grids are sequential, so the accumulator blocks stay VMEM-resident
    for the whole call and flush once at the end).
    """
    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
             & (pl.program_id(2) == 0))

    @pl.when(first)
    def _():
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)
        dqkvw_ref[:] = jnp.zeros_like(dqkvw_ref)
        dqkvb_ref[:] = jnp.zeros_like(dqkvb_ref)
        dpw_ref[:] = jnp.zeros_like(dpw_ref)
        drel_ref[:] = jnp.zeros_like(drel_ref)

    wd, wh, ww = window
    n = wd * wh * ww
    x = x_ref[0]                       # (wd, kh*wh, Wp, C)
    g = g_ref[0]
    wp, c = x.shape[-2], x.shape[-1]
    kw_cols = wp // ww                 # full-W span (Mosaic block-shape rule)
    nwin = kh_rows * kw_cols
    hd = c // num_heads
    dt = x.dtype
    scale = 1.0 / math.sqrt(hd)

    # ---- recompute LayerNorm (residuals for the LN backward) ----
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + ln_eps)
    xn = (xf - mean) * inv
    gamma = ln_scale_ref[:].astype(jnp.float32)
    y = (xn * gamma + ln_bias_ref[:].astype(jnp.float32)).astype(dt)

    def part(t):  # (wd, kh*wh, Wp, C) -> (nwin, N, C)
        t = t.reshape(wd, kh_rows, wh, kw_cols, ww, c)
        return t.transpose(1, 3, 0, 2, 4, 5).reshape(nwin, n, c)

    y2d = part(y).reshape(nwin * n, c)
    g2d = part(g).reshape(nwin * n, c)

    # ---- recompute qkv ----
    qkv = jnp.dot(y2d, qkv_w_ref[:].astype(dt),
                  preferred_element_type=jnp.float32)
    qkv = (qkv + qkv_b_ref[:].astype(jnp.float32)).astype(dt)
    qkv = qkv.reshape(nwin, n, 3 * c)

    mask = mask_ref[0].reshape(nwin, n, n)

    # ---- proj backward: dctx = g @ Wp^T ----
    dctx = jax.lax.dot_general(
        g2d, proj_w_ref[:].astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt).reshape(nwin, n, c)

    # Per-head attention backward. Narrow (nwin, N, hd) pieces are collected
    # and lane-concatenated into full-width tensors before any matmul that
    # would flatten them — Mosaic cannot shape-cast sub-lane-width vectors
    # (e.g. (nwin, 147, 32) -> (nwin*147, 32)), but full-C reshapes and
    # lane-concat both lower fine (same trick as the forward's ctx concat).
    ctx_heads = []
    dq_heads, dk_heads, dv_heads = [], [], []
    for h in range(num_heads):
        qh = qkv[:, :, h * hd:(h + 1) * hd]
        kh_ = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        vh = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]

        # recompute softmax for this head
        logits = jax.lax.dot_general(
            qh, kh_, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        logits = logits + bias_ref[h][None] + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)      # f32 (nwin, N, N)
        pb = p.astype(dt)

        ctx_heads.append(jax.lax.dot_general(
            pb, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))

        dctx_h = dctx[:, :, h * hd:(h + 1) * hd]
        dp = jax.lax.dot_general(
            dctx_h, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (nwin, N, N)
        dv_heads.append(jax.lax.dot_general(
            pb, dctx_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))         # (nwin, N, hd)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        drel_ref[h, :, :] += jnp.sum(ds, axis=0)
        dsb = ds.astype(dt)
        dq_heads.append(jax.lax.dot_general(
            dsb, kh_, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale)  # (nwin, N, hd)
        dk_heads.append(jax.lax.dot_general(
            dsb, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale)

    # dWp = ctx^T g over all rows (ctx in the same lane layout as forward)
    ctx2d = jnp.concatenate(ctx_heads, axis=-1).reshape(nwin * n, c)
    dpw_ref[:] += jax.lax.dot_general(
        ctx2d, g2d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # dqkv in the packed [q | k | v] lane layout, then one matmul each for
    # dWqkv (contract rows) and dy (contract lanes with Wqkv^T).
    dqkv = jnp.concatenate(dq_heads + dk_heads + dv_heads, axis=-1)
    dqkvb_ref[:] += jnp.sum(dqkv, axis=(0, 1))
    dqkv2d = dqkv.astype(dt).reshape(nwin * n, 3 * c)
    dqkvw_ref[:] += jax.lax.dot_general(
        y2d, dqkv2d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dy2d = jax.lax.dot_general(
        dqkv2d, qkv_w_ref[:].astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (nwin*N, C)

    # ---- window reverse + LayerNorm backward (in x layout) ----
    dy = dy2d.reshape(kh_rows, kw_cols, wd, wh, ww, c)
    dy = dy.transpose(2, 0, 3, 1, 4, 5).reshape(wd, kh_rows * wh, wp, c)
    dls_ref[:] += jnp.sum(dy * xn, axis=(0, 1, 2))
    dlb_ref[:] += jnp.sum(dy, axis=(0, 1, 2))
    dxn = dy * gamma
    dx = inv * (dxn - jnp.mean(dxn, axis=-1, keepdims=True)
                - xn * jnp.mean(dxn * xn, axis=-1, keepdims=True))
    dx_ref[0] = dx.astype(dt)


def _pick_bwd_blocking(c: int, nh: int) -> int:
    """kh_rows (h-rows of windows) per backward program; the W axis is always
    spanned fully (Mosaic requires the second-to-last block dim be full or
    8-divisible). The backward holds ~3x the forward's live state (grad
    accumulators + recompute), so it runs one h-row per program — measured
    the fastest configuration that stays within the raised VMEM budget."""
    return 1


def _pallas_bwd_impl(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b,
                     rel_bias, mask, g, *, window, num_heads, ln_eps,
                     interpret):
    b, d, h, w_, c = x.shape
    wd, wh, ww = window
    nd, nh, nw = d // wd, h // wh, w_ // ww
    n = wd * wh * ww
    kh = _pick_bwd_blocking(c, nh)

    grid = (b, nd, nh // kh)
    kernel = functools.partial(_bwd_kernel, window=window,
                               num_heads=num_heads, ln_eps=ln_eps,
                               kh_rows=kh)
    block = pl.BlockSpec((1, wd, kh * wh, w_, c),
                         lambda bi, di, hi: (bi, di, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    acc = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    fwd_flops = (2 * b * nd * nh * nw * n * c * 4 * c
                 + 2 * b * nd * nh * nw * num_heads * n * n * (c // num_heads) * 2)
    dx, dls, dlb, dqkvw, dqkvb, dpw, drel = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            block,                                   # x
            block,                                   # g
            acc(),                                   # ln_scale
            acc(),                                   # ln_bias
            acc(),                                   # qkv_w
            acc(),                                   # qkv_b
            acc(),                                   # proj_w
            acc(),                                   # rel_bias
            pl.BlockSpec((1, kh, nw, n, n),
                         lambda bi, di, hi: (di, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # mask
        ],
        out_specs=[
            block,                                   # dx
            acc(), acc(), acc(), acc(), acc(), acc()
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((3 * c,), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((num_heads, n, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * fwd_flops, bytes_accessed=x.size * 8,
            transcendentals=b * nd * nh * nw * n * n),
        # The dgrad program's live set (recompute + grad accumulators +
        # per-head cotangent pieces) peaks at 25.35 MB at C=512 (XLA scoped-
        # allocation report) — above Mosaic's conservative 16 MB default.
        # Raise it only as far as needed: large raises (64 MB) on big-grid
        # programs fault the TPU worker on this backend (reproduced and
        # bisected on-chip), while 28 MB leaves VMEM headroom for the
        # pipeline buffers.
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=28 * 2**20)
                         if not interpret else None),
        interpret=interpret,
    )(x, g.astype(x.dtype), ln_scale, ln_bias, qkv_w, qkv_b, proj_w, rel_bias,
      mask)

    d_proj_b = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3))
    return (dx,
            dls.astype(ln_scale.dtype),
            dlb.astype(ln_bias.dtype),
            dqkvw.astype(qkv_w.dtype),
            dqkvb.astype(qkv_b.dtype),
            dpw.astype(proj_w.dtype),
            d_proj_b.astype(proj_b.dtype),
            drel.astype(rel_bias.dtype),
            jnp.zeros_like(mask))


#: Largest clip count the fused backward kernel may serve. The kernel needs
#: a raised scoped-vmem budget (25.35 MB at C=512), and on this backend a
#: raised budget combined with a large grid reproducibly faults the TPU
#: worker (bisected on-chip: 36-clip train steps run, 48-clip ones fault
#: with ANY raised budget while running clean with the default budget).
#: Above the threshold the backward transparently falls back to
#: differentiating the XLA-equivalent computation, which needs no raise.
PALLAS_BWD_MAX_CLIPS = 40


def _bwd(window, num_heads, ln_eps, interpret, res, g):
    import os

    use_pallas = not os.environ.get("LRCE_TPU_XLA_BWD")
    if use_pallas and not interpret and res[0].shape[0] > PALLAS_BWD_MAX_CLIPS:
        use_pallas = False
    if not use_pallas:
        # Backward through the XLA-equivalent computation (recompute fwd).
        def f(*args):
            return _xla_equivalent(*args, window=window, num_heads=num_heads,
                                   ln_eps=ln_eps)

        _, vjp = jax.vjp(f, *res)
        return vjp(g)

    return _pallas_bwd_impl(*res, g, window=window, num_heads=num_heads,
                            ln_eps=ln_eps, interpret=interpret)


fused_window_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Head-split variant for large C (stage3, C=1024): the full-C kernel's
# weights + rel-bias alone exceed VMEM, so the grid gains a head-group axis.
# Each program computes one head group's attention context and accumulates
# its slice of the output projection into an f32 scratch that persists
# across the (innermost, consecutive) head-group iterations; the output
# block is written once, on the last group.
# ---------------------------------------------------------------------------

def _hsplit_kernel(x_ref, ln_scale_ref, ln_bias_ref, wg_ref, bg_ref,
                   proj_w_ref, proj_b_ref, bias_ref, mask_ref, out_ref,
                   acc_ref, *, window: Tuple[int, int, int], group: int,
                   ln_eps: float):
    wd, wh, ww = window
    n = wd * wh * ww
    gi = pl.program_id(3)
    n_groups = pl.num_programs(3)

    x = x_ref[:]                       # (kb, wd, wh, Wp, C)
    kb, _, _, wp, c = x.shape
    nw = wp // ww
    nwin = kb * nw
    hd_g = wg_ref.shape[-1] // 3       # group * head_dim
    hd = hd_g // group
    dt = x.dtype
    scale = 1.0 / math.sqrt(hd)

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    y = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(jnp.float32)
    y = y.astype(dt)

    # partition: (kb, wd, wh, nw, ww, C) -> (kb*nw, N, C)
    y = y.reshape(kb, wd, wh, nw, ww, c)
    y = y.transpose(0, 3, 1, 2, 4, 5).reshape(nwin, n, c)

    qkv = jnp.dot(y.reshape(nwin * n, c), wg_ref[0].astype(dt),
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bg_ref[0].astype(jnp.float32)).astype(dt)
    qkv = qkv.reshape(nwin, n, 3 * hd_g)

    mask = mask_ref[0].reshape(nw, n, n)
    mask = jnp.broadcast_to(mask[None], (kb, nw, n, n)).reshape(nwin, n, n)
    ctx_heads = []
    for j in range(group):
        qh = qkv[:, :, j * hd:(j + 1) * hd]
        kh = qkv[:, :, hd_g + j * hd:hd_g + (j + 1) * hd]
        vh = qkv[:, :, 2 * hd_g + j * hd:2 * hd_g + (j + 1) * hd]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        logits = logits + bias_ref[j][None] + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ctx_heads.append(jax.lax.dot_general(
            w, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))
    ctx = jnp.concatenate(ctx_heads, axis=-1).reshape(nwin * n, hd_g)

    partial = jnp.dot(ctx, proj_w_ref[:].astype(dt),
                      preferred_element_type=jnp.float32)  # (nwin*N, C) f32

    @pl.when(gi == 0)
    def _():
        acc_ref[:] = partial

    @pl.when(gi > 0)
    def _():
        acc_ref[:] = acc_ref[:] + partial

    @pl.when(gi == n_groups - 1)
    def _():
        out = acc_ref[:] + proj_b_ref[:].astype(jnp.float32)
        out = out.astype(dt).reshape(kb, nw, wd, wh, ww, c)
        out = out.transpose(0, 2, 3, 1, 4, 5)
        out_ref[:] = out.reshape(kb, wd, wh, wp, c)


def _pick_hsplit_blocking(b: int, c: int, num_heads: int) -> Tuple[int, int]:
    """(clips per program, heads per group). Chosen so weights-per-group plus
    the f32 accumulator stay well inside VMEM at C=1024 (measured headroom;
    group=8 -> ~1.6 MB of qkv weight slice per program)."""
    group = 8
    while num_heads % group:
        group //= 2
    kb = 2
    while b % kb:
        kb -= 1
    return kb, group


def _hsplit_fwd_impl(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b,
                     rel_bias, mask, *, window, num_heads, ln_eps, interpret,
                     kb=None, group=None):
    b, d, h, w_, c = x.shape
    wd, wh, ww = window
    nd, nh, nw = d // wd, h // wh, w_ // ww
    n = wd * wh * ww
    hd = c // num_heads
    kb_auto, group_auto = _pick_hsplit_blocking(b, c, num_heads)
    kb = kb if kb is not None else kb_auto
    group = group if group is not None else group_auto
    n_groups = num_heads // group
    hd_g = group * hd

    # Relay the packed (C, 3C) qkv weight into per-group slabs
    # (n_groups, C, [q_g | k_g | v_g]) so one BlockSpec index picks a group.
    wg = qkv_w.reshape(c, 3, n_groups, hd_g).transpose(2, 0, 1, 3)
    wg = wg.reshape(n_groups, c, 3 * hd_g)
    bg = qkv_b.reshape(3, n_groups, hd_g).transpose(1, 0, 2)
    bg = bg.reshape(n_groups, 1, 3 * hd_g)  # middle 1: Mosaic block-shape rule

    grid = (b // kb, nd, nh, n_groups)
    kernel = functools.partial(_hsplit_kernel, window=window, group=group,
                               ln_eps=ln_eps)
    flops = (2 * b * nd * nh * nw * n * c * 4 * c
             + 2 * b * nd * nh * nw * num_heads * n * n * hd * 2)
    block = pl.BlockSpec((kb, wd, wh, w_, c),
                         lambda bi, di, hi, gi: (bi, di, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            block,                                        # x
            pl.BlockSpec(memory_space=pltpu.VMEM),        # ln_scale
            pl.BlockSpec(memory_space=pltpu.VMEM),        # ln_bias
            pl.BlockSpec((1, c, 3 * hd_g),
                         lambda bi, di, hi, gi: (gi, 0, 0),
                         memory_space=pltpu.VMEM),        # grouped qkv_w
            pl.BlockSpec((1, 1, 3 * hd_g),
                         lambda bi, di, hi, gi: (gi, 0, 0),
                         memory_space=pltpu.VMEM),        # grouped qkv_b
            pl.BlockSpec((hd_g, c),
                         lambda bi, di, hi, gi: (gi, 0),
                         memory_space=pltpu.VMEM),        # proj_w rows
            pl.BlockSpec(memory_space=pltpu.VMEM),        # proj_b
            pl.BlockSpec((group, n, n),
                         lambda bi, di, hi, gi: (gi, 0, 0),
                         memory_space=pltpu.VMEM),        # rel_bias group
            pl.BlockSpec((1, 1, nw, n, n),
                         lambda bi, di, hi, gi: (di, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # mask
        ],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((kb * nw * n, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=x.size * 4,
                                      transcendentals=b * nd * nh * nw * n * n),
        # Raised scoped-vmem budget ONLY for f32 (see _fused_fwd_impl): a
        # raised budget on large-grid bf16 programs faults the TPU worker
        # on this backend, and the bf16 live set (~7 MB/program) fits the
        # default budget.
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)
                         if not interpret and x.dtype == jnp.float32
                         else None),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wg, bg, proj_w, proj_b, rel_bias, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_window_attention_hsplit(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w,
                                  proj_b, rel_bias, mask, window, num_heads,
                                  ln_eps=1e-5, interpret=False):
    """Head-split fused LN1 + window attention + proj for channel widths
    whose weights exceed the single-program VMEM budget (C > 512).

    Same contract as fused_window_attention. The backward differentiates
    the XLA-equivalent computation (the op covers only the 2 stage3 blocks,
    so a hand-written dgrad kernel is not worth its VMEM pressure there).
    """
    return _hsplit_fwd_impl(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w,
                            proj_b, rel_bias, mask, window=window,
                            num_heads=num_heads, ln_eps=ln_eps,
                            interpret=interpret)


def _hsplit_fwd(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b, rel_bias,
                mask, window, num_heads, ln_eps, interpret):
    out = _hsplit_fwd_impl(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b,
                           rel_bias, mask, window=window, num_heads=num_heads,
                           ln_eps=ln_eps, interpret=interpret)
    return out, (x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b, rel_bias,
                 mask)


def _hsplit_bwd(window, num_heads, ln_eps, interpret, res, g):
    def f(*args):
        return _xla_equivalent(*args, window=window, num_heads=num_heads,
                               ln_eps=ln_eps)

    _, vjp = jax.vjp(f, *res)
    return vjp(g)


fused_window_attention_hsplit.defvjp(_hsplit_fwd, _hsplit_bwd)
