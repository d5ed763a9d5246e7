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
materializes attention intermediates in HBM. At C>=512 the backward splits
the heads into chunks — one pallas_call per chunk — so every program's live
set fits Mosaic's 16 MB default scoped-vmem budget (a raised budget on a
large grid faults this backend's TPU worker; PERF.md "Backend fault"); the
LayerNorm input backward then runs as one fused XLA pass over the summed
partial cotangents. Set LRCE_TPU_XLA_BWD=1 BEFORE import to fall back to
differentiating the XLA-equivalent computation instead.

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


def _lane_sum(t):
    """Sum over the minor (lane) dim via a bf16 MXU matmul against ones,
    f32 accumulation.

    On this backend a VPU lane-reduction is a ~log2(lanes) shuffle-add
    chain that costs several elementwise passes over the operand (measured:
    the two LayerNorm reductions alone cost ~1.5 ms per stage0 apply),
    while the MXU sits idle next to it. A bf16 (.., N) @ (N, 1) matmul
    produces the sum in MXU silicon with f32 accumulation: EXACT for bf16
    operands (the sum of the same bf16 values, just MXU-reassociated); for
    f32 operands the bf16 cast rounds each element (callers gate on dtype
    where that matters). An f32 MXU matmul is NOT a win here — it lowers to
    a multi-pass decomposition that measured slower than the shuffle chain."""
    tb = t.astype(jnp.bfloat16)
    if t.ndim == 3:
        # batched form: Mosaic cannot shape-cast a bf16 batch whose minor
        # dim is not lane-aligned (e.g. (nwin, 147, 147)), so keep the
        # batch dim explicit instead of letting the lowering collapse it
        ones = jnp.ones((t.shape[0], t.shape[-1], 1), jnp.bfloat16)
        return jax.lax.dot_general(
            tb, ones, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    ones = jnp.ones((t.shape[-1], 1), jnp.bfloat16)
    return jax.lax.dot_general(
        tb, ones, (((t.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _ln_mxu(x, scale_ref, bias_ref, eps):
    """LayerNorm over the minor dim, f32 math, output in x.dtype.

    bf16 activations: the mean comes from an exact bf16 MXU lane sum (see
    _lane_sum) — one reduction chain instead of two; the variance keeps the
    f32 VPU reduction (an exact two-pass var; casting squared deviations to
    bf16 would round them). f32 activations (parity/oracle runs) use the
    original all-VPU reductions bit-for-bit."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    if x.dtype == jnp.bfloat16:
        mean = _lane_sum(x) * (1.0 / c)
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
    d = xf - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    y = d * jax.lax.rsqrt(var + eps)
    return (y * scale_ref[:].astype(jnp.float32)
            + bias_ref[:].astype(jnp.float32)).astype(x.dtype)


def _attn_ctx(qkv, bias_ref, mask, num_heads, c, scale, dt):
    """Per-head window attention on packed (nwin, N, 3C) qkv -> (nwin, N, C)
    context, head loop unrolled at trace time (Mosaic cannot split the lane
    dim in registers, so heads are static lane slices). VPU economy in the
    N^2 softmax region (N pads to lane multiples, so every full-matrix pass
    costs ~1.74x its logical size at N=147):
      - q is pre-scaled on the small (nwin, N, hd) slice, exactly like the
        reference's `q = q * self.scale` (video_swin_ori.py:158-163),
        instead of scaling the f32 logits matrix;
      - the mask add (plus its HBM stream) disappears entirely for
        unshifted blocks (mask=None);
      - the softmax divide becomes a per-row reciprocal + broadcast
        multiply (VPU divides are many-cycle; multiplies are one).
    """
    hd = c // num_heads
    ctx_heads = []
    for h in range(num_heads):
        qh = qkv[:, :, h * hd:(h + 1) * hd] * scale        # (nwin, N, hd)
        kh = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        vh = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (nwin, N, N)
        add = bias_ref[h][None] if mask is None else bias_ref[h][None] + mask
        logits = logits + add
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        if dt == jnp.bfloat16:
            # MXU denominator (see _lane_sum): the bf16 cast rounds each
            # exp term by <=2^-8 relative — the same order as the bf16
            # rounding of the weights w themselves one line later.
            r = 1.0 / _lane_sum(e)
        else:
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        w = (e * r).astype(dt)
        ctx_heads.append(jax.lax.dot_general(
            w, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))
    return jnp.concatenate(ctx_heads, axis=-1)


def _kernel(x_ref, ln_scale_ref, ln_bias_ref, qkv_w_ref, qkv_b_ref,
            proj_w_ref, proj_b_ref, bias_ref, mask_ref, out_ref, *,
            window: Tuple[int, int, int], num_heads: int, ln_eps: float,
            kh_rows: int, has_mask: bool):
    wd, wh, ww = window
    n = wd * wh * ww
    x = x_ref[0]  # (wd, kh_rows*wh, Wp, C) — kh_rows h-rows of windows
    _, _, wp, c = x.shape
    nw = wp // ww
    nwin = kh_rows * nw  # windows handled by this program
    hd = c // num_heads
    dt = x.dtype

    # LayerNorm over C in f32 (MXU lane sums)
    y = _ln_mxu(x, ln_scale_ref, ln_bias_ref, ln_eps)

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
    mask = (mask_ref[0].reshape(nwin, n, n).astype(jnp.float32)
            if has_mask else None)
    ctx = _attn_ctx(qkv, bias_ref, mask, num_heads, c, scale, dt)
    ctx = ctx.reshape(nwin * n, c)

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
    if mask.ndim == 5 and mask.shape[-1] == n:  # scalar sentinel = unshifted
        n_windows = mask.shape[0] * mask.shape[1] * mask.shape[2]
        mask_flat = mask.reshape(n_windows, n, n).astype(jnp.float32)
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
    has_mask = mask.ndim == 5 and mask.shape[-1] == n
    # Shift-mask values are exactly {0, -100}: bf16 represents them exactly,
    # halving the per-program mask stream (the mask block is refetched every
    # grid step whose (di, hi) changes).
    if has_mask and x.dtype == jnp.bfloat16:
        mask = mask.astype(jnp.bfloat16)
    mask_spec = (pl.BlockSpec((1, kh, nw, n, n),
                              lambda bi, di, hi: (di, hi, 0, 0, 0),
                              memory_space=pltpu.VMEM) if has_mask
                 else pl.BlockSpec(memory_space=pltpu.VMEM))
    kernel = functools.partial(_kernel, window=window, num_heads=num_heads,
                               ln_eps=ln_eps, kh_rows=kh, has_mask=has_mask)
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
            mask_spec,                              # mask (or scalar sentinel)
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

    mask: (nd, nh, nw, N, N) additive f32, or a (1, 1, 1, 1, 1) scalar
    sentinel for unshifted blocks — the sentinel skips the in-kernel mask
    add AND its per-program HBM stream entirely.
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


def _bwd_chunk_kernel(x_ref, g_ref, ln_scale_ref, ln_bias_ref, wc_ref, bc_ref,
                      pwc_ref, bias_ref, mask_ref,
                      dy_ref, dqkvw_ref, dqkvb_ref, dpw_ref, drel_ref, *,
                      window: Tuple[int, int, int], chunk_heads: int,
                      ln_eps: float, kh_rows: int, n_wgroups: int,
                      has_mask: bool):
    """Backward for one HEAD CHUNK of LN1 + window attention + proj on one
    (wd, kh*wh, Wp, C) tile: recomputes LN/qkv/softmax in VMEM (flash-style)
    for the chunk's heads only and produces

      dy (partial)  — this chunk's contribution to the LN-output cotangent,
                      in x layout (the LN input backward runs OUTSIDE, in one
                      fused XLA pass, once all chunks are summed);
      dWqkv/dbqkv   — this chunk's column slice, [q_cols | k_cols | v_cols];
      dWproj rows   — this chunk's row slice;
      drel          — this chunk's heads' relative-position-bias grads.

    Weight grads accumulate across the sequential grid into constant-index
    output blocks (TPU grids are sequential, so the accumulator blocks stay
    VMEM-resident for the whole call and flush once at the end). Chunking
    the heads bounds the per-program live set under Mosaic's 16 MB default
    scoped-vmem budget — this backend reproducibly faults the TPU worker
    when a raised budget meets a large grid (see PERF.md "Backend fault"),
    so no budget raise is acceptable on the training path.
    """
    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
             & (pl.program_id(2) == 0))

    @pl.when(first)
    def _():
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
    kwg = kw_cols // n_wgroups         # window columns per window group
    nwin = kh_rows * kwg               # windows per group
    ch = pwc_ref.shape[0]              # chunk width = chunk_heads * head_dim
    hd = ch // chunk_heads
    dt = x.dtype
    scale = 1.0 / math.sqrt(hd)

    # ---- recompute LayerNorm output (input backward happens outside) ----
    y = _ln_mxu(x, ln_scale_ref, ln_bias_ref, ln_eps)

    def part(t):  # (wd, kh*wh, kwg*ww, C) -> (nwin, N, C)
        t = t.reshape(wd, kh_rows, wh, kwg, ww, c)
        return t.transpose(1, 3, 0, 2, 4, 5).reshape(nwin, n, c)

    # The W axis is processed in n_wgroups sequential slices: the Mosaic
    # block-shape rule forbids blocking W in the grid (56 = 8 windows of 7
    # — no 8-divisible window-aligned split), but an in-kernel slice loop
    # divides every softmax-sized live tensor by n_wgroups all the same.
    # Stage0 (C=128, 56x56) needs 2 groups to sit under the 16 MB default
    # scoped-vmem budget; weight grads accumulate across groups exactly as
    # they do across the sequential grid.
    dy_groups = []
    for wg in range(n_wgroups):
        cols = slice(wg * kwg * ww, (wg + 1) * kwg * ww)
        y2d = part(y[:, :, cols, :]).reshape(nwin * n, c)
        g2d = part(g[:, :, cols, :]).reshape(nwin * n, c)

        # ---- recompute this chunk's qkv columns ----
        qkv = jnp.dot(y2d, wc_ref[:], preferred_element_type=jnp.float32)
        qkv = (qkv + bc_ref[:].astype(jnp.float32)).astype(dt)
        qkv = qkv.reshape(nwin, n, 3 * ch)

        mask = (mask_ref[0][:, wg * kwg:(wg + 1) * kwg]
                .reshape(nwin, n, n).astype(jnp.float32)
                if has_mask else None)

        # ---- proj backward for the chunk's rows: dctx = g @ Wp[rows]^T ----
        dctx = jax.lax.dot_general(
            g2d, pwc_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt).reshape(
                nwin, n, ch)

        # Per-head attention backward. Narrow (nwin, N, hd) pieces are
        # lane-concatenated INCREMENTALLY into running accumulators —
        # Mosaic cannot shape-cast sub-lane-width vectors (e.g.
        # (nwin, 147, 32) -> (nwin*147, 32)), and keeping every head's
        # padded piece alive until one final concat is what blew the 16 MB
        # scoped-vmem budget (hd=32 lanes pad to 128: 4x waste per piece).
        # With the rolling concat each dead piece frees as soon as it is
        # absorbed. The dq/dk/dv accumulators are kept in the ACTIVATION
        # dtype: the dWqkv/dy matmuls consume them in that dtype anyway,
        # and the only f32 consumer (the bias sum) is taken per piece
        # BEFORE the cast — numerically identical, and at bf16 it halves
        # three full-width live tensors.
        ctx_acc = None
        dq_acc, dk_acc, dv_acc = None, None, None
        dqb_acc, dkb_acc, dvb_acc = None, None, None
        cat = lambda a, b: (b if a is None  # noqa: E731
                            else jnp.concatenate([a, b], -1))
        for j in range(chunk_heads):
            # q pre-scaled on the small slice (mirrors the forward kernel's
            # VPU economy; dk then needs no second scale — it contracts the
            # already-scaled q — while dq keeps its explicit scale)
            qh = qkv[:, :, j * hd:(j + 1) * hd] * scale
            kh_ = qkv[:, :, ch + j * hd:ch + (j + 1) * hd]
            vh = qkv[:, :, 2 * ch + j * hd:2 * ch + (j + 1) * hd]

            # recompute softmax for this head
            logits = jax.lax.dot_general(
                qh, kh_, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            add = (bias_ref[j][None] if mask is None
                   else bias_ref[j][None] + mask)
            logits = logits + add
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            # exact VPU sums here: the backward's gradients are compared
            # against the XLA VJP at 2e-3 — MXU bf16-cast denominators
            # would spend that whole budget on the recompute alone
            p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
            pb = p.astype(dt)

            ctx_acc = cat(ctx_acc, jax.lax.dot_general(
                pb, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(dt))

            dctx_h = dctx[:, :, j * hd:(j + 1) * hd]
            dp = jax.lax.dot_general(
                dctx_h, vh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # (nwin, N, N)
            dv_h = jax.lax.dot_general(
                pb, dctx_h, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # (nwin, N, hd)
            dvb_acc = cat(dvb_acc, jnp.sum(dv_h, axis=(0, 1), keepdims=True))
            dv_acc = cat(dv_acc, dv_h.astype(dt))
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            drel_ref[j, :, :] += jnp.sum(ds, axis=0)
            dsb = ds.astype(dt)
            dq_h = jax.lax.dot_general(
                dsb, kh_, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # (nwin, N, hd)
            dqb_acc = cat(dqb_acc, jnp.sum(dq_h, axis=(0, 1), keepdims=True))
            dq_acc = cat(dq_acc, dq_h.astype(dt))
            dk_h = jax.lax.dot_general(
                dsb, qh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dkb_acc = cat(dkb_acc, jnp.sum(dk_h, axis=(0, 1), keepdims=True))
            dk_acc = cat(dk_acc, dk_h.astype(dt))

        # dWp[rows] = ctx^T g over the group's rows (forward's lane layout)
        ctx2d = ctx_acc.reshape(nwin * n, ch)
        dpw_ref[:] += jax.lax.dot_general(
            ctx2d, g2d, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # dqkv in the packed [q | k | v] chunk lane layout, then one matmul
        # each for dWqkv columns (contract rows) and dy partial (contract
        # lanes). Bias sums stay (1, 1, hd)-shaped through the loop (a bare
        # (hd,) vector is sub-lane-width for hd<128 and crashes Mosaic);
        # collapse once here at full 3*ch lane width.
        dqkvb_ref[:] += jnp.concatenate(
            [dqb_acc, dkb_acc, dvb_acc], axis=-1).reshape(3 * ch)
        dqkv2d = jnp.concatenate(
            [dq_acc, dk_acc, dv_acc], axis=-1).reshape(nwin * n, 3 * ch)
        dqkvw_ref[:] += jax.lax.dot_general(
            y2d, dqkv2d, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dy2d = jax.lax.dot_general(
            dqkv2d, wc_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (nwin*N, C)

        # ---- window reverse into the group's x-layout slice ----
        dyg = dy2d.reshape(kh_rows, kwg, wd, wh, ww, c)
        dyg = dyg.transpose(2, 0, 3, 1, 4, 5).reshape(
            wd, kh_rows * wh, kwg * ww, c)
        dy_groups.append(dyg.astype(dt))

    dy_ref[0] = (dy_groups[0] if n_wgroups == 1
                 else jnp.concatenate(dy_groups, axis=2))


def _pick_bwd_chunks(c: int, num_heads: int, dtype) -> int:
    """Number of head chunks (= sequential pallas_calls) the backward splits
    into. Sized so each chunk's live set (recompute + grad accumulators +
    per-head cotangent pieces) fits Mosaic's 16 MB default scoped-vmem
    budget — the whole point: a raised budget faults the TPU worker on
    large grids (PERF.md). f32 activations double the live set, so they
    chunk twice as fine. A chunk is never narrower than 128 lanes: a
    sub-lane-width chunk (e.g. C=128 split in two, ch=64) crashes the
    Mosaic compiler outright on the chunk-width reshape (reproduced
    on-chip: compile-helper subprocess exit 1, not a graceful error)."""
    f32 = jnp.dtype(dtype).itemsize > 2
    if c >= 1024:
        # stage3: the dominant accumulator is dWqkv (C, 3C/chunks) f32 —
        # 6.3 MB at 2 chunks leaves the live set ~36 KB over the default
        # budget at 48-clip train steps (PERF.md "Known headroom", now
        # closed); 4 chunks cost no extra recompute (qkv columns and
        # softmax heads partition exactly) and sit at ~8 MB
        want = 8 if f32 else 4
    elif c >= 256:
        want = 4 if f32 else 2
    else:
        want = 2 if f32 else 1
    want = min(want, max(1, c // 128))
    while want > 1 and num_heads % want:
        want -= 1
    return want


def _pallas_bwd_impl(x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b,
                     rel_bias, mask, g, *, window, num_heads, ln_eps,
                     interpret, chunks=None, wgroups=None):
    b, d, h, w_, c = x.shape
    wd, wh, ww = window
    nd, nh, nw = d // wd, h // wh, w_ // ww
    n = wd * wh * ww
    kh = 1  # h-rows per program; W spanned fully (Mosaic block-shape rule)
    hd = c // num_heads
    n_chunks = chunks if chunks is not None else _pick_bwd_chunks(
        c, num_heads, x.dtype)
    hc = num_heads // n_chunks         # heads per chunk
    ch = hc * hd                       # lane width per chunk
    # Window-group split: stage0 (C=128, un-chunkable — a sub-128-lane
    # head chunk crashes Mosaic) sits ~0.3 MB over the default scoped-vmem
    # budget at one group; halving the W span halves every softmax-sized
    # live tensor instead.
    if wgroups is None:
        wgroups = 2 if (c <= 128 and nw % 2 == 0) else 1
    n_wgroups = wgroups

    grid = (b, nd, nh // kh)
    has_mask = mask.ndim == 5 and mask.shape[-1] == n
    block = pl.BlockSpec((1, wd, kh * wh, w_, c),
                         lambda bi, di, hi: (bi, di, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    acc = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    mask_spec = (pl.BlockSpec((1, kh, nw, n, n),
                              lambda bi, di, hi: (di, hi, 0, 0, 0),
                              memory_space=pltpu.VMEM) if has_mask
                 else acc())
    fwd_flops = (2 * b * nd * nh * nw * n * c * 4 * c
                 + 2 * b * nd * nh * nw * num_heads * n * n * hd * 2)
    kernel = functools.partial(_bwd_chunk_kernel, window=window,
                               chunk_heads=hc, ln_eps=ln_eps, kh_rows=kh,
                               n_wgroups=n_wgroups, has_mask=has_mask)
    gc = g.astype(x.dtype)
    # Shift-mask values are exactly {0, -100}: bf16 represents them exactly,
    # and the in-kernel logits + mask add promotes back to f32 — halving the
    # largest constant input block's VMEM footprint for free.
    mask_in = (mask.astype(x.dtype)
               if has_mask and x.dtype == jnp.bfloat16 else mask)

    dy_f32 = None
    qw_parts, kw_parts, vw_parts = [], [], []
    qb_parts, kb_parts, vb_parts = [], [], []
    dpw_parts, drel_parts = [], []
    for ci in range(n_chunks):
        cols = slice(ci * ch, (ci + 1) * ch)
        # chunk column slice of the packed (C, 3C) qkv weight, pre-cast to
        # the activation dtype (the kernel computed in that dtype anyway;
        # casting outside keeps the f32 master copy out of VMEM)
        wc = jnp.concatenate(
            [qkv_w[:, cols], qkv_w[:, c:][:, cols], qkv_w[:, 2 * c:][:, cols]],
            axis=1).astype(x.dtype)
        bc = jnp.concatenate(
            [qkv_b[cols], qkv_b[c:][cols], qkv_b[2 * c:][cols]])
        pwc = proj_w[cols, :].astype(x.dtype)
        bias_c = rel_bias[ci * hc:(ci + 1) * hc]

        dy_c, dqkvw_c, dqkvb_c, dpw_c, drel_c = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                block,                                   # x
                block,                                   # g
                acc(),                                   # ln_scale
                acc(),                                   # ln_bias
                acc(),                                   # wc (chunk qkv_w)
                acc(),                                   # bc (chunk qkv_b)
                acc(),                                   # pwc (chunk proj_w)
                acc(),                                   # rel_bias chunk
                mask_spec,                               # mask (or sentinel)
            ],
            out_specs=[
                block,                                   # dy partial
                acc(), acc(), acc(), acc()
            ],
            out_shape=[
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct((c, 3 * ch), jnp.float32),
                jax.ShapeDtypeStruct((3 * ch,), jnp.float32),
                jax.ShapeDtypeStruct((ch, c), jnp.float32),
                jax.ShapeDtypeStruct((hc, n, n), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=3 * fwd_flops // n_chunks, bytes_accessed=x.size * 8,
                transcendentals=b * nd * nh * nw * n * n // n_chunks),
            interpret=interpret,
        )(x, gc, ln_scale, ln_bias, wc, bc, pwc, bias_c, mask_in)

        dy_f32 = (dy_c.astype(jnp.float32) if dy_f32 is None
                  else dy_f32 + dy_c.astype(jnp.float32))
        qw_parts.append(dqkvw_c[:, :ch])
        kw_parts.append(dqkvw_c[:, ch:2 * ch])
        vw_parts.append(dqkvw_c[:, 2 * ch:])
        qb_parts.append(dqkvb_c[:ch])
        kb_parts.append(dqkvb_c[ch:2 * ch])
        vb_parts.append(dqkvb_c[2 * ch:])
        dpw_parts.append(dpw_c)
        drel_parts.append(drel_c)

    dqkvw = jnp.concatenate(
        [jnp.concatenate(qw_parts, 1), jnp.concatenate(kw_parts, 1),
         jnp.concatenate(vw_parts, 1)], axis=1)
    dqkvb = jnp.concatenate(qb_parts + kb_parts + vb_parts)
    dpw = jnp.concatenate(dpw_parts, axis=0)
    drel = jnp.concatenate(drel_parts, axis=0)

    # ---- LayerNorm input backward, one fused XLA pass over x and dy ----
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + ln_eps)
    xn = (xf - mean) * inv
    gamma = ln_scale.astype(jnp.float32)
    dls = jnp.sum(dy_f32 * xn, axis=(0, 1, 2, 3))
    dlb = jnp.sum(dy_f32, axis=(0, 1, 2, 3))
    dxn = dy_f32 * gamma
    dx = inv * (dxn - jnp.mean(dxn, axis=-1, keepdims=True)
                - xn * jnp.mean(dxn * xn, axis=-1, keepdims=True))

    d_proj_b = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3))
    return (dx.astype(x.dtype),
            dls.astype(ln_scale.dtype),
            dlb.astype(ln_bias.dtype),
            dqkvw.astype(qkv_w.dtype),
            dqkvb.astype(qkv_b.dtype),
            dpw.astype(proj_w.dtype),
            d_proj_b.astype(proj_b.dtype),
            drel.astype(rel_bias.dtype),
            jnp.zeros_like(mask))


#: Route the window-attention backward through the XLA recompute VJP instead
#: of the fused Pallas kernels. Read ONCE at import: jit memoizes traces, so
#: flipping the env var after the first backward compile would silently have
#: no effect anyway — set it before importing lrce_tpu (tests monkeypatch
#: the module attribute instead).
XLA_BWD = bool(__import__("os").environ.get("LRCE_TPU_XLA_BWD"))


def _bwd(window, num_heads, ln_eps, interpret, res, g):
    # f32 activations at C=128 cannot be made to fit the default budget:
    # the live set is ~2x the bf16 one (itself at the 16 MB edge) and
    # sub-128-lane chunks crash Mosaic, so chunking cannot shrink it
    # further. Route just that call through the XLA recompute VJP — no
    # raised budget anywhere, at any clip count.
    f32_small = (not interpret and res[0].dtype.itemsize > 2
                 and res[0].shape[-1] < 256)
    if XLA_BWD or f32_small:
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
                   ln_eps: float, has_mask: bool):
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

    y = _ln_mxu(x, ln_scale_ref, ln_bias_ref, ln_eps)

    # partition: (kb, wd, wh, nw, ww, C) -> (kb*nw, N, C)
    y = y.reshape(kb, wd, wh, nw, ww, c)
    y = y.transpose(0, 3, 1, 2, 4, 5).reshape(nwin, n, c)

    qkv = jnp.dot(y.reshape(nwin * n, c), wg_ref[0].astype(dt),
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bg_ref[0].astype(jnp.float32)).astype(dt)
    qkv = qkv.reshape(nwin, n, 3 * hd_g)

    if has_mask:
        mask = mask_ref[0].reshape(nw, n, n).astype(jnp.float32)
        mask = jnp.broadcast_to(mask[None], (kb, nw, n, n)).reshape(nwin, n, n)
    else:
        mask = None
    ctx_heads = []
    for j in range(group):
        qh = qkv[:, :, j * hd:(j + 1) * hd] * scale
        kh = qkv[:, :, hd_g + j * hd:hd_g + (j + 1) * hd]
        vh = qkv[:, :, 2 * hd_g + j * hd:2 * hd_g + (j + 1) * hd]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        add = bias_ref[j][None] if mask is None else bias_ref[j][None] + mask
        logits = logits + add
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))).astype(dt)
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
    has_mask = mask.ndim == 5 and mask.shape[-1] == n
    if has_mask and x.dtype == jnp.bfloat16:
        mask = mask.astype(jnp.bfloat16)
    mask_spec = (pl.BlockSpec((1, 1, nw, n, n),
                              lambda bi, di, hi, gi: (di, hi, 0, 0, 0),
                              memory_space=pltpu.VMEM) if has_mask
                 else pl.BlockSpec(memory_space=pltpu.VMEM))
    kernel = functools.partial(_hsplit_kernel, window=window, group=group,
                               ln_eps=ln_eps, has_mask=has_mask)
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
            mask_spec,                                    # mask (or sentinel)
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

    Same contract as fused_window_attention — including the backward: the
    head-chunked flash-style Pallas backward is forward-kernel-agnostic
    (it recomputes LN/qkv/softmax per head chunk from the residuals), so
    stage3 trains through the same fused dgrad as every other stage, with
    chunking sized for C=1024 (_pick_bwd_chunks).
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
    # The chunked Pallas backward implements the OP's math, not a specific
    # forward kernel, so the hsplit forward shares it (round-3 verdict
    # next-step #4: the last XLA-VJP remnant in the train backbone).
    if XLA_BWD:
        def f(*args):
            return _xla_equivalent(*args, window=window, num_heads=num_heads,
                                   ln_eps=ln_eps)

        _, vjp = jax.vjp(f, *res)
        return vjp(g)
    return _pallas_bwd_impl(*res, g, window=window, num_heads=num_heads,
                            ln_eps=ln_eps, interpret=interpret)


fused_window_attention_hsplit.defvjp(_hsplit_fwd, _hsplit_bwd)
