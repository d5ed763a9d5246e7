"""Pallas fused WHOLE Swin block: LN1 + window attention + proj + residual
+ LN2 + MLP + residual in ONE VMEM-resident program.

Why: this backend's measured effective HBM bandwidth is low (~110-180 GB/s
for a jitted elementwise pass — see PERF.md "Bandwidth"), so the C<=512
Swin stages are bandwidth-bound: the decomposed path (fused-attention
kernel + residual add + fused-MLP kernel) moves the full activation tensor
through HBM six times per block. This kernel moves it twice — one read, one
write — computing

    h  = x + proj(attn(LN1(x)))          # window attention on x's tile
    out = h + fc2(gelu(fc1(LN2(h))))     # per-token MLP

entirely in VMEM. Everything after window-reverse is per-token, so the
whole block commutes with the cyclic shift roll: shifted blocks run the
kernel on the pre-rolled tensor and roll back afterwards, exactly like the
attention-only kernel (lrce_tpu/models/swin3d.py swin_block).

Backward differentiates the decomposed composition (fused_window_attention
keeps its hand-written Pallas VJP; the MLP backward is XLA), so training
can route through this op wherever drop_path is inactive.

Reference behavior being fused: one SwinTransformerBlock3D forward
(reference lrce/feature_extractor/video_swin_ori.py:248-306).
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

from lrce_tpu.ops.pallas_mlp import _erf_f32
from lrce_tpu.ops import pallas_window_attn as PWA


_ln_f32 = PWA._ln_mxu  # LayerNorm with MXU lane sums (see pallas_window_attn)


def _block_kernel(x_ref, ln1s_ref, ln1b_ref, qkv_w_ref, qkv_b_ref,
                  proj_w_ref, proj_b_ref, bias_ref, mask_ref,
                  ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  dp1_ref, dp2_ref,
                  out_ref, *, window: Tuple[int, int, int], num_heads: int,
                  ln_eps: float, kh_rows: int, has_mask: bool,
                  ff_chunks: int, has_dp: bool):
    wd, wh, ww = window
    n = wd * wh * ww
    x = x_ref[0]                       # (wd, kh*wh, Wp, C)
    _, _, wp, c = x.shape
    nw = wp // ww
    nwin = kh_rows * nw
    dt = x.dtype
    scale = 1.0 / math.sqrt(c // num_heads)

    # ---- LN1 + window partition + qkv ----
    y = _ln_f32(x, ln1s_ref, ln1b_ref, ln_eps)
    y = y.reshape(wd, kh_rows, wh, nw, ww, c)
    y = y.transpose(1, 3, 0, 2, 4, 5).reshape(nwin, n, c)
    qkv = jnp.dot(y.reshape(nwin * n, c), qkv_w_ref[:].astype(dt),
                  preferred_element_type=jnp.float32)
    qkv = (qkv + qkv_b_ref[:].astype(jnp.float32)).astype(dt)
    qkv = qkv.reshape(nwin, n, 3 * c)

    mask = (mask_ref[0].reshape(nwin, n, n).astype(jnp.float32)
            if has_mask else None)
    ctx = PWA._attn_ctx(qkv, bias_ref, mask, num_heads, c, scale, dt)
    ctx = ctx.reshape(nwin * n, c)

    attn = jnp.dot(ctx, proj_w_ref[:].astype(dt),
                   preferred_element_type=jnp.float32)
    attn = attn + proj_b_ref[:].astype(jnp.float32)
    if has_dp:
        # stochastic depth: per-sample bernoulli/keep multiplier, applied
        # in f32 before the cast (the multiply rides the bias-add pass).
        # dp refs are FULL (B, 1) arrays in SMEM indexed by the batch
        # program id: a (1, 1) blocked VMEM window over (B, 1) violates
        # Mosaic's (8, 128) block divisibility rule on real TPUs.
        attn = attn * dp1_ref[pl.program_id(0), 0]
    attn = attn.astype(dt)

    # window reverse into x layout, then residual (dt adds, matching the
    # decomposed path's shortcut + attn)
    attn = attn.reshape(kh_rows, nw, wd, wh, ww, c).transpose(2, 0, 3, 1, 4, 5)
    h1 = x + attn.reshape(wd, kh_rows * wh, wp, c)

    # ---- LN2 + MLP + residual ----
    z = _ln_f32(h1, ln2s_ref, ln2b_ref, ln_eps).reshape(wd * kh_rows * wh * wp,
                                                        c)
    ff = w1_ref.shape[1]
    fc = ff // ff_chunks
    # FF column chunking bounds the f32 gelu transient (tokens, ff) — the
    # largest live tensor at C=512 — under the 16 MB default scoped-vmem
    # budget; fc2 partial products accumulate in f32.
    out = None
    for i in range(ff_chunks):
        hmid = jnp.dot(z, w1_ref[:, i * fc:(i + 1) * fc],
                       preferred_element_type=jnp.float32)
        hmid = hmid + b1_ref[i * fc:(i + 1) * fc].astype(jnp.float32)
        hmid = hmid * 0.5 * (1.0 + _erf_f32(hmid * (1.0 / math.sqrt(2.0))))
        part = jnp.dot(hmid.astype(dt), w2_ref[i * fc:(i + 1) * fc, :],
                       preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    out = out + b2_ref[:].astype(jnp.float32)
    if has_dp:
        out = out * dp2_ref[pl.program_id(0), 0]
    out = h1.reshape(-1, c).astype(jnp.float32) + out   # f32 residual, like
    out_ref[0] = out.astype(dt).reshape(x.shape)        # ops/pallas_mlp.py


def _pick_ff_chunks(c: int, dtype) -> int:
    """The f32 gelu transient is (tokens_per_program, 4C); at C=512 with
    kh_rows=1 that is (441, 2048) f32 = 3.6 MB on top of qkv weights (1.5
    MB), MLP weights (4 MB) and the attention transients — chunking the FF
    axis in 2 keeps the program under the 16 MB default budget (a raised
    budget faults this backend's TPU worker on large grids, PERF.md)."""
    f32 = jnp.dtype(dtype).itemsize > 2
    if c >= 1024:
        # stage3 (fused_ln_mlp / _mlp_bwd_impl only — the whole-block
        # forward is gated to C<=512): one FF column slab's weights plus
        # the f32 dW accumulators must stay a few MB
        return 16 if f32 else 8
    if c >= 512:
        return 4 if f32 else 2
    return 2 if f32 else 1


def _block_fwd_impl(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias,
                    mask, ln2s, ln2b, w1, b1, w2, b2, dp1, dp2, *, window,
                    num_heads, ln_eps, interpret, kh_rows=None,
                    ff_chunks=None):
    b, d, h, w_, c = x.shape
    wd, wh, ww = window
    nd, nh, nw = d // wd, h // wh, w_ // ww
    n = wd * wh * ww
    kh = kh_rows if kh_rows is not None else PWA._pick_kh_rows(c, nh, x.dtype)
    if nh % kh != 0:
        kh = 1
    ffc = ff_chunks if ff_chunks is not None else _pick_ff_chunks(c, x.dtype)
    ff = w1.shape[1]
    while ff % ffc:
        ffc -= 1

    grid = (b, nd, nh // kh)
    has_mask = mask.ndim == 5 and mask.shape[-1] == n
    if has_mask and x.dtype == jnp.bfloat16:
        mask = mask.astype(jnp.bfloat16)
    mask_spec = (pl.BlockSpec((1, kh, nw, n, n),
                              lambda bi, di, hi: (di, hi, 0, 0, 0),
                              memory_space=pltpu.VMEM) if has_mask
                 else pl.BlockSpec(memory_space=pltpu.VMEM))
    has_dp = dp1.shape[0] == b          # (1, 1) ones sentinel when inactive
    # Per-sample scalars ride in SMEM as the FULL (B, 1) array (trivial
    # window — exempt from Mosaic's (8, 128) block divisibility rule, which
    # a (1, 1) blocked window over (B, 1) violates on real TPUs).
    dp_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(_block_kernel, window=window,
                               num_heads=num_heads, ln_eps=ln_eps,
                               kh_rows=kh, has_mask=has_mask, ff_chunks=ffc,
                               has_dp=has_dp)
    tokens = b * d * h * w_
    flops = (2 * tokens * c * 4 * c                       # qkv + proj
             + 2 * tokens * 2 * n * c                     # QK^T + PV
             + 2 * tokens * c * ff * 2)                   # fc1 + fc2
    block = pl.BlockSpec((1, wd, kh * wh, w_, c),
                         lambda bi, di, hi: (bi, di, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([block] + [full] * 7 + [mask_spec] + [full] * 6
                  + [dp_spec, dp_spec]),
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 4,
            transcendentals=b * nd * nh * nw * n * n + tokens * ff),
        # Raised scoped-vmem budget ONLY for f32 parity runs (small batch);
        # bf16 fits the 16 MB default, and a raised budget on large-grid
        # bf16 programs faults this backend's TPU worker (PERF.md).
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)
                         if not interpret and x.dtype == jnp.float32
                         else None),
        interpret=interpret,
    )(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask,
      ln2s, ln2b, w1, b1, w2, b2, dp1, dp2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19, 20))
def fused_swin_block(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias,
                     mask, ln2s, ln2b, w1, b1, w2, b2, dp1, dp2, window,
                     num_heads, ln_eps=1e-5, interpret=False):
    """Whole Swin block (attention sub-block + MLP sub-block, both
    residuals) on a pre-rolled, pre-padded (B, D, H, W, C) tensor.

    mask: (nd, nh, nw, N, N) additive, or a (1, 1, 1, 1, 1) scalar sentinel
    for unshifted blocks. dp1/dp2: per-sample stochastic-depth multipliers
    (B, 1) f32 (bernoulli/keep, drawn outside), or a (1, 1) ones sentinel
    when drop_path is inactive. Weights in the conventions of
    fused_window_attention / fused_mlp, pre-cast to the activation dtype.
    """
    return _block_fwd_impl(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b,
                           rel_bias, mask, ln2s, ln2b, w1, b1, w2, b2,
                           dp1, dp2, window=window, num_heads=num_heads,
                           ln_eps=ln_eps, interpret=interpret)


def _decomposed(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask,
                ln2s, ln2b, w1, b1, w2, b2, dp1=None, dp2=None, *, window,
                num_heads, ln_eps, interpret):
    """The block as the existing ops compose it: fused_window_attention
    (hand-written Pallas VJP) + dt residual + the XLA MLP. Used for the
    backward pass and as the interpret-mode/test oracle."""
    from lrce_tpu.ops.nn import dense, gelu, layer_norm

    b = x.shape[0]
    a = PWA.fused_window_attention(x, ln1s, ln1b, qkv_w, qkv_b, proj_w,
                                   proj_b, rel_bias, mask, window, num_heads,
                                   ln_eps, interpret)
    has_dp = dp1 is not None and dp1.shape[0] == b
    if has_dp:
        a = (a.astype(jnp.float32)
             * dp1.reshape((b,) + (1,) * (a.ndim - 1))).astype(a.dtype)
    h1 = x + a
    z = layer_norm({"scale": ln2s, "bias": ln2b}, h1, eps=ln_eps)
    z = dense({"w": w2, "b": b2}, gelu(dense({"w": w1, "b": b1}, z)))
    if has_dp:
        z = (z.astype(jnp.float32)
             * dp2.reshape((b,) + (1,) * (z.ndim - 1))).astype(z.dtype)
    return h1 + z


def _block_fwd(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask,
               ln2s, ln2b, w1, b1, w2, b2, dp1, dp2, window, num_heads,
               ln_eps, interpret):
    out = _block_fwd_impl(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b,
                          rel_bias, mask, ln2s, ln2b, w1, b1, w2, b2,
                          dp1, dp2, window=window, num_heads=num_heads,
                          ln_eps=ln_eps, interpret=interpret)
    return out, (x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask,
                 ln2s, ln2b, w1, b1, w2, b2, dp1, dp2)


# ---------------------------------------------------------------------------
# Fused MLP backward: the XLA VJP of LN2 -> fc1 -> gelu -> fc2 materializes
# the (tokens, 4C) hidden activation in HBM (462 MB per stage0 block at 48
# clips, ~2 GB across stage2's 18 blocks) — on this bandwidth-bound backend
# that IS the training bottleneck for the MLP half. This kernel recomputes
# LN2/fc1/gelu in VMEM per tile (flash-style, like the attention backward)
# and accumulates dW1/db1/dW2/db2/dLN2 across the sequential grid; FF is
# split across separate pallas_calls when one chunk's live set would exceed
# Mosaic's 16 MB default scoped-vmem budget (a raised budget faults this
# backend's TPU worker — PERF.md "Backend fault"). The LN2 *input* backward
# runs outside in one fused XLA pass over the summed per-chunk cotangents.
# ---------------------------------------------------------------------------

def _mlp_bwd_kernel(h1_ref, g_ref, ln2s_ref, ln2b_ref, w1c_ref, b1c_ref,
                    w2c_ref, dp2_ref,
                    dz_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                    ln_eps: float, has_dp: bool):
    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
             & (pl.program_id(2) == 0))

    @pl.when(first)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    h1 = h1_ref[0]
    c = h1.shape[-1]
    dt = h1.dtype
    z = PWA._ln_mxu(h1, ln2s_ref, ln2b_ref, ln_eps).reshape(-1, c)
    g2d = g_ref[0].reshape(-1, c)
    if has_dp:
        g2d = (g2d.astype(jnp.float32)
               * dp2_ref[pl.program_id(0), 0]).astype(dt)

    # recompute this FF chunk's pre-activation + exact-erf gelu in f32
    pre = jnp.dot(z, w1c_ref[:], preferred_element_type=jnp.float32)
    pre = pre + b1c_ref[:].astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_f32(pre * (1.0 / math.sqrt(2.0))))
    hid = (pre * cdf).astype(dt)

    dw2_ref[:] += jax.lax.dot_general(
        hid, g2d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(g2d.astype(jnp.float32), axis=0)

    dhid = jax.lax.dot_general(
        g2d, w2c_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # gelu'(x) = cdf(x) + x * pdf(x), pdf = exp(-x^2/2)/sqrt(2*pi)
    pdf = jnp.exp(-0.5 * pre * pre) * (1.0 / math.sqrt(2.0 * math.pi))
    dpre = dhid * (cdf + pre * pdf)
    dpre_dt = dpre.astype(dt)

    dw1_ref[:] += jax.lax.dot_general(
        z, dpre_dt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dpre, axis=0)
    dz = jax.lax.dot_general(
        dpre_dt, w1c_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz_ref[0] = dz.astype(dt).reshape(h1.shape)


def _mlp_bwd_impl(h1, g, ln2s, ln2b, w1, b1, w2, b2, dp2, *, ln_eps,
                  interpret, ff_chunks=None):
    b, d, hh, ww, c = h1.shape
    ff = w1.shape[1]
    ffc = ff_chunks if ff_chunks is not None else _pick_ff_chunks(c, h1.dtype)
    while ff % ffc:
        ffc -= 1
    fc = ff // ffc
    has_dp = dp2.shape[0] == b
    dt = h1.dtype

    # One (D, rows, W) slab per program; rows sized so the f32 preactivation
    # transient (tokens, ff/ffc) stays a few MB. No window constraint here —
    # the MLP is per-token — so D folds into the tile.
    if hh <= 14:
        rows = hh
    elif hh % 7 == 0:
        rows = 7
    else:
        rows = 1
    grid = (b, 1, hh // rows)
    tile = pl.BlockSpec((1, d, rows, ww, c),
                        lambda bi, di, hi: (bi, 0, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # full (B, 1) array in SMEM, indexed by program id (see _block_fwd_impl)
    dp_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    gc = g.astype(dt)

    dz_sum = None
    dw1_parts, db1_parts, dw2_parts = [], [], []
    db2 = None
    for ci in range(ffc):
        cols = slice(ci * fc, (ci + 1) * fc)
        kernel = functools.partial(_mlp_bwd_kernel, ln_eps=ln_eps,
                                   has_dp=has_dp)
        dz_c, dw1_c, db1_c, dw2_c, db2_c = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tile, tile, full, full, full, full, full, dp_spec],
            out_specs=[tile, full, full, full, full],
            out_shape=[
                jax.ShapeDtypeStruct(h1.shape, dt),
                jax.ShapeDtypeStruct((c, fc), jnp.float32),
                jax.ShapeDtypeStruct((fc,), jnp.float32),
                jax.ShapeDtypeStruct((fc, c), jnp.float32),
                jax.ShapeDtypeStruct((c,), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * h1.size // c * c * fc * 4,
                bytes_accessed=h1.size * 6,
                transcendentals=h1.size // c * fc),
            interpret=interpret,
        )(h1, gc, ln2s, ln2b, w1[:, cols].astype(dt), b1[cols],
          w2[cols, :].astype(dt), dp2)
        dz_sum = (dz_c.astype(jnp.float32) if dz_sum is None
                  else dz_sum + dz_c.astype(jnp.float32))
        dw1_parts.append(dw1_c)
        db1_parts.append(db1_c)
        dw2_parts.append(dw2_c)
        db2 = db2_c if db2 is None else db2  # identical across chunks

    dw1 = jnp.concatenate(dw1_parts, axis=1)
    db1 = jnp.concatenate(db1_parts)
    dw2 = jnp.concatenate(dw2_parts, axis=0)

    # ---- LN2 input backward, one fused XLA pass ----
    xf = h1.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + ln_eps)
    xn = (xf - mean) * inv
    dls = jnp.sum(dz_sum * xn, axis=(0, 1, 2, 3))
    dlb = jnp.sum(dz_sum, axis=(0, 1, 2, 3))
    dxn = dz_sum * ln2s.astype(jnp.float32)
    dh1_ln = inv * (dxn - jnp.mean(dxn, axis=-1, keepdims=True)
                    - xn * jnp.mean(dxn * xn, axis=-1, keepdims=True))
    return (dh1_ln, dls.astype(ln2s.dtype), dlb.astype(ln2b.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


def _block_bwd(window, num_heads, ln_eps, interpret, res, g):
    (x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask,
     ln2s, ln2b, w1, b1, w2, b2, dp1, dp2) = res
    b = x.shape[0]
    has_dp = dp1.shape[0] == b

    # attention sub-block as a VJP-able function: h1 = x + k1 * attn(x)
    # (fused_window_attention keeps its hand-written Pallas backward)
    def attn_half(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias,
                  mask):
        a = PWA.fused_window_attention(x, ln1s, ln1b, qkv_w, qkv_b, proj_w,
                                       proj_b, rel_bias, mask, window,
                                       num_heads, ln_eps, interpret)
        if has_dp:
            a = (a.astype(jnp.float32)
                 * dp1.reshape((b,) + (1,) * (a.ndim - 1))).astype(a.dtype)
        return x + a

    h1, attn_vjp = jax.vjp(attn_half, x, ln1s, ln1b, qkv_w, qkv_b, proj_w,
                           proj_b, rel_bias, mask)

    # MLP half backward (fused kernel): out = h1 + k2 * mlp(LN2(h1))
    dh1_ln, dls, dlb, dw1, db1, dw2, db2 = _mlp_bwd_impl(
        h1, g, ln2s, ln2b, w1, b1, w2, b2, dp2, ln_eps=ln_eps,
        interpret=interpret)
    dh1 = (g.astype(jnp.float32) + dh1_ln).astype(h1.dtype)

    dx, dln1s, dln1b, dqkv_w, dqkv_b, dproj_w, dproj_b, drel, dmask = (
        attn_vjp(dh1))
    return (dx, dln1s, dln1b, dqkv_w, dqkv_b, dproj_w, dproj_b, drel, dmask,
            dls, dlb, dw1, db1, dw2, db2,
            jnp.zeros_like(dp1), jnp.zeros_like(dp2))


fused_swin_block.defvjp(_block_fwd, _block_bwd)


# ---------------------------------------------------------------------------
# Standalone LN2 + MLP + residual for stage3 (C=1024). The whole-block
# kernel is gated to C<=512 because both sub-blocks' weights cannot co-reside
# in VMEM. fused_ln_mlp runs the PRIMAL as plain XLA (measured faster than
# the Pallas forward at stage3 geometry — see its docstring) and the
# BACKWARD through the fused flash-style MLP kernel (_mlp_bwd_impl), which
# recomputes the hidden per FF chunk instead of materializing (tokens, 4C)
# in HBM — closing the last XLA-VJP remnant in the train backbone (the
# stage3 MLP; reference video_swin_ori.py:158-189,298-306). The Pallas
# forward below (_ln_mlp_fwd_impl: FF-blocked weight slabs, f32 VMEM
# accumulator, batch-blocked sample tiles) is kept as a tested building
# block for geometries where it may win.
# ---------------------------------------------------------------------------

def _ln_mlp_kernel(h1_ref, ln2s_ref, ln2b_ref, w1c_ref, b1c_ref, w2c_ref,
                   b2_ref, dp2_ref, out_ref, acc_ref, *, ln_eps: float,
                   ff_chunks: int, has_dp: bool, bb: int):
    fi = pl.program_id(2)
    # program_id must be read OUTSIDE pl.when bodies: interpret mode lowers
    # when-branches as plain lax.cond, where program_id has no CPU rule.
    if has_dp:
        bi = pl.program_id(0)
        dpv = [dp2_ref[bi * bb + j, 0] for j in range(bb)]
    h1 = h1_ref[:]                     # (bb, d, rows, ww, c)
    c = h1.shape[-1]
    dt = h1.dtype

    @pl.when(fi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    z = _ln_f32(h1, ln2s_ref, ln2b_ref, ln_eps).reshape(-1, c)
    pre = jnp.dot(z, w1c_ref[:], preferred_element_type=jnp.float32)
    pre = pre + b1c_ref[0, 0].astype(jnp.float32)
    pre = pre * 0.5 * (1.0 + _erf_f32(pre * (1.0 / math.sqrt(2.0))))
    acc_ref[:] += jnp.dot(pre.astype(dt), w2c_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(fi == ff_chunks - 1)
    def _():
        total = acc_ref[:] + b2_ref[:].astype(jnp.float32)
        if has_dp:
            per = total.reshape(bb, -1, c)
            total = jnp.stack([per[j] * dpv[j] for j in range(bb)])
            total = total.reshape(-1, c)
        out = h1.reshape(-1, c).astype(jnp.float32) + total   # f32 residual,
        out_ref[:] = out.astype(dt).reshape(h1.shape)         # like _block_kernel


def _pick_bb(b: int, tok_per_sample: int, c: int, fc: int, itemsize) -> int:
    """Samples per program: at stage3 geometry one sample is only 3*7*7=147
    tokens — far too few MXU rows — so block several samples into one
    program's GEMMs, bounded so in/out blocks (double-buffered), the f32
    accumulator scratch and the double-buffered weight slabs stay well
    under the 16 MB scoped-vmem budget."""
    budget = 13 * 2 ** 20
    for bb in (8, 4, 2, 1):
        if b % bb:
            continue
        tok = bb * tok_per_sample
        est = (2 * 2 * tok * c * itemsize          # in+out, double-buffered
               + tok * c * 4                       # f32 acc scratch
               + 2 * 2 * c * fc * itemsize         # w1c+w2c, double-buffered
               + tok * c * 4                       # f32 LN output z
               + 2 * tok * fc * 4)                 # f32 pre + gelu transient
        if est <= budget:
            return bb
    return 1


def _ln_mlp_fwd_impl(h1, ln2s, ln2b, w1, b1, w2, b2, dp2, *, ln_eps,
                     interpret, ff_chunks=None):
    b, d, hh, ww, c = h1.shape
    ff = w1.shape[1]
    ffc = ff_chunks if ff_chunks is not None else _pick_ff_chunks(c, h1.dtype)
    while ff % ffc:
        ffc -= 1
    fc = ff // ffc
    has_dp = dp2.shape[0] == b
    rows = hh if hh <= 14 else (7 if hh % 7 == 0 else 1)
    itemsize = jnp.dtype(h1.dtype).itemsize
    bb = (_pick_bb(b, d * rows * ww, c, fc, itemsize)
          if rows == hh else 1)
    grid = (b // bb, hh // rows, ffc)
    tokens = bb * d * rows * ww
    dt = h1.dtype

    tile = pl.BlockSpec((bb, d, rows, ww, c),
                        lambda bi, hi, fi: (bi, 0, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((c, fc), lambda bi, hi, fi: (0, fi),
                           memory_space=pltpu.VMEM)
    # b1 rides as (ffc, 1, fc) so the BLOCKED last-two dims (1, fc) equal
    # the array's — a (1, fc) block over (ffc, fc) violates Mosaic's
    # (8, 128) divisibility rule on real TPUs (interpret mode doesn't check)
    b1_spec = pl.BlockSpec((1, 1, fc), lambda bi, hi, fi: (fi, 0, 0),
                           memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((fc, c), lambda bi, hi, fi: (fi, 0),
                           memory_space=pltpu.VMEM)
    dp_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(_ln_mlp_kernel, ln_eps=ln_eps, ff_chunks=ffc,
                               has_dp=has_dp, bb=bb)
    ntok = b * d * hh * ww
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile, full, full, w1_spec, b1_spec, w2_spec, full, dp_spec],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(h1.shape, dt),
        scratch_shapes=[pltpu.VMEM((tokens, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * ntok * c * ff * 2,
            bytes_accessed=h1.size * 4 + (w1.size + w2.size) * b,
            transcendentals=ntok * ff),
        interpret=interpret,
    )(h1, ln2s, ln2b, w1.astype(dt), b1.reshape(ffc, 1, fc), w2.astype(dt),
      b2, dp2)


def _ln_mlp_xla_fwd(h1, ln2s, ln2b, w1, b1, w2, b2, dp2, ln_eps):
    """The primal LN2+MLP+residual as plain XLA ops (same math as the
    decomposed swin_block path: f32 LN, exact-erf gelu, f32-accumulated
    matmuls)."""
    from lrce_tpu.ops.nn import dense, gelu, layer_norm

    z = layer_norm({"scale": ln2s, "bias": ln2b}, h1, eps=ln_eps)
    z = dense({"w": w2, "b": b2}, gelu(dense({"w": w1, "b": b1}, z)))
    if dp2.shape[0] == h1.shape[0]:
        z = (z.astype(jnp.float32)
             * dp2.reshape((h1.shape[0],) + (1,) * (z.ndim - 1))).astype(
                 z.dtype)
    return h1 + z


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_ln_mlp(h1, ln2s, ln2b, w1, b1, w2, b2, dp2, ln_eps=1e-5,
                 interpret=False):
    """out = h1 + dp2 * (fc2(gelu(fc1(LN2(h1)))) ) on (B, D, H, W, C).

    dp2: per-sample stochastic-depth multipliers (B, 1) f32, or a (1, 1)
    ones sentinel when drop_path is inactive (same convention as
    fused_swin_block). Weights pre-cast to the activation dtype by the
    caller.

    The PRIMAL runs plain XLA (one large fused GEMM pair beats the
    Pallas forward at stage3's 147-token-per-sample geometry — measured
    618.9 vs 612.9 clips/s on-chip, PERF.md round 5); the BACKWARD runs
    the fused flash-style MLP kernel (_mlp_bwd_impl), which never
    materializes the (tokens, 4C) hidden in HBM — the same split the
    stage3 attention (hsplit) uses. The Pallas forward (_ln_mlp_fwd_impl)
    remains as a tested building block."""
    return _ln_mlp_xla_fwd(h1, ln2s, ln2b, w1, b1, w2, b2, dp2, ln_eps)


def _ln_mlp_fwd(h1, ln2s, ln2b, w1, b1, w2, b2, dp2, ln_eps, interpret):
    out = _ln_mlp_xla_fwd(h1, ln2s, ln2b, w1, b1, w2, b2, dp2, ln_eps)
    return out, (h1, ln2s, ln2b, w1, b1, w2, b2, dp2)


def _ln_mlp_bwd(ln_eps, interpret, res, g):
    h1, ln2s, ln2b, w1, b1, w2, b2, dp2 = res
    dh1_ln, dls, dlb, dw1, db1, dw2, db2 = _mlp_bwd_impl(
        h1, g, ln2s, ln2b, w1, b1, w2, b2, dp2, ln_eps=ln_eps,
        interpret=interpret)
    dh1 = (g.astype(jnp.float32) + dh1_ln).astype(h1.dtype)
    return (dh1, dls, dlb, dw1, db1, dw2, db2, jnp.zeros_like(dp2))


fused_ln_mlp.defvjp(_ln_mlp_fwd, _ln_mlp_bwd)
