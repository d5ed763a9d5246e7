"""Pallas full-spatial Swin kernel: whole (W-MSA, SW-MSA) block pairs — or a
single shifted block — in ONE VMEM-resident program, cyclic shift included.

Why: the whole-block kernel (ops/pallas_swin_block.py) already collapses one
block to a single HBM read+write, but the SHIFTED half of every pair still
pays two extra full-tensor HBM passes each way for the XLA `jnp.roll`
before/after the kernel (roll cannot fuse into an opaque custom call), and
the pair pays one more write+read for the intermediate activation between
its two blocks. On this bandwidth-bound backend (PERF.md "Bandwidth",
~110-230 GB/s) those passes are pure loss: per (W, SW) pair the decomposed
schedule moves the activation through HBM 8 times; this kernel moves it
twice (pair mode) or 4 times (single-shifted mode for stages whose two
blocks' weights exceed one program's VMEM).

The trick is the grid: one program per CLIP holding the full (D, H, W, C)
spatial extent in VMEM — tiny for Swin-B video geometry (0.6-2.3 MB/clip) —
so the cyclic shift is an in-register `jnp.roll` and windows never cross a
program boundary. Attention and the MLP iterate over window-row groups
inside the kernel (static Python loops) to bound the f32 transients.

Backward differentiates the decomposed composition (roll + fused_swin_block
semantics), so training reuses the existing hand-written Pallas VJPs.

Reference behavior being fused: consecutive SwinTransformerBlock3D calls
with alternating shift (reference lrce/feature_extractor/video_swin_ori.py:
248-306 and the BasicLayer loop at 343-376).
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
from lrce_tpu.ops import pallas_swin_block as PSB

_ln_f32 = PWA._ln_mxu


def _roll3(x: jnp.ndarray, s: Tuple[int, int, int]) -> jnp.ndarray:
    """Cyclic shift of the (D, H, W) axes of a (D, H, W, C) VMEM tensor."""
    if s[0]:
        x = jnp.roll(x, s[0], axis=0)
    if s[1]:
        x = jnp.roll(x, s[1], axis=1)
    if s[2]:
        x = jnp.roll(x, s[2], axis=2)
    return x


def _group_mask(mask_ref, compact, di, hi, kh_rows, nh, nw, n):
    """The (kh_rows*nw, N, N) f32 additive mask for one window-row group.

    compact: mask_ref is the 4-pattern (2, 2, N, N) form — rows/cols below
    the last are identical (cyclic shift < window wraps only the last
    window per axis), so the full (nd, nh, nw, N, N) tensor never has to
    sit in VMEM (2.77 MB at flagship stage0 vs 173 KB compact)."""
    if not compact:
        m = mask_ref[di, hi * kh_rows:(hi + 1) * kh_rows]
        return m.reshape(kh_rows * nw, n, n).astype(jnp.float32)
    rows = []
    for r in range(kh_rows):
        ridx = 1 if (hi * kh_rows + r == nh - 1) else 0
        mi = mask_ref[ridx, 0].astype(jnp.float32)
        ml = mask_ref[ridx, 1].astype(jnp.float32)
        row = (jnp.concatenate(
            [jnp.broadcast_to(mi[None], (nw - 1, n, n)), ml[None]])
            if nw > 1 else ml[None])
        rows.append(row)
    return rows[0] if kh_rows == 1 else jnp.concatenate(rows)


def _one_block(x, blk, ln1s_ref, ln1b_ref, qkvw_ref, qkvb_ref, projw_ref,
               projb_ref, bias_ref, mask_ref, ln2s_ref, ln2b_ref, w1_ref,
               b1_ref, w2_ref, b2_ref, dp1_ref, dp2_ref, *, window, num_heads,
               ln_eps, masked, kh_rows, ff_chunks, win_chunk, compact_mask,
               has_dp):
    """One whole Swin block on the full-spatial (D, H, W, C) tensor, already
    in rolled coordinates. Same math as pallas_swin_block._block_kernel, with
    the window-row grid dimension turned into an in-kernel loop.

    win_chunk: windows per attention inner step (divides kh_rows*nw; the
    qkv / logits / softmax f32 transients scale with it — the VMEM lever
    for wide spatial grids like stage0's 8x8 windows)."""
    d, hh, wwid, c = x.shape
    wd, wh, ww = window
    nd, nh, nw = d // wd, hh // wh, wwid // ww
    n = wd * wh * ww
    dt = x.dtype
    scale = 1.0 / math.sqrt(c // num_heads)
    nwin_g = kh_rows * nw
    wc = nwin_g if win_chunk is None else win_chunk

    # ---- LN1 + window attention + proj + residual, per window-row group ----
    h1_d = []
    for di in range(nd):
        h1_rows = []
        for hi in range(nh // kh_rows):
            tile = x[di * wd:(di + 1) * wd,
                     hi * kh_rows * wh:(hi + 1) * kh_rows * wh]
            y = _ln_f32(tile, ln1s_ref[blk], ln1b_ref[blk], ln_eps)
            y = y.reshape(wd, kh_rows, wh, nw, ww, c)
            y = y.transpose(1, 3, 0, 2, 4, 5).reshape(nwin_g, n, c)
            m = (_group_mask(mask_ref, compact_mask, di, hi, kh_rows, nh,
                             nw, n) if masked else None)
            ctx_parts = []
            for w0 in range(0, nwin_g, wc):
                yc = y[w0:w0 + wc]
                qkv = jnp.dot(yc.reshape(wc * n, c),
                              qkvw_ref[blk].astype(dt),
                              preferred_element_type=jnp.float32)
                qkv = (qkv + qkvb_ref[blk].astype(jnp.float32)).astype(dt)
                qkv = qkv.reshape(wc, n, 3 * c)
                mc = m[w0:w0 + wc] if masked else None
                ctx_parts.append(PWA._attn_ctx(qkv, bias_ref[blk], mc,
                                               num_heads, c, scale, dt))
            ctx = (ctx_parts[0] if len(ctx_parts) == 1
                   else jnp.concatenate(ctx_parts))
            a = jnp.dot(ctx.reshape(nwin_g * n, c), projw_ref[blk].astype(dt),
                        preferred_element_type=jnp.float32)
            a = a + projb_ref[blk].astype(jnp.float32)
            if has_dp:
                a = a * dp1_ref[blk, pl.program_id(0)]
            a = a.astype(dt)
            a = a.reshape(kh_rows, nw, wd, wh, ww, c)
            a = a.transpose(2, 0, 3, 1, 4, 5).reshape(tile.shape)
            h1_rows.append(tile + a)
        h1_d.append(h1_rows[0] if len(h1_rows) == 1
                    else jnp.concatenate(h1_rows, axis=1))
    h1 = h1_d[0] if nd == 1 else jnp.concatenate(h1_d, axis=0)

    # ---- LN2 + MLP + residual, same row grouping ----
    ff = w1_ref.shape[2]
    fc = ff // ff_chunks
    rows = kh_rows * wh
    out_rows = []
    for hi in range(hh // rows):
        t = h1[:, hi * rows:(hi + 1) * rows]
        z = _ln_f32(t, ln2s_ref[blk], ln2b_ref[blk], ln_eps).reshape(-1, c)
        acc = None
        for i in range(ff_chunks):
            hmid = jnp.dot(z, w1_ref[blk, :, i * fc:(i + 1) * fc],
                           preferred_element_type=jnp.float32)
            hmid = hmid + b1_ref[blk, i * fc:(i + 1) * fc].astype(jnp.float32)
            hmid = hmid * 0.5 * (1.0 + _erf_f32(hmid * (1.0 / math.sqrt(2.0))))
            part = jnp.dot(hmid.astype(dt), w2_ref[blk, i * fc:(i + 1) * fc],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        acc = acc + b2_ref[blk].astype(jnp.float32)
        if has_dp:
            acc = acc * dp2_ref[blk, pl.program_id(0)]
        out_rows.append((t.reshape(-1, c).astype(jnp.float32)
                         + acc).astype(dt).reshape(t.shape))
    return (out_rows[0] if len(out_rows) == 1
            else jnp.concatenate(out_rows, axis=1))


def _pair_kernel(x_ref, ln1s_ref, ln1b_ref, qkvw_ref, qkvb_ref, projw_ref,
                 projb_ref, bias_ref, mask_ref, ln2s_ref, ln2b_ref, w1_ref,
                 b1_ref, w2_ref, b2_ref, dp1_ref, dp2_ref, out_ref, *,
                 window, num_heads, ln_eps, shifts, kh_rows, ff_chunks,
                 win_chunk, compact_mask, has_mask, has_dp):
    x = x_ref[0]
    for blk, s in enumerate(shifts):
        shifted = any(v != 0 for v in s)
        if shifted:
            x = _roll3(x, (-s[0], -s[1], -s[2]))
        x = _one_block(x, blk, ln1s_ref, ln1b_ref, qkvw_ref, qkvb_ref,
                       projw_ref, projb_ref, bias_ref, mask_ref, ln2s_ref,
                       ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, dp1_ref,
                       dp2_ref, window=window, num_heads=num_heads,
                       ln_eps=ln_eps, masked=shifted and has_mask,
                       kh_rows=kh_rows, ff_chunks=ff_chunks,
                       win_chunk=win_chunk, compact_mask=compact_mask,
                       has_dp=has_dp)
        if shifted:
            x = _roll3(x, s)
    out_ref[0] = x


# Geometries PROVEN to compile under Mosaic's 16 MB default scoped-vmem
# budget on a REAL TPU (v5e), via `python tools/probe_pair_vmem.py` — a
# compile + run + timing probe of the isolated kernel at the exact
# geometry. Keyed (C, D, H, W, k_blocks, itemsize) -> (kh_rows, ff_chunks).
# Routing (models/swin3d._pair_mode) only sends a geometry through this
# kernel when its signature is listed here: scoped-vmem demand is decided
# by Mosaic's backend compile, which no CPU/interpret test or AOT export
# performs, so an analytic estimate cannot be trusted (round 4 shipped one
# that was wrong at BOTH flagship stages: stage0 overflowed by 4.58 MB and
# stage1 by 572 KB, aborting the whole program — BENCH_r04 rc=1). Unlisted
# geometries run the decomposed whole-block path instead of risking an
# uncompilable program.
PROVEN_TILINGS = {
    # stage2 shifted_only, bf16 flagship (C=512, 14x14, 2x2 windows of
    # N=147): kh=2/ffc=2 compiles and beats roll + whole-block by 7-9%
    # (interleaved on v5e 2026-08-20: 5.25 vs 5.68 ms per 96-clip shifted
    # block, 3 rounds) — the stage with 9 shifted blocks, so the roll
    # deletion pays 9x per forward.
    (512, 3, 14, 14, 1, 2): (2, 2),
    # Stage1 pair (C=256, 28x28) kh=1 DOES compile (17.57 ms/96-clip pair)
    # but LOSES ~1% to the decomposed whole-block path (17.38 ms,
    # interleaved, 3 rounds) — the four deleted roll passes are cheaper at
    # this size than the serialized per-clip program's lost pipelining, so
    # it is deliberately NOT proven-in (kh=2, the round-4 default, overflows
    # the budget by 572 KB and must never return).
    # Stage0 (C=128, 56x56) kh=1 full-mask overflows by 4.58 MB (BENCH_r04).
}


def proven_tiling(c: int, d: int, h: int, w: int, k: int,
                  dtype) -> Tuple[int, int] | None:
    """The on-chip-proven (kh_rows, ff_chunks) for this exact geometry, or
    None when the geometry has never been proven to compile (the routing
    layer then falls back to the whole-block kernel path)."""
    return PROVEN_TILINGS.get((c, d, h, w, k, jnp.dtype(dtype).itemsize))


def _pick_tiling(c: int, nh: int, nw: int, dtype) -> Tuple[int, int]:
    """Heuristic (kh_rows, ff_chunks) for interpret-mode runs and forced
    experiments only — real-TPU routing uses PROVEN_TILINGS above. Keeps
    the per-program f32 transients a few MB: per-head attention logits are
    (kh*nw, N, N) f32 and the gelu transient is (kh*wh*W tokens, 4C/ffc)
    f32."""
    f32 = jnp.dtype(dtype).itemsize > 2
    if c >= 512:
        if nh % 2 == 0 and not f32:
            return 2, 2
        return 1, (8 if f32 else 4)
    if c >= 256:
        return 1, (4 if f32 else 1)
    return 1, (2 if f32 else 1)


def _pair_fwd_impl(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias,
                   mask, ln2s, ln2b, w1, b1, w2, b2, dp1, dp2, *, window,
                   num_heads, ln_eps, shifts, has_dp, interpret,
                   kh_rows=None, ff_chunks=None, win_chunk=None,
                   alias_io=False):
    b, d, h, w_, c = x.shape
    wd, wh, ww = window
    nd, nh, nw = d // wd, h // wh, w_ // ww
    n = wd * wh * ww
    proven = None if interpret else proven_tiling(c, d, h, w_, len(shifts),
                                                  x.dtype)
    if proven is not None:
        kh, ffc = proven[0], proven[1]
        wcp = proven[2] if len(proven) > 2 else None
        aliasp = proven[3] if len(proven) > 3 else False
    else:
        kh, ffc = _pick_tiling(c, nh, nw, x.dtype)
        wcp, aliasp = None, False
    if kh_rows is not None:
        kh = kh_rows
    if ff_chunks is not None:
        ffc = ff_chunks
    wc = win_chunk if win_chunk is not None else wcp
    alias_io = alias_io or aliasp
    if nh % kh:
        kh = 1
    if wc is not None and (kh * nw) % wc:
        wc = None
    ff = w1.shape[2]
    while ff % ffc:
        ffc -= 1

    # mask forms: (nd, nh, nw, N, N) full; (2, 2, N, N) compact (interior/
    # last patterns per axis — see _group_mask); (1,)*5 sentinel = no mask
    compact = mask.ndim == 4 and mask.shape[:2] == (2, 2)
    has_mask = compact or (mask.ndim == 5 and mask.shape[-1] == n)
    if has_mask and x.dtype == jnp.bfloat16:
        mask = mask.astype(jnp.bfloat16)
    kernel = functools.partial(
        _pair_kernel, window=window, num_heads=num_heads, ln_eps=ln_eps,
        shifts=shifts, kh_rows=kh, ff_chunks=ffc, win_chunk=wc,
        compact_mask=compact, has_mask=has_mask, has_dp=has_dp)

    k = len(shifts)
    tokens = b * d * h * w_
    flops = k * (2 * tokens * c * 4 * c + 2 * tokens * 2 * n * c
                 + 2 * tokens * c * ff * 2)
    block = pl.BlockSpec((1, d, h, w_, c), lambda bi: (bi, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # dp multipliers: FULL (k, B) array in SMEM indexed by (blk, program id)
    # — same Mosaic (8, 128) divisibility exemption as pallas_swin_block
    dp_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=([block] + [full] * 14 + [dp_spec, dp_spec]),
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        # alias_io: the out block shares the in block's HBM buffer (and its
        # VMEM staging) — x is donated, XLA copies it first iff a consumer
        # (e.g. a saved residual) still needs it
        input_output_aliases=({0: 0} if alias_io else {}),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 4,
            transcendentals=k * (b * nd * nh * nw * n * n + tokens * ff)),
        # f32 runs (parity/oracle, small batch) need headroom for the doubled
        # live set; bf16 stays under the 16 MB default (a raised budget on
        # large-grid bf16 programs faults this backend's TPU worker, PERF.md)
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)
                         if not interpret and x.dtype == jnp.float32
                         else None),
        interpret=interpret,
    )(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask,
      ln2s, ln2b, w1, b1, w2, b2, dp1, dp2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19, 20, 21, 22))
def fused_swin_pair(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias,
                    mask, ln2s, ln2b, w1, b1, w2, b2, dp1, dp2, window,
                    num_heads, shifts, ln_eps=1e-5, interpret=False,
                    has_dp=False):
    """k consecutive whole Swin blocks (k = 1 or 2) on an UNROLLED,
    window-aligned (B, D, H, W, C) tensor, cyclic shifts done in VMEM.

    Weights arrive stacked on a leading block axis: ln1s (k, C), qkv_w
    (k, C, 3C), ..., rel_bias (k, nH, N, N) f32. mask: (nd, nh, nw, N, N)
    additive for the shifted block(s), or a (1,)*5 sentinel when no block
    shifts. dp1/dp2: (k, B) f32 per-sample stochastic-depth multipliers or a
    (1, 1) ones sentinel. shifts: static per-block shift tuples — (0,0,0)
    for W-MSA, the stage shift for SW-MSA.
    """
    return _pair_fwd_impl(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b,
                          rel_bias, mask, ln2s, ln2b, w1, b1, w2, b2, dp1,
                          dp2, window=window, num_heads=num_heads,
                          ln_eps=ln_eps, shifts=shifts, has_dp=has_dp,
                          interpret=interpret)


def compact_shift_mask_np(mask5) -> "np.ndarray | None":
    """Compress a full (nd, nh, nw, N, N) shift mask to the 4-pattern
    (2, 2, N, N) form consumed by _group_mask, or None when the geometry
    doesn't qualify (nd > 1, fewer than 2 windows per axis, or — never for
    a true cyclic-shift mask — interior windows that differ). Host-side
    numpy: call where the mask is still concrete (models/swin3d builds it
    from compute_shift_mask before tracing)."""
    import numpy as np

    m = np.asarray(mask5)
    nd, nh, nw = m.shape[:3]
    if nd != 1 or nh < 2 or nw < 2:
        return None
    if not (np.array_equal(
                m[0, :nh - 1, :nw - 1],
                np.broadcast_to(m[0, 0, 0], m[0, :nh - 1, :nw - 1].shape))
            and np.array_equal(
                m[0, :nh - 1, nw - 1],
                np.broadcast_to(m[0, 0, nw - 1],
                                m[0, :nh - 1, nw - 1].shape))
            and np.array_equal(
                m[0, nh - 1, :nw - 1],
                np.broadcast_to(m[0, nh - 1, 0],
                                m[0, nh - 1, :nw - 1].shape))):
        return None
    return np.stack([np.stack([m[0, 0, 0], m[0, 0, nw - 1]]),
                     np.stack([m[0, nh - 1, 0], m[0, nh - 1, nw - 1]])])


def _expand_compact_mask(mask, nh: int, nw: int):
    """(2, 2, N, N) compact -> (1, nh, nw, N, N) full (traced jnp ops; used
    by the decomposed backward/oracle path)."""
    n = mask.shape[-1]
    rows = []
    for hi in range(nh):
        r = 1 if hi == nh - 1 else 0
        row = (jnp.concatenate([jnp.broadcast_to(mask[r, 0][None],
                                                 (nw - 1, n, n)),
                                mask[r, 1][None]])
               if nw > 1 else mask[r, 1][None])
        rows.append(row)
    return jnp.stack(rows)[None]


def _decomposed(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask,
                ln2s, ln2b, w1, b1, w2, b2, dp1, dp2, *, window, num_heads,
                ln_eps, shifts, has_dp, interpret):
    """The pair as the existing ops compose it: roll + fused_swin_block's
    decomposed form per block. Backward path and interpret/test oracle."""
    b = x.shape[0]
    if mask.ndim == 4 and mask.shape[:2] == (2, 2):
        nh = x.shape[2] // window[1]
        nw = x.shape[3] // window[2]
        mask = _expand_compact_mask(mask, nh, nw)
    for blk, s in enumerate(shifts):
        shifted = any(v != 0 for v in s)
        if shifted:
            x = jnp.roll(x, (-s[0], -s[1], -s[2]), axis=(1, 2, 3))
        d1 = dp1[blk].reshape(b, 1) if has_dp else None
        d2 = dp2[blk].reshape(b, 1) if has_dp else None
        x = PSB._decomposed(
            x, ln1s[blk], ln1b[blk], qkv_w[blk], qkv_b[blk], proj_w[blk],
            proj_b[blk], rel_bias[blk],
            mask if (shifted and mask.ndim == 5) else jnp.zeros(
                (1, 1, 1, 1, 1), jnp.float32),
            ln2s[blk], ln2b[blk], w1[blk], b1[blk], w2[blk], b2[blk],
            d1, d2, window=window, num_heads=num_heads, ln_eps=ln_eps,
            interpret=interpret)
        if shifted:
            x = jnp.roll(x, s, axis=(1, 2, 3))
    return x


def _pair_fwd(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask,
              ln2s, ln2b, w1, b1, w2, b2, dp1, dp2, window, num_heads, shifts,
              ln_eps, interpret, has_dp):
    out = _pair_fwd_impl(x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b,
                         rel_bias, mask, ln2s, ln2b, w1, b1, w2, b2, dp1, dp2,
                         window=window, num_heads=num_heads, ln_eps=ln_eps,
                         shifts=shifts, has_dp=has_dp, interpret=interpret)
    return out, (x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, rel_bias, mask,
                 ln2s, ln2b, w1, b1, w2, b2, dp1, dp2)


def _pair_bwd(window, num_heads, shifts, ln_eps, interpret, has_dp, res, g):
    def f(*args):
        return _decomposed(*args, window=window, num_heads=num_heads,
                           ln_eps=ln_eps, shifts=shifts, has_dp=has_dp,
                           interpret=interpret)

    _, vjp = jax.vjp(f, *res)
    return vjp(g)


fused_swin_pair.defvjp(_pair_fwd, _pair_bwd)
