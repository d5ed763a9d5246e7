"""Video Swin Transformer 3D (Swin-B), functional JAX — TPU-first.

Capability-parity re-design of the reference backbone (reference
lrce/feature_extractor/video_swin_ori.py:485-692, itself the public
Video-Swin-Transformer architecture): patch_embed Conv3d(2,4,4) -> 4 stages
of shifted-window attention blocks with relative position bias ->
PatchMerging between stages -> final LayerNorm.

TPU-first choices:
  - channels-last (B, D, H, W, C) everywhere — XLA's native conv layout,
    and window partitioning becomes pure reshape/transpose;
  - blocks within a stage are stacked pytrees folded by `lax.scan` over
    (unshifted, shifted) block *pairs*, so shift amounts and attention masks
    stay static — no data-dependent control flow under jit;
  - the shifted-window attention mask is precomputed in numpy at trace time
    (static shapes), matching the reference's compute_mask slicing
    (video_swin_ori.py:346-359);
  - qkv is a single packed (C, 3C) matmul; all matmuls accumulate in f32.

Numerics: LayerNorm eps 1e-5 (torch default), exact GELU, softmax in f32.
The per-window relative-position index is computed for the constructor
window (8,7,7) and sliced [:N,:N] for clamped windows, exactly like the
reference (video_swin_ori.py:171-172).
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from lrce_tpu.ops.nn import dense, dense_init, gelu, layer_norm, layer_norm_init

LN_EPS = 1e-5


class SwinConfig(NamedTuple):
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    in_chans: int = 3
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    # rematerialize each block pair under autodiff (jax.checkpoint) — trades
    # recompute for activation memory at large training batches; the
    # reference's use_checkpoint analogue (video_swin_ori.py:295-303)
    remat: bool = False
    # run the fused Pallas kernels in interpret mode even off-TPU: the
    # kernels execute as compiled XLA programs on CPU, so the multi-chip
    # dryrun / tests can exercise the production composition (Pallas x
    # sharded mesh) without 8 physical chips
    pallas_interpret: bool = False
    # select the real (Mosaic) kernels even when the current backend is not
    # TPU — for AOT lowering/export tests that serialize the TPU program on
    # a CPU host (the Mosaic MLIR is backend-independent at trace time)
    pallas_force: bool = False


SWIN_BASE = SwinConfig()


def get_window_size(x_size: Sequence[int], window_size: Sequence[int],
                    shift_size: Optional[Sequence[int]] = None):
    """Clamp window (and zero the shift) on axes where the input is smaller
    than the window — static-shape logic, resolved at trace time
    (semantics of reference video_swin_ori.py:91-104)."""
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_window[i] = x_size[i]
            if use_shift is not None:
                use_shift[i] = 0
    if use_shift is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


@functools.lru_cache(maxsize=None)
def relative_position_index(full_window: Tuple[int, int, int]) -> np.ndarray:
    """Pairwise relative-position index over the *constructor* window; clamped
    windows slice the top-left (N, N) block."""
    wd, wh, ww = full_window
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # (3, wd, wh, ww)
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (3, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)  # (N, N)


@functools.lru_cache(maxsize=None)
def compute_shift_mask(dims: Tuple[int, int, int],
                       window: Tuple[int, int, int],
                       shift: Tuple[int, int, int]) -> np.ndarray:
    """Additive (nW, N, N) mask (0 / -100) for shifted windows; same region
    labeling as the reference (video_swin_ori.py:346-359)."""
    dp, hp, wp = dims
    img = np.zeros((dp, hp, wp), np.int32)
    cnt = 0
    for d in (slice(-window[0]), slice(-window[0], -shift[0] or None),
              slice(-shift[0] or dp, None)):
        for h in (slice(-window[1]), slice(-window[1], -shift[1] or None),
                  slice(-shift[1] or hp, None)):
            for w in (slice(-window[2]), slice(-window[2], -shift[2] or None),
                      slice(-shift[2] or wp, None)):
                img[d, h, w] = cnt
                cnt += 1
    # partition into windows
    nd, nh, nw = dp // window[0], hp // window[1], wp // window[2]
    win = img.reshape(nd, window[0], nh, window[1], nw, window[2])
    win = win.transpose(0, 2, 4, 1, 3, 5).reshape(-1, int(np.prod(window)))
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B*nW, N, C) — pure reshape/transpose."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // window[0], window[0], h // window[1], window[1],
                  w // window[2], window[2], c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, window[0] * window[1] * window[2], c)


def window_reverse(windows: jnp.ndarray, window: Tuple[int, int, int],
                   b: int, d: int, h: int, w: int) -> jnp.ndarray:
    c = windows.shape[-1]
    x = windows.reshape(b, d // window[0], h // window[1], w // window[2],
                        window[0], window[1], window[2], c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, c)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def _trunc_dense(rng, i, o, dtype, bias=True):
    p = dense_init(rng, i, o, dtype, init="trunc_normal")
    if not bias:
        del p["b"]
    return p


def swin_block_init(rng, dim: int, num_heads: int, mlp_ratio: float,
                    window: Tuple[int, int, int], qkv_bias: bool,
                    dtype=jnp.float32) -> dict:
    ks = jax.random.split(rng, 4)
    table_len = (2 * window[0] - 1) * (2 * window[1] - 1) * (2 * window[2] - 1)
    qkv = _trunc_dense(ks[0], dim, 3 * dim, dtype)
    if not qkv_bias:
        qkv["b"] = jnp.zeros((3 * dim,), dtype)
    return {
        "norm1": layer_norm_init(dim, dtype),
        "attn": {
            "qkv": qkv,
            "proj": _trunc_dense(ks[1], dim, dim, dtype),
            "rel_table": 0.02 * jax.random.truncated_normal(
                ks[2], -2.0, 2.0, (table_len, num_heads), dtype),
        },
        "norm2": layer_norm_init(dim, dtype),
        "mlp": {
            "fc1": _trunc_dense(ks[3], dim, int(dim * mlp_ratio), dtype),
            "fc2": _trunc_dense(jax.random.fold_in(ks[3], 1),
                                int(dim * mlp_ratio), dim, dtype),
        },
    }


def swin_init(rng, cfg: SwinConfig = SWIN_BASE, dtype=jnp.float32) -> dict:
    n_stages = len(cfg.depths)
    ks = jax.random.split(rng, n_stages + 2)
    pd, ph, pw = cfg.patch_size
    params = {
        "patch_embed": {
            "proj": {
                # DHWIO conv kernel
                "w": 0.02 * jax.random.truncated_normal(
                    ks[-1], -2.0, 2.0, (pd, ph, pw, cfg.in_chans, cfg.embed_dim),
                    dtype),
                "b": jnp.zeros((cfg.embed_dim,), dtype),
            },
        },
        "stages": [],
        "norm": layer_norm_init(int(cfg.embed_dim * 2 ** (n_stages - 1)), dtype),
    }
    if cfg.patch_norm:
        params["patch_embed"]["norm"] = layer_norm_init(cfg.embed_dim, dtype)

    for i in range(n_stages):
        dim = int(cfg.embed_dim * 2 ** i)
        bks = jax.random.split(ks[i], cfg.depths[i] + 1)
        blocks = [swin_block_init(bks[j], dim, cfg.num_heads[i], cfg.mlp_ratio,
                                  cfg.window_size, cfg.qkv_bias, dtype)
                  for j in range(cfg.depths[i])]
        stage = {"blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, 0), *blocks)}
        if i < n_stages - 1:
            stage["downsample"] = {
                "norm": layer_norm_init(4 * dim, dtype),
                "reduction": _trunc_dense(bks[-1], 4 * dim, 2 * dim, dtype,
                                          bias=False),
            }
        params["stages"].append(stage)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def patch_embed(p: dict, x: jnp.ndarray, cfg: SwinConfig) -> jnp.ndarray:
    """(B, D, H, W, C_in) -> (B, D', H', W', embed_dim); pads each spatial axis
    up to a multiple of the patch size (reference video_swin_ori.py:464-482)."""
    pd, ph, pw = cfg.patch_size
    b, d, h, w, c = x.shape
    pads = [(0, 0),
            (0, (pd - d % pd) % pd),
            (0, (ph - h % ph) % ph),
            (0, (pw - w % pw) % pw),
            (0, 0)]
    if any(q for _, q in pads):
        x = jnp.pad(x, pads)
    # conv in the activation dtype (MXU still accumulates f32 internally);
    # an explicit preferred_element_type=f32 here breaks the transpose rule
    # under autodiff (f32 cotangent x bf16 kernel dtype mismatch).
    y = jax.lax.conv_general_dilated(
        x, p["proj"]["w"].astype(x.dtype), window_strides=cfg.patch_size,
        padding="VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y = (y.astype(jnp.float32) + p["proj"]["b"].astype(jnp.float32)).astype(x.dtype)
    if "norm" in p:
        y = layer_norm(p["norm"], y, eps=LN_EPS)
    return y


def window_attention(p: dict, x: jnp.ndarray, num_heads: int,
                     rel_index: jnp.ndarray,
                     mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Windowed MHA with relative position bias.

    x: (nB, N, C) where nB = B * num_windows; mask: (nW, N, N) additive or None.
    """
    nb, n, c = x.shape
    hd = c // num_heads
    dt = x.dtype

    qkv = dense(p["qkv"], x).reshape(nb, n, 3, num_heads, hd)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    bias = p["rel_table"].astype(jnp.float32)[rel_index]  # (N, N, nH)
    logits = logits + bias.transpose(2, 0, 1)[None]
    if mask is not None:
        n_w = mask.shape[0]
        logits = logits.reshape(nb // n_w, n_w, num_heads, n, n)
        logits = logits + mask[None, :, None, :, :]
        logits = logits.reshape(nb, num_heads, n, n)
    weights = jax.nn.softmax(logits, axis=-1).astype(dt)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                     preferred_element_type=jnp.float32).astype(dt)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(nb, n, c)
    return dense(p["proj"], ctx)


def drop_path(rng: Optional[jax.Array], x: jnp.ndarray, rate,
              deterministic: bool) -> jnp.ndarray:
    """Per-sample stochastic depth on the residual branch."""
    if deterministic:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def swin_block(p: dict, x: jnp.ndarray, *, num_heads: int,
               window: Tuple[int, int, int], shift: Tuple[int, int, int],
               rel_index: jnp.ndarray, mask: Optional[jnp.ndarray],
               dp_rate, deterministic: bool, rng: Optional[jax.Array],
               use_pallas=False, interpret: bool = False) -> jnp.ndarray:
    """One Swin block on (B, D, H, W, C): W-MSA / SW-MSA + MLP, post-pad to
    window multiples, optional cyclic shift (reference video_swin_ori.py:248-306).

    use_pallas: False for the XLA path, "full" for the fused whole-C kernel,
    or "hsplit" for the head-group-split kernel (C > 512). With either fused
    kernel, LN1 + partition + attention + proj + reverse run as one
    VMEM-resident program (ops/pallas_window_attn.py); roll/pad/residual
    stay in XLA.
    """
    b, d, h, w, c = x.shape
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))

    shortcut = x
    pad_d = (window[0] - d % window[0]) % window[0]
    pad_h = (window[1] - h % window[1]) % window[1]
    pad_w = (window[2] - w % window[2]) % window[2]
    dp, hp, wp = d + pad_d, h + pad_h, w + pad_w
    n = window[0] * window[1] * window[2]
    shifted = any(s > 0 for s in shift)

    if use_pallas:
        y = x
        if pad_d or pad_h or pad_w:
            # pad AFTER norm in the reference; padding zeros only ever attend
            # within all-padded windows here (our geometry has no mixed
            # windows when padding is zero), so padding before the fused LN
            # is only used when no padding is needed — guarded by caller.
            raise ValueError("pallas path requires window-aligned dims")
        if shifted:
            y = jnp.roll(y, shift=(-shift[0], -shift[1], -shift[2]),
                         axis=(1, 2, 3))
        nd, nh, nw = dp // window[0], hp // window[1], wp // window[2]
        if mask is not None:
            mask5 = mask.reshape(nd, nh, nw, n, n)
        else:
            # scalar sentinel: the fused kernels skip the mask add and its
            # per-program HBM stream for unshifted blocks (half the blocks)
            mask5 = jnp.zeros((1, 1, 1, 1, 1), jnp.float32)
        rel_bias = p["attn"]["rel_table"].astype(jnp.float32)[rel_index]
        rel_bias = rel_bias.transpose(2, 0, 1)  # (nH, N, N)
        from lrce_tpu.ops.pallas_window_attn import (
            fused_window_attention, fused_window_attention_hsplit)

        dt = y.dtype
        dp_inactive = deterministic or (isinstance(dp_rate, (int, float))
                                        and dp_rate == 0) or rng is None
        if use_pallas == "full" and c <= 512:
            # Whole-block fusion: LN1+attn+proj+residual+LN2+MLP+residual in
            # ONE kernel — the activation crosses HBM twice per block instead
            # of six times (this backend is bandwidth-bound; PERF.md). Every
            # op after window-reverse is per-token, so the full block
            # commutes with the cyclic roll. Active drop_path enters the
            # kernel as per-sample bernoulli/keep multipliers (same rng
            # draws as drop_path would make).
            from lrce_tpu.ops.pallas_swin_block import fused_swin_block

            if dp_inactive:
                dp1 = dp2 = jnp.ones((1, 1), jnp.float32)
            else:
                keep = 1.0 - dp_rate
                dp1 = (jax.random.bernoulli(r1, keep, (b, 1))
                       .astype(jnp.float32) / keep)
                dp2 = (jax.random.bernoulli(r2, keep, (b, 1))
                       .astype(jnp.float32) / keep)
            y = fused_swin_block(
                y, p["norm1"]["scale"], p["norm1"]["bias"],
                p["attn"]["qkv"]["w"].astype(dt), p["attn"]["qkv"]["b"],
                p["attn"]["proj"]["w"].astype(dt), p["attn"]["proj"]["b"],
                rel_bias, mask5,
                p["norm2"]["scale"], p["norm2"]["bias"],
                p["mlp"]["fc1"]["w"].astype(dt), p["mlp"]["fc1"]["b"],
                p["mlp"]["fc2"]["w"].astype(dt), p["mlp"]["fc2"]["b"],
                dp1, dp2, window, num_heads, LN_EPS, interpret)
            if shifted:
                y = jnp.roll(y, shift=shift, axis=(1, 2, 3))
            return y

        attn_fn = (fused_window_attention_hsplit if use_pallas == "hsplit"
                   else fused_window_attention)
        y = attn_fn(
            y, p["norm1"]["scale"], p["norm1"]["bias"],
            p["attn"]["qkv"]["w"].astype(dt), p["attn"]["qkv"]["b"],
            p["attn"]["proj"]["w"].astype(dt), p["attn"]["proj"]["b"],
            rel_bias, mask5, window, num_heads, LN_EPS, interpret)
        if shifted:
            y = jnp.roll(y, shift=shift, axis=(1, 2, 3))
    else:
        y = layer_norm(p["norm1"], x, eps=LN_EPS)
        if pad_d or pad_h or pad_w:
            y = jnp.pad(y, [(0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)])
        if shifted:
            y = jnp.roll(y, shift=(-shift[0], -shift[1], -shift[2]),
                         axis=(1, 2, 3))
        windows = window_partition(y, window)
        attn = window_attention(p["attn"], windows, num_heads, rel_index, mask)
        y = window_reverse(attn, window, b, dp, hp, wp)
        if shifted:
            y = jnp.roll(y, shift=shift, axis=(1, 2, 3))
        if pad_d or pad_h or pad_w:
            y = y[:, :d, :h, :w, :]

    x = shortcut + drop_path(r1, y, dp_rate, deterministic)

    if ((use_pallas == "hsplit" or (use_pallas and c > 512))
            and os.environ.get("LRCE_TPU_LNMLP")):
        # stage3 (C=1024, hsplit or LRCE_TPU_FULL_STAGE3's whole-C route):
        # XLA primal + flash-style fused Pallas MLP backward (round-4
        # verdict #7: the stage3 MLP was the last XLA-VJP remnant in the
        # train backbone). OPT-IN, not default: measured on-chip (round 5,
        # PERF.md) the fused backward is ~0.8% SLOWER than XLA's VJP at
        # stage3's 147-token-per-sample geometry (batch-24 device step
        # 548.3 vs 543.9 ms) — XLA's large-GEMM dW/dx wins, so the
        # "remnant" stays because it is the faster choice. The fused
        # Pallas forward measured ~1% slower still (bench 612.9 vs 618.9
        # clips/s). Both remain available and tested.
        from lrce_tpu.ops.pallas_swin_block import fused_ln_mlp

        dt = x.dtype
        dp_inactive = (deterministic or (isinstance(dp_rate, (int, float))
                                         and dp_rate == 0) or rng is None)
        if dp_inactive:
            dp2 = jnp.ones((1, 1), jnp.float32)
        else:
            keep = 1.0 - dp_rate
            dp2 = (jax.random.bernoulli(r2, keep, (b, 1))
                   .astype(jnp.float32) / keep)
        return fused_ln_mlp(x, p["norm2"]["scale"], p["norm2"]["bias"],
                            p["mlp"]["fc1"]["w"].astype(dt),
                            p["mlp"]["fc1"]["b"],
                            p["mlp"]["fc2"]["w"].astype(dt),
                            p["mlp"]["fc2"]["b"], dp2, LN_EPS, interpret)

    # (The standalone ops/pallas_mlp.fused_mlp routing that used to sit here
    # became unreachable once whole-block fusion covered every use_pallas
    # case with C <= 512; the op remains as the tested building block the
    # whole-block kernel's MLP half grew from.)
    z = layer_norm(p["norm2"], x, eps=LN_EPS)
    z = dense(p["mlp"]["fc2"], gelu(dense(p["mlp"]["fc1"], z)))
    return x + drop_path(r2, z, dp_rate, deterministic)


def patch_merging(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, D, H/2, W/2, 2C) (reference video_swin_ori.py:321-342)."""
    b, d, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)])
    x0 = x[:, :, 0::2, 0::2, :]
    x1 = x[:, :, 1::2, 0::2, :]
    x2 = x[:, :, 0::2, 1::2, :]
    x3 = x[:, :, 1::2, 1::2, :]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = layer_norm(p["norm"], x, eps=LN_EPS)
    return dense(p["reduction"], x)


def _pallas_supported(x_shape, window, max_dim: int = 512,
                      interpret: bool = False, force: bool = False):
    """Pick the fused-attention kernel for this stage: False (XLA path),
    "full" (whole-C kernel, C <= max_dim), or "hsplit" (head-group-split
    kernel for wider stages whose weights exceed one program's VMEM).
    Requires TPU, window-aligned dims (no pad), and lane-aligned C.

    interpret=True (SwinConfig.pallas_interpret) runs the same kernels via
    the Pallas interpreter on any backend: the TPU check and the Mosaic
    lane-alignment requirement are waived (only window divisibility stays,
    the kernels never pad), so CPU-mesh dryruns execute the real kernel
    code under multi-device sharding."""
    import os

    if os.environ.get("LRCE_TPU_DISABLE_PALLAS"):
        return False
    b, d, h, w, c = x_shape
    if not (d % window[0] == 0 and h % window[1] == 0 and w % window[2] == 0):
        return False
    if not interpret:
        if not force:
            try:
                if jax.default_backend() != "tpu":
                    return False
            except Exception:
                return False
        # c must be lane-aligned (128) for Mosaic's in-register reshapes
        if c % 128 != 0:
            return False
    if c <= max_dim:
        return "full"
    if os.environ.get("LRCE_TPU_FULL_STAGE3"):
        # experimental: the full-C kernel at C=1024 (32-head unrolled loop)
        # — fits VMEM post-diet and brings the hand-written chunked Pallas
        # backward to stage3 (the hsplit op differentiates via XLA)
        return "full"
    if os.environ.get("LRCE_TPU_DISABLE_HSPLIT"):
        return False
    return "hsplit"


def _pair_mode(x_shape, dtype, shifted: bool, use_pallas,
               interpret: bool = False) -> Optional[str]:
    """Route a (W-MSA, SW-MSA) pair through the full-spatial kernel
    (ops/pallas_swin_pair.py): "pair" fuses both blocks and the cyclic shift
    into one program (both blocks' weights fit VMEM through C=256); at C=512
    the weights of two blocks exceed one program's budget, so only the
    SHIFTED block goes full-spatial ("shifted_only") — that still deletes
    the two XLA roll passes each way, the dominant remaining HBM cost.

    Compile-safe by construction: on real hardware a geometry is only
    routed when tools/probe_pair_vmem.py has PROVEN it compiles under the
    default scoped-vmem budget (pallas_swin_pair.PROVEN_TILINGS) — Mosaic's
    scoped-vmem check happens only at backend compile, so an unproven
    routing can abort the whole program (BENCH_r04 rc=1). Unproven
    geometries fall back to the whole-block kernel + XLA rolls.
    LRCE_TPU_PAIR_FORCE=1 bypasses the proof gate (probing/experiments);
    interpret mode has no Mosaic budget and routes by size alone."""
    import os

    if use_pallas != "full" or not shifted:
        return None
    if os.environ.get("LRCE_TPU_DISABLE_PAIR"):
        return None
    b, d, h, w, c = x_shape
    mode = "pair" if c <= 256 else ("shifted_only" if c <= 512 else None)
    if mode is None:
        return None
    if interpret or os.environ.get("LRCE_TPU_PAIR_FORCE"):
        return mode
    from lrce_tpu.ops.pallas_swin_pair import proven_tiling

    k = 2 if mode == "pair" else 1
    if proven_tiling(c, d, h, w, k, dtype) is None:
        return None
    return mode


def _call_pair(p_stk, y, *, window, shifts, rel_index, mask5, rates, rngs,
               num_heads, deterministic, interpret) -> jnp.ndarray:
    """Invoke the full-spatial kernel on k stacked blocks.

    p_stk: block params stacked on a leading k axis; shifts: static
    per-block shift tuples; rngs: per-block keys (or None) — drop_path
    draws use the exact keys/shapes the per-block paths would
    (swin_block: r1, r2 = split(rng); bernoulli(r, keep, (B, 1)))."""
    from lrce_tpu.ops.pallas_swin_pair import fused_swin_pair

    b = y.shape[0]
    dt = y.dtype
    k = len(shifts)
    bias = p_stk["attn"]["rel_table"].astype(jnp.float32)[:, rel_index]
    bias = bias.transpose(0, 3, 1, 2)            # (k, nH, N, N)

    # rates are scan-carried tracers, so activity can't be value-tested at
    # trace time — mirror swin_block's rule: active iff training with a key
    # (a zero rate then draws keep-everything multipliers, same as the
    # per-block paths)
    has_dp = not deterministic and rngs[0] is not None
    if has_dp:
        dp1_l, dp2_l = [], []
        for i in range(k):
            keep = 1.0 - rates[i]
            ra, rb = jax.random.split(rngs[i])
            dp1_l.append(jax.random.bernoulli(ra, keep, (b, 1))
                         .astype(jnp.float32) / keep)
            dp2_l.append(jax.random.bernoulli(rb, keep, (b, 1))
                         .astype(jnp.float32) / keep)
        dp1 = jnp.stack(dp1_l)[:, :, 0]          # (k, B)
        dp2 = jnp.stack(dp2_l)[:, :, 0]
    else:
        dp1 = dp2 = jnp.ones((1, 1), jnp.float32)

    return fused_swin_pair(
        y, p_stk["norm1"]["scale"], p_stk["norm1"]["bias"],
        p_stk["attn"]["qkv"]["w"].astype(dt), p_stk["attn"]["qkv"]["b"],
        p_stk["attn"]["proj"]["w"].astype(dt), p_stk["attn"]["proj"]["b"],
        bias, mask5,
        p_stk["norm2"]["scale"], p_stk["norm2"]["bias"],
        p_stk["mlp"]["fc1"]["w"].astype(dt), p_stk["mlp"]["fc1"]["b"],
        p_stk["mlp"]["fc2"]["w"].astype(dt), p_stk["mlp"]["fc2"]["b"],
        dp1, dp2, window, num_heads, shifts, LN_EPS, interpret, has_dp)


def swin_stage(stage_params: dict, x: jnp.ndarray, *, depth: int,
               num_heads: int, cfg: SwinConfig, dp_rates: Sequence[float],
               deterministic: bool, rng: Optional[jax.Array]) -> jnp.ndarray:
    """One BasicLayer: `depth` blocks (alternating no-shift / shift) then
    optional PatchMerging. Blocks run under lax.scan over (pair) index with
    static window/shift/mask."""
    b, d, h, w, c = x.shape
    window, shift = get_window_size(
        (d, h, w), cfg.window_size, tuple(s // 2 for s in cfg.window_size))
    dp = int(np.ceil(d / window[0])) * window[0]
    hp = int(np.ceil(h / window[1])) * window[1]
    wp = int(np.ceil(w / window[2])) * window[2]
    use_pallas = _pallas_supported(x.shape, window,
                                   interpret=cfg.pallas_interpret,
                                   force=cfg.pallas_force)

    rel_idx_np = relative_position_index(cfg.window_size)
    n = window[0] * window[1] * window[2]
    rel_index = jnp.asarray(rel_idx_np[:n, :n])

    shifted = any(s > 0 for s in shift)
    mask = (jnp.asarray(compute_shift_mask((dp, hp, wp), window, shift))
            if shifted else None)

    assert depth % 2 == 0, "Swin stage depths are even (pairs of W-MSA/SW-MSA)"

    # Reshape the stacked blocks into (depth//2, 2, ...) pairs and scan pairs:
    # the unshifted/shifted structure stays static inside one scan body.
    pairs = jax.tree_util.tree_map(
        lambda t: t.reshape((depth // 2, 2) + t.shape[1:]),
        stage_params["blocks"])
    rate_pairs = jnp.asarray(np.asarray(dp_rates, np.float32)).reshape(-1, 2)

    pair_mode = _pair_mode(x.shape, x.dtype, shifted, use_pallas,
                           interpret=cfg.pallas_interpret)
    nd_, nh_, nw_ = dp // window[0], hp // window[1], wp // window[2]
    mask5 = (mask.reshape(nd_, nh_, nw_, n, n) if shifted and mask is not None
             else jnp.zeros((1, 1, 1, 1, 1), jnp.float32))
    if pair_mode is not None and shifted:
        # hand the pair kernel the 4-pattern compact mask when the geometry
        # allows (nd=1, >=2 windows per axis): 2.77 MB -> 173 KB of VMEM at
        # flagship stage0 (ops/pallas_swin_pair.compact_shift_mask_np).
        # On real hardware only when the PROVEN entry was measured with it
        # (5th tuple slot) — the shipped kernel must be the probed kernel;
        # interpret mode always compacts so CPU tests/dryruns cover the path.
        from lrce_tpu.ops.pallas_swin_pair import (compact_shift_mask_np,
                                                   proven_tiling)

        pt = (None if cfg.pallas_interpret else
              proven_tiling(c, dp, hp, wp, 2 if pair_mode == "pair" else 1,
                            x.dtype))
        if cfg.pallas_interpret or (pt is not None and len(pt) > 4
                                    and pt[4]):
            cm = compact_shift_mask_np(
                np.asarray(compute_shift_mask((dp, hp, wp), window, shift))
                .reshape(nd_, nh_, nw_, n, n))
            if cm is not None:
                mask5 = jnp.asarray(cm)

    def pair_fn(y, pair_params, rates, idx):
        p0 = jax.tree_util.tree_map(lambda t: t[0], pair_params)
        p1 = jax.tree_util.tree_map(lambda t: t[1], pair_params)
        r0 = None if rng is None else jax.random.fold_in(rng, 2 * idx)
        r1 = None if rng is None else jax.random.fold_in(rng, 2 * idx + 1)
        if pair_mode == "pair":
            # whole (W, SW) pair + cyclic shift in ONE full-spatial kernel:
            # 2 HBM passes instead of 8 (ops/pallas_swin_pair.py)
            return _call_pair(
                pair_params, y, window=window, shifts=((0, 0, 0), shift),
                rel_index=rel_index, mask5=mask5, rates=rates, rngs=(r0, r1),
                num_heads=num_heads, deterministic=deterministic,
                interpret=cfg.pallas_interpret)
        y = swin_block(p0, y, num_heads=num_heads, window=window,
                       shift=(0, 0, 0), rel_index=rel_index, mask=None,
                       dp_rate=rates[0], deterministic=deterministic, rng=r0,
                       use_pallas=use_pallas, interpret=cfg.pallas_interpret)
        if pair_mode == "shifted_only":
            # SW block full-spatial with the roll in VMEM: deletes the four
            # XLA roll passes (two each way) around the block kernel
            p1_stk = jax.tree_util.tree_map(lambda t: t[1:2], pair_params)
            return _call_pair(
                p1_stk, y, window=window, shifts=(shift,),
                rel_index=rel_index, mask5=mask5, rates=rates[1:],
                rngs=(r1,), num_heads=num_heads, deterministic=deterministic,
                interpret=cfg.pallas_interpret)
        y = swin_block(p1, y, num_heads=num_heads, window=window, shift=shift,
                       rel_index=rel_index, mask=mask if shifted else None,
                       dp_rate=rates[1], deterministic=deterministic, rng=r1,
                       use_pallas=use_pallas, interpret=cfg.pallas_interpret)
        return y

    if cfg.remat:
        pair_fn = jax.checkpoint(pair_fn, static_argnums=())

    def body(y, xs):
        pair_params, rates, idx = xs
        return pair_fn(y, pair_params, rates, idx), None

    x, _ = jax.lax.scan(body, x, (pairs, rate_pairs, jnp.arange(depth // 2)))

    if "downsample" in stage_params:
        x = patch_merging(stage_params["downsample"], x)
    return x


def swin_forward(params: dict, x: jnp.ndarray, cfg: SwinConfig = SWIN_BASE, *,
                 deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, D, H, W, 3) channels-last video -> (B, D', H/32, W/32, 1024).

    Equivalent to reference SwinTransformer3D.forward (video_swin_ori.py:674-687)
    modulo layout: the reference is NCDHW, we are NDHWC.
    """
    x = patch_embed(params["patch_embed"], x, cfg)

    total_depth = sum(cfg.depths)
    all_rates = np.linspace(0, cfg.drop_path_rate, total_depth)
    offset = 0
    for i, stage_params in enumerate(params["stages"]):
        stage_rng = None if rng is None else jax.random.fold_in(rng, i)
        x = swin_stage(stage_params, x, depth=cfg.depths[i],
                       num_heads=cfg.num_heads[i], cfg=cfg,
                       dp_rates=all_rates[offset:offset + cfg.depths[i]],
                       deterministic=deterministic, rng=stage_rng)
        offset += cfg.depths[i]

    return layer_norm(params["norm"], x, eps=LN_EPS)
