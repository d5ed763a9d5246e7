"""On-chip compile probe for the full-spatial pair kernel's tilings.

For each flagship stage geometry, try (kh_rows, ff_chunks) candidates and
report which compile under the 16 MB default scoped-vmem budget and how
fast they run (96-clip grid, bf16 — the bench.py regime). Used to pick the
tilings hard-coded in ops/pallas_swin_pair._pick_tiling; keep this runnable
so future geometry claims are one command to re-verify.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lrce_tpu.models.swin3d import (SWIN_BASE, compute_shift_mask,
                                    get_window_size, relative_position_index)
from lrce_tpu.ops import pallas_swin_pair as PSP


def stage_geom(stage: int, b: int):
    c = [128, 256, 512, 1024][stage]
    hw = [56, 28, 14, 7][stage]
    d = 3
    window, shift = get_window_size((d, hw, hw), SWIN_BASE.window_size,
                                    tuple(s // 2 for s in SWIN_BASE.window_size))
    return c, d, hw, window, shift


def build_args(stage: int, b: int, mode: str, rng=None, compact=False):
    c, d, hw, window, shift = stage_geom(stage, b)
    heads = [4, 8, 16, 32][stage]
    n = window[0] * window[1] * window[2]
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 20)
    dt = jnp.bfloat16
    k = 2 if mode == "pair" else 1
    shifts = ((0, 0, 0), shift) if mode == "pair" else (shift,)
    x = jax.random.normal(ks[0], (b, d, hw, hw, c), dt)
    mk = lambda i, shape, d_=dt: (jax.random.normal(ks[i], shape, jnp.float32)
                                  .astype(d_) * 0.02)
    ln1s = mk(1, (k, c), jnp.float32)
    ln1b = mk(2, (k, c), jnp.float32)
    qkv_w = mk(3, (k, c, 3 * c))
    qkv_b = mk(4, (k, 3 * c), jnp.float32)
    proj_w = mk(5, (k, c, c))
    proj_b = mk(6, (k, c), jnp.float32)
    rel_idx = relative_position_index(SWIN_BASE.window_size)[:n, :n]
    table = mk(7, (k, (2 * 8 - 1) * 13 * 13, heads), jnp.float32)
    bias = table[:, np.asarray(rel_idx)].transpose(0, 3, 1, 2)
    nd_, nh_, nw_ = d // window[0], hw // window[1], hw // window[2]
    mask = jnp.asarray(compute_shift_mask((d, hw, hw), window, shift))
    mask5 = mask.reshape(nd_, nh_, nw_, n, n).astype(jnp.bfloat16)
    if compact:
        cm = PSP.compact_shift_mask_np(
            np.asarray(mask).reshape(nd_, nh_, nw_, n, n))
        assert cm is not None, "geometry does not allow a compact mask"
        mask5 = jnp.asarray(cm).astype(jnp.bfloat16)
    ln2s = mk(8, (k, c), jnp.float32)
    ln2b = mk(9, (k, c), jnp.float32)
    w1 = mk(10, (k, c, 4 * c))
    b1 = mk(11, (k, 4 * c), jnp.float32)
    w2 = mk(12, (k, 4 * c, c))
    b2 = mk(13, (k, c), jnp.float32)
    dp = jnp.ones((1, 1), jnp.float32)
    return (x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, bias, mask5,
            ln2s, ln2b, w1, b1, w2, b2, dp, dp), window, heads, shifts


COMPACT = False
ALIAS = False


def make_jitted(stage: int, b: int, mode: str, kh: int, ffc: int,
                wc=None):
    """Build (jitted_fn, args) for one variant; compile happens on first
    call."""
    from lrce_tpu.ops import pallas_swin_block as PSB

    kern_mode = "pair" if mode == "block_pair" else (
        "shifted_only" if mode == "roll_block" else mode)
    is_block = mode in ("block_pair", "roll_block")
    # decomposed modes need the full mask; pair modes use --compact/--alias
    args, window, heads, shifts = build_args(stage, b, kern_mode,
                                             compact=COMPACT and not is_block)

    if is_block:
        # the decomposed alternative the model would otherwise run:
        # fused_swin_block per block with XLA rolls around the shifted one
        def f(*a):
            (x, ln1s, ln1b, qkv_w, qkv_b, proj_w, proj_b, bias, mask5,
             ln2s, ln2b, w1, b1, w2, b2, dp1, dp2) = a
            sent = jnp.zeros((1, 1, 1, 1, 1), jnp.float32)
            dp = jnp.ones((1, 1), jnp.float32)
            for blk, s in enumerate(shifts):
                shifted = any(v != 0 for v in s)
                if shifted:
                    x = jnp.roll(x, (-s[0], -s[1], -s[2]), axis=(1, 2, 3))
                x = PSB.fused_swin_block(
                    x, ln1s[blk], ln1b[blk], qkv_w[blk], qkv_b[blk],
                    proj_w[blk], proj_b[blk], bias[blk],
                    mask5.astype(jnp.float32) if shifted else sent,
                    ln2s[blk], ln2b[blk], w1[blk], b1[blk], w2[blk], b2[blk],
                    dp, dp, window, heads, 1e-5, False)
                if shifted:
                    x = jnp.roll(x, s, axis=(1, 2, 3))
            return x
    else:
        def f(x, *a):
            if ALIAS:
                # make x an intermediate so the alias is genuinely in-place
                # (a jit parameter would get a protective copy, hiding the
                # HBM win; the multiply is one cheap extra pass)
                x = x * jnp.asarray(1.00390625, x.dtype)
            return PSP._pair_fwd_impl(x, *a, window=window, num_heads=heads,
                                      ln_eps=1e-5, shifts=shifts,
                                      has_dp=False, interpret=False,
                                      kh_rows=kh, ff_chunks=ffc,
                                      win_chunk=wc, alias_io=ALIAS)

    return jax.jit(f), args


def warm(jf, args) -> str | None:
    """Compile + first run; returns an error string or None on success."""
    try:
        out = jf(*args)
        float(out.astype(jnp.float32).sum())
        return None
    except Exception as e:
        msg = str(e)
        if "exceeded scoped vmem" in msg:
            lim = msg.split("exceeded scoped vmem limit by")[-1].split(".")[0]
            return f"VMEM-OOM (over by{lim})"
        return f"FAIL: {msg.splitlines()[-1][:120]}"


def time_ms(jf, args, iters: int) -> float:
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    float(out.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters * 1e3


def probe(stage: int, b: int, mode: str, kh: int, ffc: int,
          iters: int = 30, wc=None) -> str:
    jf, args = make_jitted(stage, b, mode, kh, ffc, wc=wc)
    err = warm(jf, args)
    if err:
        return err
    return f"OK {time_ms(jf, args, iters):.2f} ms"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, required=True)
    ap.add_argument("--mode", default="pair",
                    choices=["pair", "shifted_only", "block_pair",
                             "roll_block"],
                    help="pair/shifted_only probe the full-spatial kernel; "
                         "block_pair/roll_block time the decomposed "
                         "whole-block alternative for the same work")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--tilings", default="1:1,1:2,2:1,2:2",
                    help="comma list of kh:ffc[:win_chunk]")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--compact", action="store_true",
                    help="use the 4-pattern compact shift mask (pair modes)")
    ap.add_argument("--alias", action="store_true",
                    help="alias the kernel's in/out block (pair modes)")
    ap.add_argument("--compare", default=None,
                    help="second mode to interleave against (e.g. "
                         "block_pair): both variants compile once, then "
                         "3 alternating timing rounds — the ratio is "
                         "immune to the VM's minute-scale speed swings")
    args = ap.parse_args()
    global COMPACT, ALIAS
    COMPACT, ALIAS = args.compact, args.alias
    for spec in args.tilings.split(","):
        parts = list(map(int, spec.split(":")))
        kh, ffc = parts[0], parts[1]
        wc = parts[2] if len(parts) > 2 else None
        if args.compare is None:
            r = probe(args.stage, args.batch, args.mode, kh, ffc, args.iters,
                      wc=wc)
            print(f"stage{args.stage} {args.mode} b={args.batch} "
                  f"kh={kh} ffc={ffc} wc={wc} compact={COMPACT} "
                  f"alias={ALIAS}: {r}", flush=True)
        else:
            ja, aa = make_jitted(args.stage, args.batch, args.mode, kh, ffc,
                                 wc=wc)
            jb, ab = make_jitted(args.stage, args.batch, args.compare,
                                 kh, ffc)
            ea, eb = warm(ja, aa), warm(jb, ab)
            if ea or eb:
                print(f"stage{args.stage} kh={kh} ffc={ffc} "
                      f"{args.mode}: {ea or 'OK'} | "
                      f"{args.compare}: {eb or 'OK'}", flush=True)
                continue
            for rnd in range(3):
                ta = time_ms(ja, aa, args.iters)
                tb = time_ms(jb, ab, args.iters)
                print(f"round {rnd}: stage{args.stage} kh={kh} ffc={ffc} "
                      f"{args.mode}: {ta:.2f} ms | {args.compare}: "
                      f"{tb:.2f} ms | ratio {tb / ta:.3f}", flush=True)


if __name__ == "__main__":
    main()
