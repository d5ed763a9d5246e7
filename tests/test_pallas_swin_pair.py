"""Full-spatial pair kernel (ops/pallas_swin_pair.py): the whole
(W-MSA, SW-MSA) block pair — cyclic shift included — in one Pallas program,
checked in interpret mode against the decomposed composition (roll +
window-attention + MLP via the existing ops) and under autodiff.

Reference behavior being matched: consecutive SwinTransformerBlock3D calls
with alternating shift (reference video_swin_ori.py:248-306, 343-376).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lrce_tpu.models import swin3d as S
from lrce_tpu.ops import pallas_swin_pair as PSP

# window-aligned: (D,H,W) = (2, 6, 9), window (2,3,3) -> nd,nh,nw = 1,2,3
WINDOW = (2, 3, 3)
SHIFT = (0, 1, 1)
B, D, H, W, C = 3, 2, 6, 9, 32
HEADS = 4
N = WINDOW[0] * WINDOW[1] * WINDOW[2]


def _mk(k, key, dtype=jnp.float32):
    ks = jax.random.split(key, 16)
    u = lambda i, shape: jax.random.normal(ks[i], shape, dtype) * 0.1
    x = jax.random.normal(ks[0], (B, D, H, W, C), dtype)
    args = dict(
        ln1s=1.0 + u(1, (k, C)), ln1b=u(2, (k, C)),
        qkv_w=u(3, (k, C, 3 * C)), qkv_b=u(4, (k, 3 * C)),
        proj_w=u(5, (k, C, C)), proj_b=u(6, (k, C)),
        rel_bias=u(7, (k, HEADS, N, N)).astype(jnp.float32),
        ln2s=1.0 + u(8, (k, C)), ln2b=u(9, (k, C)),
        w1=u(10, (k, C, 4 * C)), b1=u(11, (k, 4 * C)),
        w2=u(12, (k, 4 * C, C)), b2=u(13, (k, C)),
    )
    nd, nh, nw = D // WINDOW[0], H // WINDOW[1], W // WINDOW[2]
    mask = jnp.asarray(S.compute_shift_mask((D, H, W), WINDOW, SHIFT))
    args["mask"] = mask.reshape(nd, nh, nw, N, N)
    return x, args


def _run(fn, x, a, shifts, dp1=None, dp2=None, has_dp=False):
    dp1 = dp1 if dp1 is not None else jnp.ones((1, 1), jnp.float32)
    dp2 = dp2 if dp2 is not None else jnp.ones((1, 1), jnp.float32)
    return fn(x, a["ln1s"], a["ln1b"], a["qkv_w"], a["qkv_b"], a["proj_w"],
              a["proj_b"], a["rel_bias"], a["mask"], a["ln2s"], a["ln2b"],
              a["w1"], a["b1"], a["w2"], a["b2"], dp1, dp2, WINDOW, HEADS,
              shifts, 1e-5, True, has_dp)


@pytest.mark.parametrize("k,shifts", [
    (2, ((0, 0, 0), SHIFT)),           # full pair: W then SW
    (1, (SHIFT,)),                     # single shifted block (stage2 mode)
    (1, ((0, 0, 0),)),                 # degenerate: one unshifted block
], ids=["pair", "shifted-only", "unshifted"])
def test_pair_matches_decomposed(k, shifts):
    x, a = _mk(k, jax.random.PRNGKey(0))
    got = _run(PSP.fused_swin_pair, x, a, shifts)
    want = _run(lambda *args: PSP._decomposed(
        *args[:17], window=WINDOW, num_heads=HEADS, shifts=shifts,
        ln_eps=1e-5, has_dp=False, interpret=True), x, a, shifts)
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 2e-5, err


def test_pair_grad_matches_decomposed():
    shifts = ((0, 0, 0), SHIFT)
    x, a = _mk(2, jax.random.PRNGKey(1))

    def loss_fused(x, qkv_w, w1):
        a2 = dict(a, qkv_w=qkv_w, w1=w1)
        return jnp.sum(_run(PSP.fused_swin_pair, x, a2, shifts) ** 2)

    def loss_ref(x, qkv_w, w1):
        a2 = dict(a, qkv_w=qkv_w, w1=w1)
        return jnp.sum(_run(lambda *args: PSP._decomposed(
            *args[:17], window=WINDOW, num_heads=HEADS, shifts=shifts,
            ln_eps=1e-5, has_dp=False, interpret=True), x, a2, shifts) ** 2)

    g = jax.grad(loss_fused, argnums=(0, 1, 2))(x, a["qkv_w"], a["w1"])
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, a["qkv_w"], a["w1"])
    for got, want in zip(g, gr):
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want))) + 1.0
        assert err < 5e-5 * scale, err


def test_pair_drop_path_multipliers_apply():
    """Active per-sample stochastic depth: zeroing both multipliers for one
    sample must make that sample's pair output equal its input; keep=1
    multipliers reproduce the deterministic output."""
    shifts = ((0, 0, 0), SHIFT)
    x, a = _mk(2, jax.random.PRNGKey(2))
    ones = jnp.ones((2, B), jnp.float32)
    kill = ones.at[:, 0].set(0.0)
    base = _run(PSP.fused_swin_pair, x, a, shifts)
    same = _run(PSP.fused_swin_pair, x, a, shifts, ones, ones, has_dp=True)
    assert float(jnp.max(jnp.abs(same - base))) < 1e-6
    dead = _run(PSP.fused_swin_pair, x, a, shifts, kill, kill, has_dp=True)
    assert float(jnp.max(jnp.abs(dead[0] - x[0]))) < 1e-6
    assert float(jnp.max(jnp.abs(dead[1] - base[1]))) < 1e-6


def test_stage_routes_pairs_and_matches_xla():
    """swin_stage with pallas_interpret routes C<=256 shifted stages through
    the pair kernel (one program per pair) and matches the XLA path."""
    cfg = S.SwinConfig(patch_size=(2, 4, 4), embed_dim=32, depths=(4,),
                       num_heads=(4,), window_size=(2, 3, 3),
                       drop_path_rate=0.0, patch_norm=True,
                       pallas_interpret=True)
    params = S.swin_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 24, 24, 3))
    shifted = any(s for s in (0, 1, 1))
    assert S._pair_mode((2, 2, 6, 6, 32), jnp.float32, shifted, "full",
                        interpret=True) == "pair"
    y = S.swin_forward(params, x, cfg)
    y_ref = S.swin_forward(params, x, cfg._replace(pallas_interpret=False))
    assert float(jnp.max(jnp.abs(y - y_ref))) < 2e-5


def test_stage_shifted_only_mode_matches_xla(monkeypatch):
    """The C=512-style routing (W block on the grid kernel, SW block
    full-spatial) — forced via _pair_mode, checked against XLA."""
    import lrce_tpu.models.swin3d as S2

    real = S2._pair_mode
    monkeypatch.setattr(
        S2, "_pair_mode",
        lambda *a, **kw: "shifted_only" if real(*a, **kw) else None)
    cfg = S.SwinConfig(patch_size=(2, 4, 4), embed_dim=32, depths=(2,),
                       num_heads=(4,), window_size=(2, 3, 3),
                       drop_path_rate=0.0, patch_norm=True,
                       pallas_interpret=True)
    params = S.swin_init(jax.random.PRNGKey(5), cfg)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 24, 24, 3))
    y = S.swin_forward(params, x, cfg)
    y_ref = S.swin_forward(params, x, cfg._replace(pallas_interpret=False))
    assert float(jnp.max(jnp.abs(y - y_ref))) < 2e-5


def test_routing_requires_on_chip_proof():
    """Real-hardware routing is compile-safe by construction: only
    geometries in PROVEN_TILINGS (measured by tools/probe_pair_vmem.py to
    compile under the default scoped-vmem budget) may route through the
    full-spatial kernel. The round-4 regression shapes — flagship stage0
    (C=128, 56x56) and the kh=2 stage1 tiling — must never route again
    unless explicitly proven."""
    bf16 = jnp.bfloat16
    # flagship stage0: 20.58 MB > 16 MB budget (BENCH_r04) -> must not route
    assert S._pair_mode((96, 3, 56, 56, 128), bf16, True, "full") is None
    # flagship stage1 compiles but LOSES to the whole-block path (PERF.md
    # round 5) -> deliberately not proven-in
    assert S._pair_mode((96, 3, 28, 28, 256), bf16, True, "full") is None
    # flagship stage2 IS proven (kh=2, 7-9% win): shifted block full-spatial
    assert S._pair_mode((96, 3, 14, 14, 512), bf16, True,
                        "full") == "shifted_only"
    # f32 doubles the live set and has no proven entry -> must not route
    assert S._pair_mode((96, 3, 14, 14, 512), jnp.float32, True,
                        "full") is None
    # every proven signature's routing resolves to its measured tiling
    from lrce_tpu.ops.pallas_swin_pair import PROVEN_TILINGS, proven_tiling
    for (c, d, h, w, k, isz), tiling in PROVEN_TILINGS.items():
        dt = jnp.bfloat16 if isz == 2 else jnp.float32
        assert proven_tiling(c, d, h, w, k, dt) == tiling


def test_unproven_geometry_falls_back_and_matches(monkeypatch):
    """Flagship forward must survive the pair kernel being unbuildable at
    any geometry: with the proven table emptied (every pair routing refused,
    as for an over-budget tiling), the stage falls back to the whole-block
    path and still produces the correct output."""
    import lrce_tpu.ops.pallas_swin_pair as PSP2

    cfg = S.SwinConfig(patch_size=(2, 4, 4), embed_dim=32, depths=(4,),
                       num_heads=(4,), window_size=(2, 3, 3),
                       drop_path_rate=0.0, patch_norm=True,
                       pallas_interpret=True)
    params = S.swin_init(jax.random.PRNGKey(7), cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 24, 24, 3))
    y_pair = S.swin_forward(params, x, cfg)

    # simulate "nothing proven" the way real hardware would see it: the
    # interpret bypass is disabled so _pair_mode consults the (empty) table
    monkeypatch.setattr(PSP2, "PROVEN_TILINGS", {})
    real = S._pair_mode
    monkeypatch.setattr(
        S, "_pair_mode",
        lambda shape, dt, sh, up, interpret=False: real(shape, dt, sh, up,
                                                        interpret=False))
    y_fallback = S.swin_forward(params, x, cfg)
    assert float(jnp.max(jnp.abs(y_fallback - y_pair))) < 2e-5


def _impl(x, a, shifts, mask, wc=None):
    dp = jnp.ones((1, 1), jnp.float32)
    return PSP._pair_fwd_impl(
        x, a["ln1s"], a["ln1b"], a["qkv_w"], a["qkv_b"], a["proj_w"],
        a["proj_b"], a["rel_bias"], mask, a["ln2s"], a["ln2b"], a["w1"],
        a["b1"], a["w2"], a["b2"], dp, dp, window=WINDOW, num_heads=HEADS,
        ln_eps=1e-5, shifts=shifts, has_dp=False, interpret=True,
        win_chunk=wc)


def test_compact_mask_and_win_chunk_match_full():
    """The VMEM diet knobs (4-pattern compact mask, window-chunked
    attention) must be exact against the full-mask unchunked kernel."""
    shifts = ((0, 0, 0), SHIFT)
    x, a = _mk(2, jax.random.PRNGKey(9))
    cm = PSP.compact_shift_mask_np(np.asarray(a["mask"]))
    assert cm is not None and cm.shape == (2, 2, N, N)
    ref = _impl(x, a, shifts, a["mask"])
    for mask, wc in [(jnp.asarray(cm), None), (jnp.asarray(cm), 1),
                     (a["mask"], 3)]:
        got = _impl(x, a, shifts, mask, wc)
        assert float(jnp.max(jnp.abs(got - ref))) < 2e-6


def test_compact_mask_grad_matches_full():
    """fused_swin_pair's custom VJP differentiates the decomposed
    composition, which must expand the compact mask identically."""
    shifts = ((0, 0, 0), SHIFT)
    x, a = _mk(2, jax.random.PRNGKey(10))
    cm = jnp.asarray(PSP.compact_shift_mask_np(np.asarray(a["mask"])))

    def loss(x, qkv_w, mask):
        a2 = dict(a, qkv_w=qkv_w, mask=mask)
        return jnp.sum(_run(PSP.fused_swin_pair, x, a2, shifts) ** 2)

    g_c = jax.grad(loss, argnums=(0, 1))(x, a["qkv_w"], cm)
    g_f = jax.grad(loss, argnums=(0, 1))(x, a["qkv_w"], a["mask"])
    for got, want in zip(g_c, g_f):
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 5e-5 * (float(jnp.max(jnp.abs(want))) + 1.0), err


def test_compact_mask_rejects_unqualified_geometry():
    # nd > 1 (d-shifted masks differ along d) and single-window axes must
    # fall back to the full mask
    m = np.zeros((2, 2, 3, 4, 4), np.float32)
    assert PSP.compact_shift_mask_np(m) is None
    m = np.zeros((1, 1, 3, 4, 4), np.float32)
    assert PSP.compact_shift_mask_np(m) is None
    # a non-cyclic pattern (interior windows differing) must be refused
    m = np.zeros((1, 3, 3, 4, 4), np.float32)
    m[0, 1, 0, 0, 0] = 1.0
    assert PSP.compact_shift_mask_np(m) is None
