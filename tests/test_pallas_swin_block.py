"""Whole-block fused Swin kernel (LN1+attn+proj+res+LN2+MLP+res): exact
semantics vs the decomposed ops (interpret mode on CPU), incl. the scalar
mask sentinel, FF chunking, and the custom VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lrce_tpu.ops import pallas_swin_block as PB
from lrce_tpu.ops import pallas_window_attn as PW
from tests.test_pallas_window_attn import setup_case


def block_case(shifted, c=64, heads=4, seed=0, sentinel=False):
    inputs, window, heads = setup_case(c=c, heads=heads, shifted=shifted,
                                       seed=seed)
    rng = np.random.RandomState(seed + 100)
    ff = 4 * c
    mlp = (rng.rand(c).astype(np.float32) + 0.5,           # ln2 scale
           rng.randn(c).astype(np.float32) * 0.1,          # ln2 bias
           (rng.randn(c, ff) / np.sqrt(c)).astype(np.float32),
           rng.randn(ff).astype(np.float32) * 0.02,
           (rng.randn(ff, c) / np.sqrt(ff)).astype(np.float32),
           rng.randn(c).astype(np.float32) * 0.02)
    inputs = list(inputs) + [jnp.asarray(v) for v in mlp]
    inputs += [jnp.ones((1, 1), jnp.float32)] * 2      # dp sentinels
    if sentinel:
        inputs[8] = jnp.zeros((1, 1, 1, 1, 1), jnp.float32)
    return inputs, window, heads


@pytest.mark.parametrize("shifted,sentinel", [(False, False), (False, True),
                                              (True, False)])
def test_block_matches_decomposed(shifted, sentinel):
    inputs, window, heads = block_case(shifted, sentinel=sentinel)
    got = PB.fused_swin_block(*inputs, window, heads, 1e-5, True)
    ref = PB._decomposed(*inputs, window=window, num_heads=heads,
                         ln_eps=1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_block_bf16_close_to_f32_reference():
    """bf16 activations route through the MXU lane-sum branches (_lane_sum:
    exact LN mean, <=2^-8-relative softmax denominator); the result must
    stay within bf16-rounding distance of the f32 decomposed reference."""
    inputs, window, heads = block_case(shifted=True, seed=5)
    bf = [jnp.asarray(v, jnp.bfloat16)
          if i in (0, 3, 5, 11, 13) else v            # x + weight matrices
          for i, v in enumerate(inputs)]
    got = PB.fused_swin_block(*bf, window, heads, 1e-5, True)
    ref = PB._decomposed(*inputs, window=window, num_heads=heads,
                         ln_eps=1e-5, interpret=True)
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(ref)))
    scale = np.max(np.abs(np.asarray(ref))) + 1e-6
    assert err / scale < 0.06, f"bf16 drift {err/scale:.4f} vs f32 reference"


def test_block_ff_chunking_identical():
    inputs, window, heads = block_case(shifted=True, seed=3)
    one = PB._block_fwd_impl(*inputs, window=window, num_heads=heads,
                             ln_eps=1e-5, interpret=True, ff_chunks=1)
    two = PB._block_fwd_impl(*inputs, window=window, num_heads=heads,
                             ln_eps=1e-5, interpret=True, ff_chunks=2)
    np.testing.assert_allclose(np.asarray(one), np.asarray(two),
                               rtol=2e-6, atol=2e-6)


def test_block_drop_path_matches_decomposed():
    """Active stochastic depth: per-sample bernoulli/keep multipliers enter
    the kernel and must scale exactly the two residual branches."""
    inputs, window, heads = block_case(shifted=True, seed=6)
    b = inputs[0].shape[0]
    keep = 0.5
    rng = np.random.RandomState(9)
    inputs[15] = jnp.asarray(
        rng.binomial(1, keep, (b, 1)).astype(np.float32) / keep)
    inputs[16] = jnp.asarray(
        rng.binomial(1, keep, (b, 1)).astype(np.float32) / keep)
    got = PB.fused_swin_block(*inputs, window, heads, 1e-5, True)
    ref = PB._decomposed(*inputs[:15], inputs[15], inputs[16],
                         window=window, num_heads=heads, ln_eps=1e-5,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_model_block_train_drop_path_matches_xla(monkeypatch):
    """Train mode (deterministic=False, dp_rate>0, live rng): the fused
    block's bernoulli/keep multipliers must reproduce the XLA path's
    drop_path draws bit-for-bit (same keys, same element count)."""
    from lrce_tpu.models import swin3d as S

    rng = np.random.RandomState(11)
    c, heads, window = 64, 4, (2, 3, 3)
    x = jnp.asarray(rng.randn(4, 2, 6, 9, c).astype(np.float32))
    params = S.swin_init(jax.random.PRNGKey(0), S.SwinConfig(
        embed_dim=c, depths=(2, 1, 1, 1), num_heads=(heads,) * 4,
        window_size=window))
    p = jax.tree.map(lambda t: t[0], params["stages"][0]["blocks"])
    rel_index = jnp.asarray(S.relative_position_index(window))

    orig_block = PB._block_fwd_impl
    monkeypatch.setattr(PB, "_block_fwd_impl",
                        lambda *a, **k: orig_block(
                            *a, **{**k, "interpret": True}))

    kw = dict(num_heads=heads, window=window, rel_index=rel_index,
              dp_rate=0.4, deterministic=False,
              rng=jax.random.PRNGKey(42))
    got = S.swin_block(p, x, shift=(0, 0, 0), mask=None,
                       use_pallas="full", **kw)
    ref = S.swin_block(p, x, shift=(0, 0, 0), mask=None,
                       use_pallas=False, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_block_vjp_matches_decomposed_grad():
    inputs, window, heads = block_case(shifted=True, seed=4)

    def loss_fused(*a):
        return jnp.sum(jnp.square(
            PB.fused_swin_block(*a, window, heads, 1e-5, True)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(PB._decomposed(
            *a, window=window, num_heads=heads, ln_eps=1e-5,
            interpret=True)))

    nums = (0, 1, 3, 9, 10, 11, 12, 13, 14)
    g_fused = jax.grad(loss_fused, argnums=nums)(*inputs)
    g_ref = jax.grad(loss_ref, argnums=nums)(*inputs)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_block_vjp_with_drop_path_matches_decomposed_grad():
    inputs, window, heads = block_case(shifted=False, seed=8, sentinel=True)
    b = inputs[0].shape[0]
    rng = np.random.RandomState(13)
    inputs[15] = jnp.asarray(
        rng.binomial(1, 0.5, (b, 1)).astype(np.float32) / 0.5)
    inputs[16] = jnp.asarray(
        rng.binomial(1, 0.5, (b, 1)).astype(np.float32) / 0.5)

    def loss_fused(*a):
        return jnp.sum(jnp.square(
            PB.fused_swin_block(*a, window, heads, 1e-5, True)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(PB._decomposed(
            *a, window=window, num_heads=heads, ln_eps=1e-5,
            interpret=True)))

    nums = (0, 3, 9, 11, 12, 13, 14)
    g_fused = jax.grad(loss_fused, argnums=nums)(*inputs)
    g_ref = jax.grad(loss_ref, argnums=nums)(*inputs)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_model_block_routes_through_fused_block(monkeypatch):
    """swin_block with use_pallas='full' + deterministic must produce the
    XLA path's output (rolls included) through the whole-block kernel."""
    from lrce_tpu.models import swin3d as S

    rng = np.random.RandomState(7)
    c, heads, window = 64, 4, (2, 3, 3)
    x = jnp.asarray(rng.randn(2, 2, 6, 9, c).astype(np.float32))
    params = S.swin_init(jax.random.PRNGKey(0), S.SwinConfig(
        embed_dim=c, depths=(2, 1, 1, 1), num_heads=(heads,) * 4,
        window_size=window))
    p = jax.tree.map(lambda t: t[0], params["stages"][0]["blocks"])
    rel_index = jnp.asarray(S.relative_position_index(window))
    shift = tuple(s // 2 for s in window)
    mask = jnp.asarray(S.compute_shift_mask((2, 6, 9), window, shift))

    # interpret-mode kernels on CPU: patch the impls the model calls
    orig_block = PB._block_fwd_impl
    monkeypatch.setattr(PB, "_block_fwd_impl",
                        lambda *a, **k: orig_block(
                            *a, **{**k, "interpret": True}))

    kw = dict(num_heads=heads, window=window, rel_index=rel_index,
              dp_rate=0.0, deterministic=True, rng=None)
    got = S.swin_block(p, x, shift=shift, mask=mask, use_pallas="full", **kw)
    ref = S.swin_block(p, x, shift=shift, mask=mask, use_pallas=False, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# fused_ln_mlp: the standalone LN2+MLP+residual op (stage3 routing — the
# whole-block kernel is gated to C<=512, so stage3's MLP streams FF-blocked
# weights through this kernel instead of running the XLA MLP)
# ---------------------------------------------------------------------------

def _ln_mlp_case(c=64, b=2, d=2, h=6, w=9, seed=3, dp=False):
    rng = np.random.RandomState(seed)
    ff = 4 * c
    h1 = jnp.asarray(rng.randn(b, d, h, w, c).astype(np.float32))
    a = (jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
         jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
         jnp.asarray((rng.randn(c, ff) / np.sqrt(c)).astype(np.float32)),
         jnp.asarray(rng.randn(ff).astype(np.float32) * 0.02),
         jnp.asarray((rng.randn(ff, c) / np.sqrt(ff)).astype(np.float32)),
         jnp.asarray(rng.randn(c).astype(np.float32) * 0.02))
    dp2 = (jnp.asarray([[2.0], [0.0]], jnp.float32) if dp
           else jnp.ones((1, 1), jnp.float32))
    return h1, a, dp2


def _ln_mlp_oracle(h1, a, dp2):
    from lrce_tpu.ops.nn import dense, gelu, layer_norm

    ln2s, ln2b, w1, b1, w2, b2 = a
    z = layer_norm({"scale": ln2s, "bias": ln2b}, h1, eps=1e-5)
    z = dense({"w": w2, "b": b2}, gelu(dense({"w": w1, "b": b1}, z)))
    if dp2.shape[0] == h1.shape[0]:
        z = z * dp2.reshape((h1.shape[0],) + (1,) * (z.ndim - 1))
    return h1 + z


@pytest.mark.parametrize("ffc,dp", [(1, False), (4, False), (2, True)])
def test_fused_ln_mlp_matches_oracle(ffc, dp):
    h1, a, dp2 = _ln_mlp_case(dp=dp)
    got = PB._ln_mlp_fwd_impl(h1, *a, dp2, ln_eps=1e-5, interpret=True,
                              ff_chunks=ffc)
    ref = _ln_mlp_oracle(h1, a, dp2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_ln_mlp_vjp_matches_xla_grad():
    h1, a, dp2 = _ln_mlp_case(seed=4)

    def loss_fused(h1, w1, ln2s):
        a2 = (ln2s, a[1], w1) + a[3:]
        return jnp.sum(PB.fused_ln_mlp(h1, *a2, dp2, 1e-5, True) ** 2)

    def loss_ref(h1, w1, ln2s):
        a2 = (ln2s, a[1], w1) + a[3:]
        return jnp.sum(_ln_mlp_oracle(h1, a2, dp2) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(h1, a[2], a[0])
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(h1, a[2], a[0])
    for got, want in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_model_hsplit_block_routes_mlp_through_fused(monkeypatch):
    """swin_block with use_pallas='hsplit' (the stage3 route) under
    LRCE_TPU_LNMLP=1 must produce the XLA path's output with the MLP
    running through fused_ln_mlp (XLA primal + fused Pallas MLP
    backward; opt-in because the XLA VJP measured faster on-chip)."""
    from lrce_tpu.models import swin3d as S

    monkeypatch.setenv("LRCE_TPU_LNMLP", "1")

    rng = np.random.RandomState(11)
    c, heads, window = 64, 4, (2, 3, 3)
    x = jnp.asarray(rng.randn(2, 2, 6, 9, c).astype(np.float32))
    params = S.swin_init(jax.random.PRNGKey(0), S.SwinConfig(
        embed_dim=c, depths=(2, 1, 1, 1), num_heads=(heads,) * 4,
        window_size=window))
    p = jax.tree.map(lambda t: t[0], params["stages"][0]["blocks"])
    rel_index = jnp.asarray(S.relative_position_index(window))
    shift = tuple(s // 2 for s in window)
    mask = jnp.asarray(S.compute_shift_mask((2, 6, 9), window, shift))

    calls = []
    orig = PB.fused_ln_mlp
    monkeypatch.setattr(PB, "fused_ln_mlp",
                        lambda *a, **k: (calls.append(1),
                                         orig(*a, **k))[1])

    kw = dict(num_heads=heads, window=window, rel_index=rel_index,
              dp_rate=0.0, deterministic=True, rng=None, interpret=True)
    got = S.swin_block(p, x, shift=shift, mask=mask, use_pallas="hsplit",
                       **kw)
    ref = S.swin_block(p, x, shift=shift, mask=mask, use_pallas=False, **kw)
    assert calls, "hsplit block did not route its MLP through fused_ln_mlp"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
