"""Pallas fused window-attention kernel: exact semantics vs the XLA path
(interpret mode on CPU), including shifted masks and the custom VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lrce_tpu.models.swin3d import compute_shift_mask, relative_position_index
from lrce_tpu.ops import pallas_window_attn as PW


def setup_case(b=2, d=2, h=6, w=9, c=64, heads=4, window=(2, 3, 3),
               shifted=True, seed=0):
    rng = np.random.RandomState(seed)
    n = window[0] * window[1] * window[2]
    nd, nh, nw = d // window[0], h // window[1], w // window[2]
    x = rng.randn(b, d, h, w, c).astype(np.float32)
    args = dict(
        ln_scale=rng.rand(c).astype(np.float32) + 0.5,
        ln_bias=rng.randn(c).astype(np.float32) * 0.1,
        qkv_w=(rng.randn(c, 3 * c) / np.sqrt(c)).astype(np.float32),
        qkv_b=rng.randn(3 * c).astype(np.float32) * 0.02,
        proj_w=(rng.randn(c, c) / np.sqrt(c)).astype(np.float32),
        proj_b=rng.randn(c).astype(np.float32) * 0.02,
    )
    full_idx = relative_position_index(window)
    table = (rng.randn((2 * window[0] - 1) * (2 * window[1] - 1)
                       * (2 * window[2] - 1), heads) * 0.02).astype(np.float32)
    rel_bias = table[full_idx[:n, :n]].transpose(2, 0, 1)  # (H, N, N)
    if shifted:
        shift = tuple(s // 2 for s in window)
        mask = compute_shift_mask((d, h, w), window, shift)
        mask = mask.reshape(nd, nh, nw, n, n)
    else:
        mask = np.zeros((nd, nh, nw, n, n), np.float32)
    return (jnp.asarray(x), *(jnp.asarray(v) for v in args.values()),
            jnp.asarray(rel_bias), jnp.asarray(mask)), window, heads


@pytest.mark.parametrize("shifted", [False, True])
def test_kernel_matches_xla_equivalent(shifted):
    inputs, window, heads = setup_case(shifted=shifted)
    got = PW.fused_window_attention(*inputs, window, heads, 1e-5, True)
    ref = PW._xla_equivalent(*inputs, window=window, num_heads=heads,
                             ln_eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_kh2_blocking_matches_xla():
    """Multi-h-row blocking (kh_rows=2) must be numerically identical."""
    inputs, window, heads = setup_case(h=12, shifted=True, seed=2)
    got = PW._fused_fwd_impl(*inputs, window=window, num_heads=heads,
                             ln_eps=1e-5, interpret=True, kh_rows=2)
    ref = PW._xla_equivalent(*inputs, window=window, num_heads=heads,
                             ln_eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_odd_channel_heads():
    # c=48, 3 heads -> hd=16 (sub-lane slicing path)
    inputs, window, heads = setup_case(c=48, heads=3, seed=1)
    got = PW.fused_window_attention(*inputs, window, heads, 1e-5, True)
    ref = PW._xla_equivalent(*inputs, window=window, num_heads=heads,
                             ln_eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_xla_grad():
    inputs, window, heads = setup_case(b=1, d=2, h=3, w=3, c=32, heads=2,
                                       window=(2, 3, 3), shifted=False)

    def loss_pallas(x, *rest):
        out = PW.fused_window_attention(x, *rest, window, heads, 1e-5, True)
        return jnp.sum(out * out)

    def loss_xla(x, *rest):
        out = PW._xla_equivalent(x, *rest, window=window, num_heads=heads,
                                 ln_eps=1e-5)
        return jnp.sum(out * out)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 3))(*inputs)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 3))(*inputs)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
