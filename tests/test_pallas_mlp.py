"""Fused LN+MLP+residual kernel: exact semantics + VJP vs the XLA path."""

import numpy as np

import jax
import jax.numpy as jnp

from lrce_tpu.ops import pallas_mlp as PM


def setup(b=2, d=2, h=4, w=6, c=32, ff=64, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(v) for v in (
        rng.randn(b, d, h, w, c).astype(np.float32),
        rng.rand(c).astype(np.float32) + 0.5,
        rng.randn(c).astype(np.float32) * 0.1,
        (rng.randn(c, ff) / np.sqrt(c)).astype(np.float32),
        rng.randn(ff).astype(np.float32) * 0.02,
        (rng.randn(ff, c) / np.sqrt(ff)).astype(np.float32),
        rng.randn(c).astype(np.float32) * 0.02,
    ))


def test_fused_mlp_matches_xla():
    inputs = setup()
    got = PM.fused_mlp(*inputs, 1e-5, True)
    ref = PM._xla_equivalent(*inputs, ln_eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_mlp_vjp_matches_xla():
    inputs = setup(b=1, d=1, h=3, w=3)

    def lp(x, *rest):
        return jnp.sum(PM.fused_mlp(x, *rest, 1e-5, True) ** 2)

    def lx(x, *rest):
        return jnp.sum(PM._xla_equivalent(x, *rest, ln_eps=1e-5) ** 2)

    g1 = jax.grad(lp, argnums=(0, 3, 5))(*inputs)
    g2 = jax.grad(lx, argnums=(0, 3, 5))(*inputs)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
