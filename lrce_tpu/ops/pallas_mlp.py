"""Pallas fused LayerNorm + MLP + residual for transformer blocks.

Computes out = x + fc2(gelu(fc1(LN(x)))) in one VMEM-resident program per
(batch, depth-slice) grid cell: the activation is read once and written once,
removing the separate LN / gelu / residual HBM passes that dominate the
bandwidth-bound Swin stages. Weights stay resident in VMEM across the grid.

Backward reuses the XLA-equivalent computation via custom_vjp (fast fwd,
correct-by-construction bwd), like ops/pallas_window_attn.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_f32(x):
    """XLA's f32 erf rational approximation (Mosaic has no erf primitive);
    matches jax.lax.erf to f32 precision on the clamped domain."""
    alpha = (-2.72614225801306e-10, 2.77068142495902e-08,
             -2.10102402082508e-06, -5.69250639462346e-05,
             -7.34990630326855e-04, -2.95459980854025e-03,
             -1.60960333262415e-02)
    beta = (-1.45660718464996e-05, -2.13374055278905e-04,
            -1.68282697438203e-03, -7.37332916720468e-03,
            -1.42647390514189e-02)
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.full_like(x, alpha[0])
    for a in alpha[1:]:
        p = p * x2 + a
    p = p * x
    q = jnp.full_like(x, beta[0])
    for b in beta[1:]:
        q = q * x2 + b
    return jnp.clip(p / q, -1.0, 1.0)


def _kernel(x_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *, ln_eps: float):
    x = x_ref[0, 0]  # (H, W, C)
    h, w, c = x.shape
    dt = x.dtype
    flat = x.reshape(h * w, c)

    xf = flat.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    y = (y * ln_scale_ref[:].astype(jnp.float32)
         + ln_bias_ref[:].astype(jnp.float32)).astype(dt)

    hmid = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    hmid = hmid + b1_ref[:].astype(jnp.float32)
    # exact (erf) GELU in f32
    hmid = hmid * 0.5 * (1.0 + _erf_f32(hmid * (1.0 / math.sqrt(2.0))))
    hmid = hmid.astype(dt)

    out = jnp.dot(hmid, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32)
    out = flat.astype(jnp.float32) + out  # residual
    out_ref[0, 0] = out.astype(dt).reshape(h, w, c)


def _xla_equivalent(x, ln_scale, ln_bias, w1, b1, w2, b2, *, ln_eps):
    from lrce_tpu.ops.nn import dense, gelu, layer_norm

    y = layer_norm({"scale": ln_scale, "bias": ln_bias}, x, eps=ln_eps)
    y = dense({"w": w2, "b": b2}, gelu(dense({"w": w1, "b": b1}, y)))
    return x + y


def _fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, *, ln_eps, interpret):
    b, d, h, w, c = x.shape
    ff = w1.shape[1]
    grid = (b, d)
    kernel = functools.partial(_kernel, ln_eps=ln_eps)
    flops = 2 * b * d * h * w * c * ff * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, h, w, c), lambda bi, di: (bi, di, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w, c),
                               lambda bi, di: (bi, di, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=x.size * 4,
                                      transcendentals=b * d * h * w * ff),
        # f32 activations (eval parity runs) put the live set ~80 KB over
        # Mosaic's 16 MB default scoped-vmem budget. Raise it ONLY for f32:
        # bf16 fits the default, and a raised budget on large-grid bf16
        # programs faults the TPU worker on this backend (see
        # pallas_window_attn._fused_fwd_impl).
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20)
                         if not interpret and x.dtype == jnp.float32
                         else None),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps=1e-5,
              interpret=False):
    """x: (B, D, H, W, C); w1: (C, FF); w2: (FF, C). Weights should already be
    in the activation dtype."""
    return _fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps=ln_eps,
                     interpret=interpret)


def _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps, interpret):
    out = _fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps=ln_eps,
                    interpret=interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _bwd(ln_eps, interpret, res, g):
    def f(*args):
        return _xla_equivalent(*args, ln_eps=ln_eps)

    _, vjp = jax.vjp(f, *res)
    return vjp(g)


fused_mlp.defvjp(_fwd, _bwd)
