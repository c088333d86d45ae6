"""Fused bias-add + LeakyReLU + scale (StyleGAN2 fused_act).

TPU-native equivalent of the reference CUDA kernel
(basicsr/ops/fused_act/src/fused_bias_act_kernel.cu, wrapper
fused_act.py:88-89): out = leaky_relu(x + bias) * scale with
scale = sqrt(2) by default. On TPU, XLA fuses this chain anyway; the Pallas
kernel exists for surface parity with the reference's native op and as the
single-pass VPU implementation, with a custom VJP matching the CUDA
grad/gradgrad kernels (act/grad switch, fused_bias_act_kernel.cu:38-40).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_leaky_relu(x: jax.Array, bias: jax.Array,
                     negative_slope: float = 0.2,
                     scale: float = 2 ** 0.5) -> jax.Array:
    """x: (..., C) NHWC; bias: (C,)."""
    return _fused_fwd_impl(x, bias, negative_slope, scale)


def _fused_fwd_impl(x, bias, negative_slope, scale):
    if jax.default_backend() == 'tpu' and x.ndim >= 2:
        try:
            return _fused_pallas(x, bias, negative_slope, scale)
        except Exception:  # pragma: no cover
            pass
    y = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(y >= 0, y, y * negative_slope) * scale


def _fused_pallas(x, bias, negative_slope, scale):
    """Single-pass VPU kernel: bias-add + leaky + scale."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)

    def kernel(x_ref, b_ref, o_ref):
        y = x_ref[:] + b_ref[:]
        o_ref[:] = jnp.where(y >= 0, y, y * negative_slope) * scale

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2, bias.reshape(1, c).astype(x.dtype))
    return out.reshape(shape)


def _fused_fwd(x, bias, negative_slope, scale):
    out = _fused_fwd_impl(x, bias, negative_slope, scale)
    # residual: sign of (x + bias), like the CUDA kernel's saved 'out'
    return out, (out,)


def _fused_bwd(negative_slope, scale, res, g):
    (out,) = res
    mask = out >= 0  # out and (x + bias) share sign (scale > 0)
    dx = jnp.where(mask, g, g * negative_slope) * scale
    dbias = dx.reshape(-1, dx.shape[-1]).sum(0)
    return dx, dbias


fused_leaky_relu.defvjp(_fused_fwd, _fused_bwd)
