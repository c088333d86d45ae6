"""Opt-in int8 serving quantization for the VQGAN/CodeFormer conv stack.

The v5e MXU runs s8xs8->s32 at ~2x its bf16 rate; measured under XLA the
model's dominant conv (C64 3x3 @512^2) drops 4.80 -> 3.07 ms (1.56x) and
big matmuls gain ~1.5x (scripts/bench_int8.py). This module turns that
into an *opt-in, serving-only* path:

- weights: symmetric per-output-channel int8 (scale = amax/127 over the
  (kh, kw, cin) axes). Params stay bf16/f32 in the checkpoint; the
  quantize is re-traced each call and costs nothing at conv scale.
- activations: symmetric per-tensor *dynamic* int8. The abs-max reduce
  reads the conv input once; XLA fuses it into the producing
  GroupNorm/silu chain, so it's cheaper than it looks — but the honest
  in-model cost is measured interleaved on hardware (docs/roofline.md).
- accumulation: int32 on the MXU (`preferred_element_type`), dequant to
  the model dtype with the combined scale, bias added in model dtype.

Scope deliberately mirrors where the FLOPs are: FastConv3x3 (all
ResBlock convs), Downsample, and the phase-collapsed Upsample conv.
Attention (16^2), the transformer, VQ lookup, and all 1x1 projections
stay bf16 — they are <5% of the forward budget.

Serving-only: the quantize round has zero gradient, so the training
entry points force the mode off (train/train.py), same contract as the
colpack kernels. Reference parity note: the reference has no quantized
path at all (inference_codeformer.py runs f32 CUDA); this is a
TPU-native extra, default OFF, quality-gated by tests/test_int8.py.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def _env_mode() -> str:
    v = os.environ.get('CODEFORMER_QUANT', 'off')
    if v not in ('int8', 'off'):
        import warnings
        warnings.warn(f'CODEFORMER_QUANT={v!r} is not one of '
                      f"'int8'/'off'; ignoring (mode stays off)")
        return 'off'
    return v


_QUANT_MODE = _env_mode()


def set_quant_mode(mode: str) -> None:
    """'int8' or 'off'. Call before the first jit trace of the model;
    traces cache the dispatch decision."""
    global _QUANT_MODE
    assert mode in ('int8', 'off'), mode
    _QUANT_MODE = mode


def quant_mode() -> str:
    return _QUANT_MODE


def quant_active(module) -> bool:
    """Should `module` (a flax module mid-__call__) take the int8 path?"""
    return _QUANT_MODE == 'int8' and not module.is_initializing()


def quantize_act(x: jax.Array):
    """Symmetric per-tensor dynamic int8. Returns (x_q int8, scale f32)."""
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), _EPS) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return xq.astype(jnp.int8), s


def quantize_weight(k: jax.Array):
    """Symmetric per-output-channel int8 for an HWIO (or IO) kernel.
    Returns (k_q int8, scale f32 of shape (Cout,))."""
    red = tuple(range(k.ndim - 1))
    s = jnp.maximum(jnp.max(jnp.abs(k.astype(jnp.float32)), axis=red),
                    _EPS) / 127.0
    kq = jnp.clip(jnp.round(k.astype(jnp.float32) / s), -127, 127)
    return kq.astype(jnp.int8), s


def conv_int8(x: jax.Array, kernel: jax.Array, strides=(1, 1),
              padding='SAME') -> jax.Array:
    """Drop-in for lax.conv_general_dilated(x, kernel, strides, padding)
    in NHWC/HWIO, computed s8xs8->s32 on the MXU and dequantized to
    x.dtype. No bias (add it outside, in model dtype)."""
    dtype = x.dtype
    xq, sx = quantize_act(x)
    kq, sw = quantize_weight(kernel)
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))
    y = lax.conv_general_dilated(xq, kq, strides, padding,
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(dtype)


def conv_int8_prequant(xq: jax.Array, sx: jax.Array, kernel: jax.Array,
                       strides=(1, 1), padding='SAME',
                       out_dtype=jnp.bfloat16) -> jax.Array:
    """Same as conv_int8 but the activation is already quantized —
    lets one quantize feed several convs (phase-collapsed upsample)."""
    kq, sw = quantize_weight(kernel)
    dn = lax.conv_dimension_numbers(xq.shape, kernel.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))
    y = lax.conv_general_dilated(xq, kq, strides, padding,
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
