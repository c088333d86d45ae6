"""upfirdn2d — upsample, FIR filter, downsample (StyleGAN2 op).

TPU-native equivalent of the reference CUDA kernel
(basicsr/ops/upfirdn2d/src/upfirdn2d_kernel.cu + upfirdn2d.py): zero-stuff
upsample by (up_x, up_y), pad, correlate with the (flipped) 2D FIR kernel,
stride-downsample. Implemented as ONE lax.conv_general_dilated call —
lhs_dilation does the zero-stuffing, window_strides the downsampling, so
XLA lowers it straight to the MXU conv path and autodiff provides the exact
transpose-kernel gradient the CUDA version hand-codes
(upfirdn2d.py:24-64).
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def upfirdn2d(x: jax.Array, kernel: jax.Array, up: int = 1, down: int = 1,
              pad: Union[Tuple[int, int], Tuple[int, int, int, int]]
              = (0, 0)) -> jax.Array:
    """x: (B, H, W, C) NHWC (the reference is NCHW); kernel: (kh, kw).

    pad: (pad0, pad1) applied to both axes, or (px0, px1, py0, py1).
    Matches upfirdn2d_native (upfirdn2d.py:149-186) semantics.
    """
    if len(pad) == 2:
        px0, px1, py0, py1 = pad[0], pad[1], pad[0], pad[1]
    else:
        px0, px1, py0, py1 = pad
    b, h, w, c = x.shape
    kh, kw = kernel.shape

    # flip: upfirdn correlates with the flipped kernel (true convolution)
    k = jnp.flip(kernel, (0, 1)).astype(jnp.float32)
    k = k[:, :, None, None]  # HWIO with I=O=1, applied depthwise

    dn = jax.lax.conv_dimension_numbers(x.shape, (kh, kw, 1, 1),
                                        ('NHWC', 'HWIO', 'NHWC'))
    k = jnp.tile(k, (1, 1, 1, c))
    # lhs_dilation puts (up-1) zeros BETWEEN samples; true zero-stuffing
    # also appends (up-1) trailing zeros — fold them into the high padding
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k,
        window_strides=(down, down),
        padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=dn,
        feature_group_count=c)
    return out.astype(x.dtype)


def upsample2d(x: jax.Array, kernel: jax.Array, factor: int = 2,
               gain: float = 1.0) -> jax.Array:
    """StyleGAN2 upsample (upfirdn2d wrapper semantics)."""
    kh = kernel.shape[0]
    k = kernel * (gain * factor ** 2)
    p = kh - factor
    return upfirdn2d(x, k, up=factor, down=1,
                     pad=((p + 1) // 2 + factor - 1, p // 2,
                          (p + 1) // 2 + factor - 1, p // 2))


def downsample2d(x: jax.Array, kernel: jax.Array, factor: int = 2,
                 gain: float = 1.0) -> jax.Array:
    kh = kernel.shape[0]
    k = kernel * gain
    p = kh - factor
    return upfirdn2d(x, k, up=1, down=factor,
                     pad=((p + 1) // 2, p // 2, (p + 1) // 2, p // 2))


def make_resample_kernel(k: Sequence[int]) -> jax.Array:
    """1D list -> normalized 2D separable kernel (upfirdn2d.py usage)."""
    k1 = jnp.asarray(k, jnp.float32)
    k2 = jnp.outer(k1, k1)
    return k2 / jnp.sum(k2)
