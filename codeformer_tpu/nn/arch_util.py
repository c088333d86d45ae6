"""Shared architecture utilities (reference: basicsr/archs/arch_util.py):
initializers, flow warping, pixel unshuffle, and the DCNv2 pack module used
by EDVR-style alignment."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from codeformer_tpu.models.rrdbnet import pixel_unshuffle  # re-export
from codeformer_tpu.ops.deform_conv import modulated_deform_conv2d

__all__ = ['default_init_weights', 'scaled_kaiming_init', 'trunc_normal_',
           'flow_warp', 'pixel_unshuffle', 'DCNv2Pack', 'resize_flow',
           'make_layer']


def make_layer(block_cls, num_blocks: int, **kwargs):
    """List of `num_blocks` module instances (the flax analog of the
    reference's Sequential factory, arch_util.py:48-60); apply them in
    order inside the parent module."""
    return [block_cls(**kwargs) for _ in range(num_blocks)]


def scaled_kaiming_init(scale: float = 1.0):
    """Kaiming-normal (fan_in) scaled by `scale` — the flax initializer
    analog of default_init_weights (arch_util.py:18-45)."""
    base = nn.initializers.variance_scaling(2.0, 'fan_in', 'normal')

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale
    return init


# alias with the reference's name
default_init_weights = scaled_kaiming_init


def trunc_normal_(key, shape, mean=0.0, std=1.0, a=-2.0, b=2.0,
                  dtype=jnp.float32):
    """Truncated normal init (arch_util.py:277-317 semantics)."""
    lo = (a - mean) / std
    hi = (b - mean) / std
    return mean + std * jax.random.truncated_normal(key, lo, hi, shape,
                                                    dtype)


def flow_warp(x: jax.Array, flow: jax.Array,
              interp_mode: str = 'bilinear',
              padding_mode: str = 'zeros',
              align_corners: bool = True) -> jax.Array:
    """Warp an NHWC image/feature map with optical flow
    (arch_util.py:117-149): output(p) = x(p + flow(p)).

    flow: (B, H, W, 2) with (dx, dy) in pixels, like the torch version's
    grid_sample usage with align_corners=True.
    """
    assert interp_mode == 'bilinear', 'only bilinear is implemented'
    b, h, w, c = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    sx = gx[None] + flow[..., 0]
    sy = gy[None] + flow[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yy, xx):
        if padding_mode == 'zeros':
            valid = ((xx >= 0) & (xx < w) & (yy >= 0) & (yy < h))[..., None]
            yc = jnp.clip(yy, 0, h - 1)
            xc = jnp.clip(xx, 0, w - 1)
            vals = jax.vmap(lambda im, yv, xv: im[yv, xv])(x, yc, xc)
            return jnp.where(valid, vals, 0.0)
        yc = jnp.clip(yy, 0, h - 1)
        xc = jnp.clip(xx, 0, w - 1)
        return jax.vmap(lambda im, yv, xv: im[yv, xv])(x, yc, xc)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def resize_flow(flow: jax.Array, size_type: str, sizes,
                interp_mode: str = 'bilinear') -> jax.Array:
    """Resize + rescale a flow field (arch_util.py:152-187). NHWC (.., 2)."""
    b, h, w, _ = flow.shape
    if size_type == 'ratio':
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == 'shape':
        out_h, out_w = sizes[0], sizes[1]
    else:
        raise ValueError(f'size_type {size_type}')
    ratio_h = out_h / h
    ratio_w = out_w / w
    resized = jax.image.resize(flow, (b, out_h, out_w, 2),
                               method='bilinear')
    return resized * jnp.asarray([ratio_w, ratio_h], flow.dtype)


class DCNv2Pack(nn.Module):
    """Modulated deformable conv pack: offsets/masks predicted from a guide
    feature (arch_util.py:209-237). The guide (`feat`) is typically the
    concatenation driving EDVR alignment."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    deformable_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, feat: jax.Array) -> jax.Array:
        k = self.kernel_size
        n = self.deformable_groups * 3 * k * k
        out = nn.Conv(n, (k, k), strides=(self.stride, self.stride),
                      padding=((self.padding, self.padding),
                               (self.padding, self.padding)),
                      dtype=self.dtype, name='conv_offset')(feat)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        # interleave to per-tap (dy, dx) pairs like torchvision
        b, h, w, _ = offset.shape
        taps = k * k
        offset = jnp.stack([o1.reshape(b, h, w, taps),
                            o2.reshape(b, h, w, taps)],
                           axis=-1).reshape(b, h, w, 2 * taps)
        mask = jax.nn.sigmoid(mask)
        weight = self.param(
            'weight', nn.initializers.variance_scaling(2.0, 'fan_in',
                                                       'normal'),
            (k, k, x.shape[-1], self.out_channels), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        return modulated_deform_conv2d(
            x, offset, mask, weight.astype(self.dtype),
            bias.astype(self.dtype), self.stride, self.padding)
