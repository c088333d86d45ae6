"""ParseNet face-parsing network — flax NHWC.

Behavioral spec: facelib/parsing/parsenet.py — reflect-pad convs, an
encoder downsampling 512->32, a 10-block residual body, a decoder back to
512, and two output convs producing (19-class mask, image). Used by the
paste-back compositor to confine blending to face regions
(face_restoration_helper.py:459-487).

Module/parameter names mirror the torch structure (ConvLayer.conv2d,
NormLayer.norm nesting, Sequential indices flattened) so
`parsing_parsenet.pth` converts mechanically.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from codeformer_tpu.utils.registry import ARCH_REGISTRY


class _Norm(nn.Module):
    """NormLayer wrapper: inner module named 'norm' to match the torch
    nesting (parsenet.py:8-39)."""
    norm_type: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.norm_type == 'bn':
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                momentum=0.9, dtype=self.dtype,
                                name='norm')(x)
        if self.norm_type == 'none':
            return x
        raise NotImplementedError(self.norm_type)


class ConvLayer(nn.Module):
    """reflect-pad conv with optional x2 nearest up / stride-2 down and
    BN + LeakyReLU(0.2) (parsenet.py:74-110)."""
    out_ch: int
    kernel: int = 3
    scale: str = 'none'   # 'none' | 'down' | 'up' (int 1 behaves as 'none')
    norm_type: str = 'none'
    relu_type: str = 'none'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.scale == 'up':
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        pad = -(-(self.kernel - 1) // 2)  # ceil((k-1)/2)
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode='reflect')
        stride = 2 if self.scale == 'down' else 1
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(stride, stride), padding='VALID',
                    use_bias=(self.norm_type != 'bn'), dtype=self.dtype,
                    name='conv2d')(x)
        x = _Norm(self.norm_type, dtype=self.dtype, name='norm')(x)
        if self.relu_type == 'relu':
            x = nn.relu(x)
        elif self.relu_type == 'leakyrelu':
            x = nn.leaky_relu(x, 0.2)
        return x


class ResidualBlock(nn.Module):
    """Residual block with optional up/down scaling (parsenet.py:113-137)."""
    out_ch: int
    scale: str = 'none'
    relu_type: str = 'leakyrelu'
    norm_type: str = 'bn'
    identity_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.identity_shortcut:
            identity = x
        else:
            identity = ConvLayer(self.out_ch, 3, self.scale,
                                 dtype=self.dtype, name='shortcut_func')(x)
        scale_conf = {'down': ('none', 'down'), 'up': ('up', 'none'),
                      'none': ('none', 'none')}[self.scale]
        res = ConvLayer(self.out_ch, 3, scale_conf[0],
                        norm_type=self.norm_type, relu_type=self.relu_type,
                        dtype=self.dtype, name='conv1')(x)
        res = ConvLayer(self.out_ch, 3, scale_conf[1],
                        norm_type=self.norm_type, relu_type='none',
                        dtype=self.dtype, name='conv2')(res)
        return identity + res


@ARCH_REGISTRY.register()
class ParseNet(nn.Module):
    """Encoder (to min_feat_size) -> residual body -> decoder -> (mask, img).
    Defaults match init_parsing_model's ParseNet(in_size=512, out_size=512,
    parsing_ch=19) (facelib/parsing/__init__.py:13-14)."""
    in_size: int = 512
    out_size: int = 512
    min_feat_size: int = 32
    base_ch: int = 64
    parsing_ch: int = 19
    res_depth: int = 10
    relu_type: str = 'leakyrelu'
    norm_type: str = 'bn'
    ch_range: Tuple[int, int] = (32, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        import math
        min_ch, max_ch = self.ch_range
        clip = lambda c: max(min_ch, min(c, max_ch))  # noqa: E731
        mfs = min(self.in_size, self.min_feat_size)
        down_steps = int(math.log2(self.in_size // mfs))
        up_steps = int(math.log2(self.out_size // mfs))
        act = dict(norm_type=self.norm_type, relu_type=self.relu_type,
                   dtype=self.dtype)

        x = ConvLayer(self.base_ch, 3, 'none', dtype=self.dtype,
                      name='encoder_0')(x)
        head_ch = self.base_ch
        for i in range(down_steps):
            cin, cout = clip(head_ch), clip(head_ch * 2)
            x = ResidualBlock(cout, 'down',
                              identity_shortcut=False,
                              name=f'encoder_{i + 1}', **act)(x)
            head_ch *= 2

        feat = x
        for i in range(self.res_depth):
            ch = clip(head_ch)
            x = ResidualBlock(ch, 'none', identity_shortcut=True,
                              name=f'body_{i}', **act)(x)
        x = feat + x

        for i in range(up_steps):
            cin, cout = clip(head_ch), clip(head_ch // 2)
            x = ResidualBlock(cout, 'up',
                              identity_shortcut=False,
                              name=f'decoder_{i}', **act)(x)
            head_ch //= 2

        out_img = ConvLayer(3, 3, 'none', dtype=self.dtype,
                            name='out_img_conv')(x)
        out_mask = ConvLayer(self.parsing_ch, 3, 'none', dtype=self.dtype,
                             name='out_mask_conv')(x)
        return out_mask, out_img
