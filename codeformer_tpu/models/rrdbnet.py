"""RRDBNet (Real-ESRGAN generator) — flax NHWC.

Behavioral spec: basicsr/archs/rrdbnet_arch.py — pixel-unshuffle input for
scale 1/2, 23 RRDB blocks (3x dense blocks, 0.2 residual scaling), two
nearest-x2 upsample convs. Names mirror the torch tree for mechanical
conversion of RealESRGAN_x2plus.pth.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from codeformer_tpu.nn.blocks import FastConv3x3, _PhaseCollapsedUpConv
from codeformer_tpu.utils.registry import ARCH_REGISTRY

# plain 3x3 convs (phase packing measured slower in-model, see
# nn/blocks.FastConv3x3); the upsample convs use the fused form below
_Conv3 = FastConv3x3


def pixel_unshuffle(x: jax.Array, scale: int) -> jax.Array:
    """NHWC pixel-unshuffle matching torch channel order
    (basicsr/archs/arch_util.py:190-207): out channel = c*s*s + sh*s + sw."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // scale, scale, w // scale, scale, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // scale, w // scale, c * scale * scale)


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda ch, name: _Conv3(ch, dtype=self.dtype,  # noqa
                                       name=name)
        x1 = nn.leaky_relu(conv(self.num_grow_ch, 'conv1')(x), 0.2)
        x2 = nn.leaky_relu(conv(self.num_grow_ch, 'conv2')(
            jnp.concatenate((x, x1), -1)), 0.2)
        x3 = nn.leaky_relu(conv(self.num_grow_ch, 'conv3')(
            jnp.concatenate((x, x1, x2), -1)), 0.2)
        x4 = nn.leaky_relu(conv(self.num_grow_ch, 'conv4')(
            jnp.concatenate((x, x1, x2, x3), -1)), 0.2)
        x5 = conv(self.num_feat, 'conv5')(
            jnp.concatenate((x, x1, x2, x3, x4), -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    num_feat: int
    num_grow_ch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 self.dtype, name='rdb1')(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 self.dtype, name='rdb2')(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                 self.dtype, name='rdb3')(out)
        return out * 0.2 + x


@ARCH_REGISTRY.register()
class RRDBNet(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.scale == 2:
            feat = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat = pixel_unshuffle(x, 4)
        else:
            feat = x
        conv = lambda ch, name: _Conv3(ch, dtype=self.dtype,  # noqa
                                       name=name)
        feat = conv(self.num_feat, 'conv_first')(feat)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, self.dtype,
                        name=f'body_{i}')(body)
        feat = feat + conv(self.num_feat, 'conv_body')(body)
        # fused nearest-x2 + conv (4/9 FLOPs, no upsampled intermediate)
        upconv = lambda name: _PhaseCollapsedUpConv(  # noqa
            self.num_feat, dtype=self.dtype, name=name)
        feat = nn.leaky_relu(upconv('conv_up1')(feat), 0.2)
        feat = nn.leaky_relu(upconv('conv_up2')(feat), 0.2)
        return conv(self.num_out_ch, 'conv_last')(
            nn.leaky_relu(conv(self.num_feat, 'conv_hr')(feat), 0.2))
