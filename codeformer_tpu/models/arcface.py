"""ResNetArcFace identity network — flax NHWC.

Behavioral spec: basicsr/archs/arcface_arch.py (IRBlock/SEBlock ResNet over
1-channel 128x128 faces -> 512-d identity embedding). Registered for parity
with the reference surface; like the reference, no shipped config uses it
(identity-loss hook from the GFPGAN lineage).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from codeformer_tpu.utils.registry import ARCH_REGISTRY


class PReLU(nn.Module):
    """Single-parameter PReLU; the learnable slope is stored as 'scale' so
    the generic torch converter (1-D weight -> scale) maps it."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.param('scale', nn.initializers.constant(0.25), (1,),
                       jnp.float32).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


def _bn(name, dtype):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        momentum=0.9, dtype=dtype, name=name)


class SEBlock(nn.Module):
    """Squeeze-and-excitation (arcface_arch.py:149-170). fc Sequential
    indices: 0 Linear, 1 PReLU, 2 Linear, 3 Sigmoid."""
    channel: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.Dense(self.channel // self.reduction, dtype=self.dtype,
                     name='fc_0')(y)
        y = PReLU(dtype=self.dtype, name='fc_1')(y)
        y = nn.Dense(self.channel, dtype=self.dtype, name='fc_2')(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class IRBlock(nn.Module):
    """Improved residual block (arcface_arch.py:56-101)."""
    planes: int
    stride: int = 1
    has_downsample: bool = False
    use_se: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        prelu = PReLU(dtype=self.dtype, name='prelu')  # shared, like torch
        out = _bn('bn0', self.dtype)(x)
        out = nn.Conv(in_ch, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name='conv1')(out)
        out = _bn('bn1', self.dtype)(out)
        out = prelu(out)
        out = nn.Conv(self.planes, (3, 3),
                      strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name='conv2')(out)
        out = _bn('bn2', self.dtype)(out)
        if self.use_se:
            out = SEBlock(self.planes, dtype=self.dtype, name='se')(out)
        residual = x
        if self.has_downsample:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_0')(x)
            residual = _bn('downsample_1', self.dtype)(residual)
        out = out + residual
        return prelu(out)


@ARCH_REGISTRY.register()
class ResNetArcFace(nn.Module):
    """ArcFace ResNet (arcface_arch.py:172-243). Input: (B, 128, 128, 1)
    grayscale; output: (B, 512) embedding."""
    block: str = 'IRBlock'
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    use_se: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.block == 'IRBlock', 'only IRBlock is shipped'
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        x = _bn('bn1', self.dtype)(x)
        x = PReLU(dtype=self.dtype, name='prelu')(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))

        inplanes = 64
        for li, (planes, n) in enumerate(zip((64, 128, 256, 512),
                                             self.layers), start=1):
            stride = 1 if li == 1 else 2
            x = IRBlock(planes, stride,
                        has_downsample=(stride != 1 or inplanes != planes),
                        use_se=self.use_se, dtype=self.dtype,
                        name=f'layer{li}_0')(x)
            for bi in range(1, n):
                x = IRBlock(planes, use_se=self.use_se, dtype=self.dtype,
                            name=f'layer{li}_{bi}')(x)
            inplanes = planes

        x = _bn('bn4', self.dtype)(x)
        # flatten in torch NCHW order so fc5 weights convert 1:1
        b = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        x = nn.Dense(512, dtype=self.dtype, name='fc5')(x)
        return _bn('bn5', self.dtype)(x)
