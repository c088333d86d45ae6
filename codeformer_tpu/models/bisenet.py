"""BiSeNet face parser (alternative to ParseNet) — flax NHWC.

Behavioral spec: facelib/parsing/{bisenet.py,resnet.py} — ResNet18 context
path with attention refinement modules, feature fusion, three output heads
upsampled bilinearly (align_corners) to input size. Names mirror the torch
tree for `parsing_bisenet.pth` conversion.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from codeformer_tpu.utils.registry import ARCH_REGISTRY


def _bn(name, dtype):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        momentum=0.9, dtype=dtype, name=name)


class ConvBNReLU(nn.Module):
    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.padding
        x = nn.Conv(self.out_chan, (self.ks, self.ks),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name='conv')(x)
        return nn.relu(_bn('bn', self.dtype)(x))


class BasicBlock(nn.Module):
    out_chan: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.out_chan, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        r = nn.relu(_bn('bn1', self.dtype)(r))
        r = nn.Conv(self.out_chan, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='conv2')(r)
        r = _bn('bn2', self.dtype)(r)
        shortcut = x
        if self.has_downsample:
            shortcut = nn.Conv(self.out_chan, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_0')(x)
            shortcut = _bn('downsample_1', self.dtype)(shortcut)
        return nn.relu(shortcut + r)


class ResNet18(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.relu(_bn('bn1', self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        def layer(x, name, ch, stride):
            x = BasicBlock(ch, stride,
                           has_downsample=(stride != 1
                                           or x.shape[-1] != ch),
                           dtype=self.dtype, name=f'{name}_0')(x)
            return BasicBlock(ch, dtype=self.dtype, name=f'{name}_1')(x)

        x = layer(x, 'layer1', 64, 1)
        feat8 = layer(x, 'layer2', 128, 2)
        feat16 = layer(feat8, 'layer3', 256, 2)
        feat32 = layer(feat16, 'layer4', 512, 2)
        return feat8, feat16, feat32


class AttentionRefinementModule(nn.Module):
    out_chan: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.out_chan, dtype=self.dtype, name='conv')(x)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False,
                        dtype=self.dtype, name='conv_atten')(atten)
        atten = _bn('bn_atten', self.dtype)(atten)
        return feat * jax.nn.sigmoid(atten)


def _up_nearest(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[3]),
                            method='nearest')


def _up_bilinear_ac(x, hw):
    """Bilinear resize with align_corners=True (torch F.interpolate)."""
    b, h, w, c = x.shape
    oh, ow = hw
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class ContextPath(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat8, feat16, feat32 = ResNet18(dtype=self.dtype,
                                         name='resnet')(x)
        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, ks=1, padding=0, dtype=self.dtype,
                         name='conv_avg')(avg)
        avg_up = jnp.broadcast_to(
            avg, (avg.shape[0], feat32.shape[1], feat32.shape[2], 128))

        feat32_arm = AttentionRefinementModule(128, dtype=self.dtype,
                                               name='arm32')(feat32)
        feat32_sum = feat32_arm + avg_up
        feat32_up = _up_nearest(feat32_sum, feat16.shape[1:3])
        feat32_up = ConvBNReLU(128, dtype=self.dtype,
                               name='conv_head32')(feat32_up)

        feat16_arm = AttentionRefinementModule(128, dtype=self.dtype,
                                               name='arm16')(feat16)
        feat16_sum = feat16_arm + feat32_up
        feat16_up = _up_nearest(feat16_sum, feat8.shape[1:3])
        feat16_up = ConvBNReLU(128, dtype=self.dtype,
                               name='conv_head16')(feat16_up)
        return feat8, feat16_up, feat32_up


class FeatureFusionModule(nn.Module):
    out_chan: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fsp, fcp):
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBNReLU(self.out_chan, ks=1, padding=0,
                          dtype=self.dtype, name='convblk')(fcat)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name='conv1')(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False,
                        dtype=self.dtype, name='conv2')(atten)
        atten = jax.nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid_chan: int
    num_class: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.mid_chan, dtype=self.dtype, name='conv')(x)
        out = nn.Conv(self.num_class, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv_out')(feat)
        return out, feat


@ARCH_REGISTRY.register()
class BiSeNet(nn.Module):
    num_class: int = 19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_feat: bool = False):
        h, w = x.shape[1:3]
        feat_res8, feat_cp8, feat_cp16 = ContextPath(dtype=self.dtype,
                                                     name='cp')(x)
        feat_fuse = FeatureFusionModule(256, dtype=self.dtype,
                                        name='ffm')(feat_res8, feat_cp8)
        out, feat = BiSeNetOutput(256, self.num_class, dtype=self.dtype,
                                  name='conv_out')(feat_fuse)
        out16, feat16 = BiSeNetOutput(64, self.num_class,
                                      dtype=self.dtype,
                                      name='conv_out16')(feat_cp8)
        out32, feat32 = BiSeNetOutput(64, self.num_class,
                                      dtype=self.dtype,
                                      name='conv_out32')(feat_cp16)
        out = _up_bilinear_ac(out, (h, w))
        out16 = _up_bilinear_ac(out16, (h, w))
        out32 = _up_bilinear_ac(out32, (h, w))
        if return_feat:
            feat = _up_bilinear_ac(feat, (h, w))
            feat16 = _up_bilinear_ac(feat16, (h, w))
            feat32 = _up_bilinear_ac(feat32, (h, w))
            return out, out16, out32, feat, feat16, feat32
        return out, out16, out32
