"""RetinaFace face detector — TPU-native flax (NHWC), both backbones.

Behavioral spec: facelib/detection/retinaface/{retinaface.py,
retinaface_net.py} — ResNet50 or MobileNetV1(x0.25) backbone with taps at
strides 8/16/32, FPN with nearest-upsample merges, three SSH context
modules, and 1x1-conv class/bbox/landmark heads over 2 anchors per cell.

Module names mirror the torch state-dict structure (Sequential indices
flattened with underscores) so the released `detection_Resnet50_Final.pth` /
`detection_mobilenet0.25_Final.pth` convert mechanically. All BatchNorms run
in inference mode from converted running stats.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from codeformer_tpu.utils.registry import ARCH_REGISTRY


def _conv_bn(parent_x, prefix, out_ch, kernel=3, stride=1, leaky=0.0,
             relu=True, dtype=jnp.float32):
    """conv + BN (+ optional leaky relu) created in the CALLER's compact
    scope, named `<prefix>_0` / `<prefix>_1` to match torch nn.Sequential
    indices (retinaface_net.py:6-22). Plain function (not a Module) so no
    extra scope level appears between the parent and the layers."""
    pad = (kernel - 1) // 2
    x = nn.Conv(out_ch, (kernel, kernel), strides=(stride, stride),
                padding=((pad, pad), (pad, pad)), use_bias=False,
                dtype=dtype, name=f'{prefix}_0')(parent_x)
    x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                     momentum=0.9, dtype=dtype, name=f'{prefix}_1')(x)
    if relu:
        x = nn.leaky_relu(x, leaky) if leaky > 0 else nn.relu(x)
    return x


def _conv_dw(parent_x, prefix, in_ch, out_ch, stride=1, leaky=0.1,
             dtype=jnp.float32):
    """Depthwise-separable conv block of MobileNetV1
    (retinaface_net.py:25-33). Torch Sequential indices 0,1,3,4 ->
    names `<p>_0/_1/_3/_4`. Function, same scoping note as _conv_bn."""
    x = nn.Conv(in_ch, (3, 3), strides=(stride, stride),
                padding=((1, 1), (1, 1)), feature_group_count=in_ch,
                use_bias=False, dtype=dtype, name=f'{prefix}_0')(parent_x)
    x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9,
                     dtype=dtype, name=f'{prefix}_1')(x)
    x = nn.leaky_relu(x, leaky)
    x = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=dtype,
                name=f'{prefix}_3')(x)
    x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9,
                     dtype=dtype, name=f'{prefix}_4')(x)
    return nn.leaky_relu(x, leaky)


class Bottleneck(nn.Module):
    """torchvision-style ResNet bottleneck (1x1 -> 3x3 -> 1x1 x4)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, name='bn1')(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name='conv2')(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, name='bn2')(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv3')(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, name='bn3')(h)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_0')(x)
            identity = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                    dtype=self.dtype,
                                    name='downsample_1')(identity)
        return nn.relu(h + identity)


class ResNet50Body(nn.Module):
    """ResNet50 trunk returning (layer2, layer3, layer4) feature maps —
    the IntermediateLayerGetter taps of the reference (retinaface.py:95-98).
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        def stage(x, name, planes, blocks, stride):
            x = Bottleneck(planes, stride, downsample=True,
                           dtype=self.dtype, name=f'{name}_0')(x)
            for i in range(1, blocks):
                x = Bottleneck(planes, dtype=self.dtype,
                               name=f'{name}_{i}')(x)
            return x

        x = stage(x, 'layer1', 64, 3, 1)
        c3 = stage(x, 'layer2', 128, 4, 2)
        c4 = stage(c3, 'layer3', 256, 6, 2)
        c5 = stage(c4, 'layer4', 512, 3, 2)
        return [c3, c4, c5]


class MobileNetV1Body(nn.Module):
    """MobileNetV1 x0.25 trunk returning (stage1, stage2, stage3)
    (retinaface_net.py:100-123)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        d = self.dtype
        x = _conv_bn(x, 'stage1_0', 8, 3, 2, leaky=0.1, dtype=d)
        x = _conv_dw(x, 'stage1_1', 8, 16, 1, dtype=d)
        x = _conv_dw(x, 'stage1_2', 16, 32, 2, dtype=d)
        x = _conv_dw(x, 'stage1_3', 32, 32, 1, dtype=d)
        x = _conv_dw(x, 'stage1_4', 32, 64, 2, dtype=d)
        s1 = _conv_dw(x, 'stage1_5', 64, 64, 1, dtype=d)
        x = _conv_dw(s1, 'stage2_0', 64, 128, 2, dtype=d)
        for i in range(1, 6):
            x = _conv_dw(x, f'stage2_{i}', 128, 128, 1, dtype=d)
        s2 = x
        x = _conv_dw(s2, 'stage3_0', 128, 256, 2, dtype=d)
        s3 = _conv_dw(x, 'stage3_1', 256, 256, 1, dtype=d)
        return [s1, s2, s3]


class SSH(nn.Module):
    """Context module concatenating 3/5/7 receptive-field branches
    (retinaface_net.py:36-63)."""
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        leaky = 0.1 if self.out_ch <= 64 else 0.0
        c3 = _conv_bn(x, 'conv3X3', self.out_ch // 2, 3, 1, relu=False,
                      dtype=self.dtype)
        c5_1 = _conv_bn(x, 'conv5X5_1', self.out_ch // 4, 3, 1, leaky=leaky,
                        dtype=self.dtype)
        c5 = _conv_bn(c5_1, 'conv5X5_2', self.out_ch // 4, 3, 1, relu=False,
                      dtype=self.dtype)
        c7_2 = _conv_bn(c5_1, 'conv7X7_2', self.out_ch // 4, 3, 1,
                        leaky=leaky, dtype=self.dtype)
        c7 = _conv_bn(c7_2, 'conv7x7_3', self.out_ch // 4, 3, 1, relu=False,
                      dtype=self.dtype)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class FPN(nn.Module):
    """3-level FPN with nearest-upsample top-down merges
    (retinaface_net.py:66-97)."""
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> List[jax.Array]:
        leaky = 0.1 if self.out_ch <= 64 else 0.0
        o1 = _conv_bn(feats[0], 'output1', self.out_ch, 1, 1, leaky=leaky,
                      dtype=self.dtype)
        o2 = _conv_bn(feats[1], 'output2', self.out_ch, 1, 1, leaky=leaky,
                      dtype=self.dtype)
        o3 = _conv_bn(feats[2], 'output3', self.out_ch, 1, 1, leaky=leaky,
                      dtype=self.dtype)

        # nearest x2 upsample as repeat-then-crop: exactly matches torch
        # F.interpolate(mode='nearest') floor indexing for dst in
        # [2h-1, 2h], which is always the case for ceil(h/s) pyramids
        def up2x(x, target):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return x[:, :target.shape[1], :target.shape[2], :]

        o2 = _conv_bn(o2 + up2x(o3, o2), 'merge2', self.out_ch, 3, 1,
                      leaky=leaky, dtype=self.dtype)
        o1 = _conv_bn(o1 + up2x(o2, o1), 'merge1', self.out_ch, 3, 1,
                      leaky=leaky, dtype=self.dtype)
        return [o1, o2, o3]


RETINAFACE_CONFIGS = {
    'resnet50': dict(in_channel=256, out_channel=256,
                     variance=(0.1, 0.2)),
    'mobile0.25': dict(in_channel=32, out_channel=64,
                       variance=(0.1, 0.2)),
}


@ARCH_REGISTRY.register()
class RetinaFace(nn.Module):
    """Full detector graph: backbone -> FPN -> SSH -> heads.

    __call__(x) with x: (B, H, W, 3) float32, BGR, mean-subtracted
    (104, 117, 123) — matching the reference preprocessing
    (retinaface.py:88,209). Returns (loc (B,N,4), conf (B,N,2) softmaxed,
    landms (B,N,10)) with anchor ordering identical to ops.anchors.
    """
    network_name: str = 'resnet50'
    dtype: Any = jnp.float32

    def setup(self):
        cfg = RETINAFACE_CONFIGS[self.network_name]
        self.out_ch = cfg['out_channel']
        if self.network_name == 'resnet50':
            self.body = ResNet50Body(dtype=self.dtype)
        else:
            self.body = MobileNetV1Body(dtype=self.dtype)
        self.fpn = FPN(self.out_ch, dtype=self.dtype)
        self.ssh1 = SSH(self.out_ch, dtype=self.dtype)
        self.ssh2 = SSH(self.out_ch, dtype=self.dtype)
        self.ssh3 = SSH(self.out_ch, dtype=self.dtype)
        self.ClassHead = [_Head(self.out_ch, 2) for _ in range(3)]
        self.BboxHead = [_Head(self.out_ch, 4) for _ in range(3)]
        self.LandmarkHead = [_Head(self.out_ch, 10) for _ in range(3)]

    def __call__(self, x) -> Tuple[jax.Array, jax.Array, jax.Array]:
        feats = self.body(x)
        fpn = self.fpn(feats)
        features = [self.ssh1(fpn[0]), self.ssh2(fpn[1]), self.ssh3(fpn[2])]
        loc = jnp.concatenate(
            [self.BboxHead[i](f) for i, f in enumerate(features)], axis=1)
        conf = jnp.concatenate(
            [self.ClassHead[i](f) for i, f in enumerate(features)], axis=1)
        landm = jnp.concatenate(
            [self.LandmarkHead[i](f) for i, f in enumerate(features)],
            axis=1)
        conf = jax.nn.softmax(conf.astype(jnp.float32), axis=-1)
        return loc, conf, landm


class _Head(nn.Module):
    """1x1-conv prediction head over 2 anchors per cell
    (retinaface_net.py:138-175). NHWC makes the reference's
    permute(0,2,3,1) a no-op: reshape directly to (B, cells*anchors, out)."""
    in_ch: int
    out_per_anchor: int
    num_anchors: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        out = nn.Conv(self.num_anchors * self.out_per_anchor, (1, 1),
                      dtype=self.dtype, name='conv1x1')(x)
        return out.reshape(b, -1, self.out_per_anchor)
