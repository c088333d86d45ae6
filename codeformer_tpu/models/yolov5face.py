"""YOLOv5-face detector (yolov5n / yolov5l variants) — flax NHWC.

Behavioral spec: facelib/detection/yolov5face/models/{yolo.py,common.py} —
a config-driven graph (backbone+head lists of [from, number, module, args])
with StemBlock/ShuffleV2Block/C3/SPP/Conv blocks and a Detect head carrying
16 outputs per anchor (box 4 + obj 1 + 10 landmark coords + cls 1).
Module names mirror the torch Sequential tree ('model.3.cv1.conv.weight' ->
model_3/cv1/conv/kernel) so yolov5{n,l}-face.pth convert mechanically.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from codeformer_tpu.utils.registry import ARCH_REGISTRY

ANCHORS = ((4, 5, 8, 10, 13, 16),
           (23, 29, 43, 55, 73, 105),
           (146, 217, 231, 300, 335, 433))

# [from, number, module, args] — graph configs of the two shipped variants
# (facelib/detection/yolov5face/models/yolov5{n,l}.yaml)
YOLO5N_CFG = dict(
    nc=1,
    backbone=[
        [-1, 1, 'StemBlock', [32, 3, 2]],
        [-1, 1, 'ShuffleV2Block', [128, 2]],
        [-1, 3, 'ShuffleV2Block', [128, 1]],
        [-1, 1, 'ShuffleV2Block', [256, 2]],
        [-1, 7, 'ShuffleV2Block', [256, 1]],
        [-1, 1, 'ShuffleV2Block', [512, 2]],
        [-1, 3, 'ShuffleV2Block', [512, 1]],
    ],
    head=[
        [-1, 1, 'Conv', [128, 1, 1]],
        [-1, 1, 'Upsample', [None, 2, 'nearest']],
        [[-1, 4], 1, 'Concat', [1]],
        [-1, 1, 'C3', [128, False]],
        [-1, 1, 'Conv', [128, 1, 1]],
        [-1, 1, 'Upsample', [None, 2, 'nearest']],
        [[-1, 2], 1, 'Concat', [1]],
        [-1, 1, 'C3', [128, False]],
        [-1, 1, 'Conv', [128, 3, 2]],
        [[-1, 11], 1, 'Concat', [1]],
        [-1, 1, 'C3', [128, False]],
        [-1, 1, 'Conv', [128, 3, 2]],
        [[-1, 7], 1, 'Concat', [1]],
        [-1, 1, 'C3', [128, False]],
        [[14, 17, 20], 1, 'Detect', [1, ANCHORS]],
    ])

YOLO5L_CFG = dict(
    nc=1,
    backbone=[
        [-1, 1, 'StemBlock', [64, 3, 2]],
        [-1, 3, 'C3', [128]],
        [-1, 1, 'Conv', [256, 3, 2]],
        [-1, 9, 'C3', [256]],
        [-1, 1, 'Conv', [512, 3, 2]],
        [-1, 9, 'C3', [512]],
        [-1, 1, 'Conv', [1024, 3, 2]],
        [-1, 1, 'SPP', [1024, [3, 5, 7]]],
        [-1, 3, 'C3', [1024, False]],
    ],
    head=[
        [-1, 1, 'Conv', [512, 1, 1]],
        [-1, 1, 'Upsample', [None, 2, 'nearest']],
        [[-1, 5], 1, 'Concat', [1]],
        [-1, 3, 'C3', [512, False]],
        [-1, 1, 'Conv', [256, 1, 1]],
        [-1, 1, 'Upsample', [None, 2, 'nearest']],
        [[-1, 3], 1, 'Concat', [1]],
        [-1, 3, 'C3', [256, False]],
        [-1, 1, 'Conv', [256, 3, 2]],
        [[-1, 13], 1, 'Concat', [1]],
        [-1, 3, 'C3', [512, False]],
        [-1, 1, 'Conv', [512, 3, 2]],
        [[-1, 9], 1, 'Concat', [1]],
        [-1, 3, 'C3', [1024, False]],
        [[16, 19, 22], 1, 'Detect', [1, ANCHORS]],
    ])

CONFIGS = {'yolov5n': YOLO5N_CFG, 'yolov5l': YOLO5L_CFG}
STRIDES = (8, 16, 32)


def _autopad(k: int) -> int:
    return k // 2


class ConvBlock(nn.Module):
    """Conv + BN + SiLU (common.py Conv)."""
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = _autopad(self.k)
        x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=self.g,
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.97, dtype=self.dtype, name='bn')(x)
        return jax.nn.silu(x) if self.act else x


class StemBlock(nn.Module):
    c2: int
    k: int = 3
    s: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = ConvBlock(self.c2, self.k, self.s, dtype=self.dtype,
                       name='stem_1')(x)
        s2a = ConvBlock(self.c2 // 2, 1, 1, dtype=self.dtype,
                        name='stem_2a')(s1)
        s2b = ConvBlock(self.c2, 3, 2, dtype=self.dtype,
                        name='stem_2b')(s2a)
        s2p = nn.max_pool(s1, (2, 2), strides=(2, 2))
        return ConvBlock(self.c2, 1, 1, dtype=self.dtype, name='stem_3')(
            jnp.concatenate([s2b, s2p], axis=-1))


class Bottleneck(nn.Module):
    c2: int
    shortcut: bool = True
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        out = ConvBlock(c_, 1, 1, dtype=self.dtype, name='cv1')(x)
        out = ConvBlock(self.c2, 3, 1, dtype=self.dtype, name='cv2')(out)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + out
        return out


class C3(nn.Module):
    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        y1 = ConvBlock(c_, 1, 1, dtype=self.dtype, name='cv1')(x)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, e=1.0, dtype=self.dtype,
                            name=f'm_{i}')(y1)
        y2 = ConvBlock(c_, 1, 1, dtype=self.dtype, name='cv2')(x)
        return ConvBlock(self.c2, 1, 1, dtype=self.dtype, name='cv3')(
            jnp.concatenate([y1, y2], axis=-1))


class SPP(nn.Module):
    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        x = ConvBlock(c_, 1, 1, dtype=self.dtype, name='cv1')(x)
        pools = [x]
        for k in self.k:
            p = k // 2
            pools.append(nn.max_pool(x, (k, k), strides=(1, 1),
                                     padding=((p, p), (p, p))))
        return ConvBlock(self.c2, 1, 1, dtype=self.dtype, name='cv2')(
            jnp.concatenate(pools, axis=-1))


class ShuffleV2Block(nn.Module):
    """ShuffleNetV2 unit with SiLU (common.py:120-168). Branch layer names
    match the torch Sequential indices."""
    oup: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bf = self.oup // 2
        d = self.dtype

        def bn(name):
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                momentum=0.9, dtype=d, name=name)

        if self.stride > 1:
            inp = x.shape[-1]
            b1 = nn.Conv(inp, (3, 3), strides=(self.stride, self.stride),
                         padding=((1, 1), (1, 1)), feature_group_count=inp,
                         use_bias=False, dtype=d, name='branch1_0')(x)
            b1 = bn('branch1_1')(b1)
            b1 = nn.Conv(bf, (1, 1), use_bias=False, dtype=d,
                         name='branch1_2')(b1)
            b1 = jax.nn.silu(bn('branch1_3')(b1))
            b2_in = x
        else:
            b1, b2_in = jnp.split(x, 2, axis=-1)

        b2 = nn.Conv(bf, (1, 1), use_bias=False, dtype=d,
                     name='branch2_0')(b2_in)
        b2 = jax.nn.silu(bn('branch2_1')(b2))
        b2 = nn.Conv(bf, (3, 3), strides=(self.stride, self.stride),
                     padding=((1, 1), (1, 1)), feature_group_count=bf,
                     use_bias=False, dtype=d, name='branch2_3')(b2)
        b2 = bn('branch2_4')(b2)
        b2 = nn.Conv(bf, (1, 1), use_bias=False, dtype=d,
                     name='branch2_5')(b2)
        b2 = jax.nn.silu(bn('branch2_6')(b2))

        out = jnp.concatenate([b1, b2], axis=-1)
        # channel shuffle with groups=2 (common.py:25-34)
        b, h, w, c = out.shape
        out = out.reshape(b, h, w, 2, c // 2).transpose(0, 1, 2, 4, 3)
        return out.reshape(b, h, w, c)


class Detect(nn.Module):
    """Detection head: per-level 1x1 convs + box/landmark decode
    (yolo.py:29-93). Returns (B, N, 16) decoded predictions in input-pixel
    units, rows ordered (level, anchor, y, x) like the reference."""
    nc: int = 1
    anchors: Tuple = ANCHORS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> jax.Array:
        no = self.nc + 5 + 10
        na = len(self.anchors[0]) // 2
        outs = []
        for i, f in enumerate(feats):
            b, ny, nx, _ = f.shape
            p = nn.Conv(no * na, (1, 1), dtype=self.dtype,
                        name=f'm_{i}')(f)
            p = p.reshape(b, ny, nx, na, no).astype(jnp.float32)
            stride = STRIDES[i]
            anchor = jnp.asarray(self.anchors[i], jnp.float32).reshape(
                na, 2)

            gx = jnp.arange(nx, dtype=jnp.float32)[None, :, None, None]
            gy = jnp.arange(ny, dtype=jnp.float32)[:, None, None, None]
            grid = jnp.concatenate([
                jnp.broadcast_to(gx, (ny, nx, na, 1)),
                jnp.broadcast_to(gy, (ny, nx, na, 1))], axis=-1)

            xy = (jax.nn.sigmoid(p[..., 0:2]) * 2.0 - 0.5 + grid) * stride
            wh = (jax.nn.sigmoid(p[..., 2:4]) * 2.0) ** 2 * anchor
            obj = jax.nn.sigmoid(p[..., 4:5])
            lmk = (p[..., 5:15].reshape(b, ny, nx, na, 5, 2)
                   * anchor[:, None, :]
                   + grid[..., None, :] * stride).reshape(b, ny, nx, na, 10)
            cls = jax.nn.sigmoid(p[..., 15:])
            y = jnp.concatenate([xy, wh, obj, lmk, cls], axis=-1)
            # row order (anchor, y, x) to match the torch flatten
            y = y.transpose(0, 3, 1, 2, 4).reshape(b, -1, no)
            outs.append(y)
        return jnp.concatenate(outs, axis=1)


_BLOCKS = {'StemBlock': StemBlock, 'ShuffleV2Block': ShuffleV2Block,
           'C3': C3, 'Conv': ConvBlock, 'SPP': SPP}


@ARCH_REGISTRY.register()
class YoloFace(nn.Module):
    """Config-driven YOLOv5-face graph (yolo.py Model/parse_model)."""
    variant: str = 'yolov5n'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, 3) RGB in [0, 1], H/W multiples of 32.
        Returns decoded (B, N, 16) predictions."""
        cfg = CONFIGS[self.variant]
        layers = cfg['backbone'] + cfg['head']
        y: List = []
        out = x
        for i, (frm, n, mtype, args) in enumerate(layers):
            if mtype == 'Detect':
                feats = [y[j] for j in frm]
                return Detect(cfg['nc'], tuple(args[1]), dtype=self.dtype,
                              name=f'model_{i}')(feats)
            if frm != -1:
                out = y[frm] if isinstance(frm, int) else \
                    [out if j == -1 else y[j] for j in frm]
            if mtype == 'Upsample':
                out = jnp.repeat(jnp.repeat(out, 2, axis=1), 2, axis=2)
            elif mtype == 'Concat':
                out = jnp.concatenate(out, axis=-1)
            elif mtype == 'StemBlock':
                out = StemBlock(args[0], args[1], args[2],
                                dtype=self.dtype, name=f'model_{i}')(out)
            elif mtype == 'Conv':
                out = ConvBlock(args[0], args[1], args[2],
                                dtype=self.dtype, name=f'model_{i}')(out)
            elif mtype == 'SPP':
                out = SPP(args[0], tuple(args[1]), dtype=self.dtype,
                          name=f'model_{i}')(out)
            elif mtype == 'C3':
                shortcut = args[1] if len(args) > 1 else True
                out = C3(args[0], n=n, shortcut=shortcut,
                         dtype=self.dtype, name=f'model_{i}')(out)
            elif mtype == 'ShuffleV2Block':
                if n > 1:  # torch wraps repeats in a Sequential
                    for j in range(n):
                        out = ShuffleV2Block(args[0], args[1],
                                             dtype=self.dtype,
                                             name=f'model_{i}_{j}')(out)
                else:
                    out = ShuffleV2Block(args[0], args[1],
                                         dtype=self.dtype,
                                         name=f'model_{i}')(out)
            else:
                raise NotImplementedError(mtype)
            y.append(out)
        raise RuntimeError('config has no Detect layer')
