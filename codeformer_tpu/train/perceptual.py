"""Perceptual and LPIPS losses over the flax VGG extractor.

Equivalents of PerceptualLoss / LPIPSLoss (basicsr/losses/losses.py:144-282).
Both need pretrained VGG weights (torchvision-format .pth under
weights/vgg/); with no network egress we gate construction on their
presence and fail with an actionable message.

LPIPS matches the lpips package's net='vgg' exactly (losses.py:262 uses
lpips.LPIPS(net='vgg')): VGG16 taps relu1_2/2_2/3_3/4_3/5_3, the lpips
ScalingLayer, unit-normalized channels, trained 1x1 linear heads and a
spatial mean. The reference quirkily ImageNet-normalizes BEFORE handing
[0,1] images to lpips' own scaling layer (losses.py:268-281); we replicate
that double normalization so the training loss surface is identical.

Degraded fallbacks are LOUD: a missing vgg16.pth falls back to VGG19 taps
and missing lin heads fall back to uniform heads, each with a logger
warning and a `degraded` flag the trainers surface at build time.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from codeformer_tpu.models.vgg import VGGFeatureExtractor
from codeformer_tpu.utils.convert import torch_state_dict_to_flax
from codeformer_tpu.utils.logger import get_root_logger

VGG19_WEIGHTS = 'weights/vgg/vgg19.pth'
VGG16_WEIGHTS = 'weights/vgg/vgg16.pth'
LPIPS_LIN_WEIGHTS = 'weights/vgg/lpips_vgg.pth'

# lpips net='vgg' (VGG16) taps; the VGG19 fallback uses the same-depth taps
LPIPS_LAYERS_VGG16 = ('relu1_2', 'relu2_2', 'relu3_3', 'relu4_3',
                      'relu5_3')
LPIPS_LAYERS_VGG19 = ('relu1_2', 'relu2_2', 'relu3_4', 'relu4_4',
                      'relu5_4')

# lpips.ScalingLayer constants (lpips/lpips.py): applied to [-1,1] inputs
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


def _load_vgg_params(path: str, what: str):
    if not os.path.exists(path):
        raise FileNotFoundError(
            f'{what} needs pretrained VGG weights at {path} '
            f'(torchvision state dict; no network egress in this '
            f'environment). Disable perceptual_opt or provide the file.')
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=True)
    sd = {k: v for k, v in sd.items() if k.startswith('features.')}
    return torch_state_dict_to_flax(sd)


class PerceptualLoss:
    """Weighted L1/L2 distance between VGG feature maps
    (losses.py:144-253), optional Gram-matrix style term."""

    def __init__(self, layer_weights: Dict[str, float],
                 vgg_type: str = 'vgg19', use_input_norm: bool = True,
                 range_norm: bool = False,
                 perceptual_weight: float = 1.0, style_weight: float = 0.0,
                 criterion: str = 'l1', dtype=jnp.float32):
        self.layer_weights = dict(layer_weights)
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion = criterion
        self.net = VGGFeatureExtractor(
            layer_name_list=tuple(self.layer_weights), vgg_type=vgg_type,
            use_input_norm=use_input_norm, range_norm=range_norm,
            dtype=dtype)
        path = VGG16_WEIGHTS if vgg_type == 'vgg16' else VGG19_WEIGHTS
        self.params = _load_vgg_params(path, 'PerceptualLoss')

    def _dist(self, a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        if self.criterion == 'l1':
            return jnp.mean(jnp.abs(a - b))
        if self.criterion == 'l2' or self.criterion == 'mse':
            return jnp.mean((a - b) ** 2)
        if self.criterion == 'fro':
            return jnp.linalg.norm(a - b)
        raise NotImplementedError(self.criterion)

    @staticmethod
    def _gram(feat):
        b, h, w, c = feat.shape
        f = feat.reshape(b, h * w, c).astype(jnp.float32)
        return jnp.einsum('bnc,bnd->bcd', f, f) / (h * w * c)

    def __call__(self, x, gt):
        fx = self.net.apply(self.params, x)
        fg = self.net.apply(self.params, jax.lax.stop_gradient(gt))
        total = 0.0
        for name, wgt in self.layer_weights.items():
            total += self._dist(fx[name], fg[name]) * wgt
        total = total * self.perceptual_weight
        if self.style_weight > 0:
            style = 0.0
            for name, wgt in self.layer_weights.items():
                style += self._dist(self._gram(fx[name]),
                                    self._gram(fg[name])) * wgt
            total = total + style * self.style_weight
        return total


class LPIPSLoss:
    """lpips.LPIPS(net='vgg') semantics (losses.py:256-282). See the
    module docstring for the exact pipeline. `degraded` is True when any
    fallback (VGG19 taps / uniform heads) is active."""

    def __init__(self, loss_weight: float = 1.0,
                 use_input_norm: bool = True, range_norm: bool = False,
                 dtype=jnp.float32):
        logger = get_root_logger()
        self.dtype = dtype
        self.loss_weight = loss_weight
        self.use_input_norm = use_input_norm
        self.range_norm = range_norm
        self.degraded = False

        if os.path.exists(VGG16_WEIGHTS) or \
                not os.path.exists(VGG19_WEIGHTS):
            # exact path (or: neither file -> raise with the vgg16 name)
            self.layers = LPIPS_LAYERS_VGG16
            self.net = VGGFeatureExtractor(
                layer_name_list=self.layers, vgg_type='vgg16',
                use_input_norm=False, range_norm=False, dtype=dtype)
            self.params = _load_vgg_params(VGG16_WEIGHTS, 'LPIPSLoss')
        else:
            self.degraded = True
            logger.warning(
                'LPIPSLoss DEGRADED: %s missing — falling back to VGG19 '
                'taps %s. The loss surface differs from the reference '
                'lpips net="vgg"; provide the torchvision vgg16 state '
                'dict for exact parity.', VGG16_WEIGHTS,
                LPIPS_LAYERS_VGG19)
            self.layers = LPIPS_LAYERS_VGG19
            self.net = VGGFeatureExtractor(
                layer_name_list=self.layers, vgg_type='vgg19',
                use_input_norm=False, range_norm=False, dtype=dtype)
            self.params = _load_vgg_params(VGG19_WEIGHTS, 'LPIPSLoss')

        self.lins: Optional[Dict] = None
        if os.path.exists(LPIPS_LIN_WEIGHTS):
            self.lins = load_lpips_lin_heads(LPIPS_LIN_WEIGHTS)
            if not self.degraded:
                logger.info('LPIPSLoss: exact lpips net="vgg" pipeline '
                            '(VGG16 taps + trained linear heads).')
        else:
            self.degraded = True
            logger.warning(
                'LPIPSLoss DEGRADED: linear-head weights missing at %s — '
                'using uniform heads (channel mean). Still a meaningful '
                'perceptual distance but NOT the calibrated LPIPS the '
                'reference trains against.', LPIPS_LIN_WEIGHTS)

    def __call__(self, x, gt):
        gt = jax.lax.stop_gradient(gt)
        # the reference's double normalization (losses.py:274-281): range
        # norm + ImageNet norm happen BEFORE lpips' own scaling layer
        def pre(img):
            img = img.astype(jnp.float32)
            if self.range_norm:
                img = (img + 1.0) / 2.0
            if self.use_input_norm:
                from codeformer_tpu.models.vgg import (IMAGENET_MEAN,
                                                       IMAGENET_STD)
                img = (img - jnp.asarray(IMAGENET_MEAN)) / \
                    jnp.asarray(IMAGENET_STD)
            # lpips ScalingLayer
            return (img - jnp.asarray(_LPIPS_SHIFT)) / \
                jnp.asarray(_LPIPS_SCALE)

        fx = self.net.apply(self.params, pre(x))
        fg = self.net.apply(self.params, pre(gt))
        total = 0.0
        for i, name in enumerate(self.layers):
            a = fx[name].astype(jnp.float32)
            b = fg[name].astype(jnp.float32)
            a = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            if self.lins is not None:
                d = jnp.einsum('bhwc,co->bhwo', d, self.lins[i])
            else:
                d = jnp.mean(d, axis=-1, keepdims=True)
            total += jnp.mean(d, axis=(1, 2, 3)).mean()
        return total * self.loss_weight


def load_lpips_lin_heads(path: str) -> Dict[int, jnp.ndarray]:
    """Convert the lpips package's trained linear heads
    (lin{i}.model.1.weight: (1, C, 1, 1)) to (C, 1) jax arrays."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=True)
    return {i: jnp.asarray(sd[f'lin{i}.model.1.weight']
                           .numpy()[:, :, 0, 0].T)  # (C, 1)
            for i in range(5)}


def build_perceptual_loss(opt: Dict, dtype=jnp.float32):
    """From a YAML perceptual_opt block (type: LPIPSLoss|PerceptualLoss).
    `dtype` is the trainer's compute dtype (bf16 under mixed precision);
    feature distances always reduce in f32."""
    opt = dict(opt)
    ltype = opt.pop('type')
    if ltype == 'LPIPSLoss':
        return LPIPSLoss(loss_weight=opt.get('loss_weight', 1.0),
                         use_input_norm=opt.get('use_input_norm', True),
                         range_norm=opt.get('range_norm', False),
                         dtype=dtype)
    if ltype == 'PerceptualLoss':
        return PerceptualLoss(
            layer_weights=opt['layer_weights'],
            vgg_type=opt.get('vgg_type', 'vgg19'),
            use_input_norm=opt.get('use_input_norm', True),
            range_norm=opt.get('range_norm', False),
            perceptual_weight=opt.get('perceptual_weight', 1.0),
            style_weight=opt.get('style_weight', 0.0),
            criterion=opt.get('criterion', 'l1'), dtype=dtype)
    raise NotImplementedError(f'perceptual loss {ltype}')
