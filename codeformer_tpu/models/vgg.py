"""VGG feature extractor for perceptual/LPIPS losses — flax NHWC.

Behavioral spec: basicsr/archs/vgg_arch.py (VGG conv features tapped by
layer name, ImageNet input normalization, optional [-1,1]->[0,1] range
norm). Layer names follow the reference NAMES map ('conv1_1', 'relu1_1',
..., 'pool5') so configs transfer verbatim; vgg11/13/16/19 plans are
supported like the reference. Weights convert from torchvision-format
state dicts ('features.0.weight', ...).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from codeformer_tpu.utils.registry import ARCH_REGISTRY

# conv plan per variant: (out_channels, convs) per stage
# (vgg_arch.py NAMES, torchvision cfgs A/B/D/E)
_VGG_PLANS = {
    'vgg11': ((64, 1), (128, 1), (256, 2), (512, 2), (512, 2)),
    'vgg13': ((64, 2), (128, 2), (256, 2), (512, 2), (512, 2)),
    'vgg16': ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)),
    'vgg19': ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4)),
}


def vgg_layer_names(vgg_type: str = 'vgg19'):
    names = []
    for stage, (_, n_convs) in enumerate(_VGG_PLANS[vgg_type], start=1):
        for i in range(1, n_convs + 1):
            names += [f'conv{stage}_{i}', f'relu{stage}_{i}']
        names.append(f'pool{stage}')
    return names


def vgg19_layer_names():
    return vgg_layer_names('vgg19')


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@ARCH_REGISTRY.register()
class VGGFeatureExtractor(nn.Module):
    """Runs VGG until the deepest requested layer, returning a dict of
    tapped activations (vgg_arch.py:54-161)."""
    layer_name_list: Sequence[str] = ('conv5_4',)
    vgg_type: str = 'vgg19'
    use_input_norm: bool = True
    range_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - jnp.asarray(IMAGENET_MEAN, x.dtype)) / \
                jnp.asarray(IMAGENET_STD, x.dtype)
        wanted = set(self.layer_name_list)
        remaining = set(wanted)
        out = {}
        conv_idx = 0  # torchvision features.<i> numbering
        for stage, (ch, n_convs) in enumerate(_VGG_PLANS[self.vgg_type],
                                              start=1):
            for i in range(1, n_convs + 1):
                x = nn.Conv(ch, (3, 3), dtype=self.dtype,
                            name=f'features_{conv_idx}')(x)
                conv_idx += 2  # conv + relu in torch Sequential
                if f'conv{stage}_{i}' in wanted:
                    out[f'conv{stage}_{i}'] = x
                    remaining.discard(f'conv{stage}_{i}')
                x = nn.relu(x)
                if f'relu{stage}_{i}' in wanted:
                    out[f'relu{stage}_{i}'] = x
                    remaining.discard(f'relu{stage}_{i}')
                if not remaining:
                    return out
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            conv_idx += 1  # pool layer index
            if f'pool{stage}' in wanted:
                out[f'pool{stage}'] = x
                remaining.discard(f'pool{stage}')
            if not remaining:
                return out
        return out
