"""Model architectures. Importing this package registers all archs."""
from codeformer_tpu.utils.registry import ARCH_REGISTRY

from .vqgan import (Encoder, Generator, GumbelQuantizer, VectorQuantizer,
                    VQAutoEncoder, VQGANDiscriminator)
from .codeformer import CodeFormer
from .retinaface import RetinaFace
from .parsenet import ParseNet
from .rrdbnet import RRDBNet
from .bisenet import BiSeNet
from .arcface import ResNetArcFace
from .vgg import VGGFeatureExtractor
from .yolov5face import YoloFace


def build_network(opt: dict):
    """Instantiate an arch from a config dict with a `type:` key.

    Mirrors the reference factory (basicsr/archs/__init__.py:19-25).
    """
    opt = dict(opt)
    network_type = opt.pop('type')
    return ARCH_REGISTRY.get(network_type)(**opt)


__all__ = [
    'Encoder', 'Generator', 'VectorQuantizer', 'GumbelQuantizer',
    'VQAutoEncoder', 'VQGANDiscriminator', 'CodeFormer', 'build_network',
]
