"""Data pipeline: degradation synthesis datasets, samplers, prefetch
loaders. Importing registers datasets in DATASET_REGISTRY."""
from codeformer_tpu.utils.registry import DATASET_REGISTRY

from .ffhq_blind_dataset import FFHQBlindDataset, FFHQBlindJointDataset
from .paired_image_dataset import PairedImageDataset
from .loader import DataLoader, EnlargedSampler


def build_dataset(dataset_opt: dict):
    """Factory mirroring basicsr/data/__init__.py:25-37."""
    dataset_opt = dict(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt['type'])(dataset_opt)
    return dataset


__all__ = ['build_dataset', 'FFHQBlindDataset', 'FFHQBlindJointDataset',
           'PairedImageDataset', 'DataLoader', 'EnlargedSampler']
