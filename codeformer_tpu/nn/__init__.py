from .blocks import (AttnBlock, Downsample, FuseSftBlock, GroupNorm32,
                     ResBlock, Upsample, adaptive_instance_normalization,
                     calc_mean_std)
from .transformer import MultiheadSelfAttention, TransformerSALayer

__all__ = [
    'GroupNorm32', 'ResBlock', 'AttnBlock', 'Downsample', 'Upsample',
    'FuseSftBlock', 'adaptive_instance_normalization', 'calc_mean_std',
    'MultiheadSelfAttention', 'TransformerSALayer',
]
