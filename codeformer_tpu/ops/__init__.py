from .vq import codebook_lookup, nearest_code_indices

__all__ = ['nearest_code_indices', 'codebook_lookup']
