from .vq import codebook_lookup, nearest_code_indices
from .geometry import estimate_similarity, invert_affine, warp_affine
from .filters import dilate, erode, gaussian_blur
from .nms import decode_boxes, decode_landmarks, nms
from .anchors import prior_boxes
from .upfirdn2d import upfirdn2d
from .fused_act import fused_leaky_relu
from .deform_conv import deform_conv2d, modulated_deform_conv2d

__all__ = [
    'nearest_code_indices', 'codebook_lookup', 'warp_affine',
    'estimate_similarity', 'invert_affine', 'gaussian_blur', 'erode',
    'dilate', 'nms', 'decode_boxes', 'decode_landmarks', 'prior_boxes',
    'upfirdn2d', 'fused_leaky_relu', 'deform_conv2d',
    'modulated_deform_conv2d',
]
