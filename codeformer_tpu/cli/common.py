"""Shared CLI plumbing: input enumeration, results layout, weight lookup.

Mirrors the reference conventions (inference_codeformer.py:86-120):
single image / folder / video inputs; results/<name>_<w> output roots;
weights under weights/CodeFormer/.
"""
from __future__ import annotations

import glob
import os
import sys
from typing import List, Optional, Tuple

IMG_EXTS = ('jpg', 'jpeg', 'png', 'JPG', 'JPEG', 'PNG')
VIDEO_EXTS = ('mp4', 'mov', 'avi', 'MP4', 'MOV', 'AVI')

# released checkpoint names, matching the reference weights layout
# (weights/README.md; scripts/download_pretrained_models.py:27-47)
WEIGHT_FILES = {
    'restoration': 'weights/CodeFormer/codeformer.pth',
    'colorization': 'weights/CodeFormer/codeformer_colorization.pth',
    'inpainting': 'weights/CodeFormer/codeformer_inpainting.pth',
}


def list_inputs(input_path: str, w: Optional[float] = None,
                default_root: str = 'test_img'
                ) -> Tuple[List[str], str, bool]:
    """Returns (input_list, result_root, is_video)."""
    suffix = '' if w is None else f'_{w}'
    if input_path.endswith(IMG_EXTS):
        return [input_path], f'results/{default_root}{suffix}', False
    if input_path.endswith(VIDEO_EXTS):
        video_name = os.path.splitext(os.path.basename(input_path))[0]
        return [input_path], f'results/{video_name}{suffix}', True
    input_path = input_path.rstrip('/')
    imgs = sorted(glob.glob(os.path.join(input_path, '*.[jpJP][pnPN]*[gG]')))
    root = f'results/{os.path.basename(input_path)}{suffix}'
    return imgs, root, False


def add_dtype_flag(p) -> None:
    """--dtype for the restorer compute precision. bf16 is the TPU
    serving default (MXU-native, quality-gated by tests); fp32 matches
    the reference's numerics exactly — use it for quality audits
    (scripts/parity_check.py --weights)."""
    p.add_argument('--dtype', type=str, default='bf16',
                   choices=['bf16', 'fp32'],
                   help='Restorer compute dtype: bf16 (default, '
                        'TPU-native) or fp32 (reference numerics, for '
                        'quality parity audits).')


def resolve_dtype(name: str):
    import jax.numpy as jnp
    return jnp.float32 if name == 'fp32' else jnp.bfloat16


def resolve_checkpoint(explicit: Optional[str], task: str,
                       allow_random: bool) -> Optional[str]:
    """Find weights: explicit flag > weights/ convention (.pth or our
    .msgpack sibling) > error unless --random-init."""
    if explicit:
        if not os.path.exists(explicit):
            sys.exit(f'checkpoint not found: {explicit}')
        return explicit
    default = WEIGHT_FILES[task]
    for cand in (default, default.replace('.pth', '.msgpack')):
        if os.path.exists(cand):
            return cand
    if allow_random:
        print('[WARN] no checkpoint found — using RANDOM weights '
              '(--random-init); outputs will be meaningless.')
        return None
    sys.exit(
        f'No checkpoint found at {default}. Download the released weights '
        f'there (see weights/README.md of the reference), pass '
        f'--checkpoint PATH, or use --random-init for a smoke test.')
