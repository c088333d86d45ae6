"""Data augmentation transforms (reference: basicsr/data/transforms.py)."""
from __future__ import annotations

import random

import cv2
import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop so H, W are multiples of scale (transforms.py:5-22)."""
    img = img.copy()
    if img.ndim in (2, 3):
        h, w = img.shape[0], img.shape[1]
        h_r, w_r = h % scale, w % scale
        img = img[:h - h_r, :w - w_r, ...]
    else:
        raise ValueError(f'Wrong img ndim: {img.ndim}.')
    return img


def paired_random_crop(img_gts, img_lqs, gt_patch_size: int, scale: int,
                       gt_path: str = ''):
    """Random paired crop of GT/LQ lists (transforms.py:25-77)."""
    if not isinstance(img_gts, list):
        img_gts = [img_gts]
    if not isinstance(img_lqs, list):
        img_lqs = [img_lqs]
    h_lq, w_lq = img_lqs[0].shape[0:2]
    h_gt, w_gt = img_gts[0].shape[0:2]
    lq_patch_size = gt_patch_size // scale
    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(f'Scale mismatches. GT ({h_gt}, {w_gt}) is not '
                         f'{scale}x of LQ ({h_lq}, {w_lq}). {gt_path}')
    if h_lq < lq_patch_size or w_lq < lq_patch_size:
        raise ValueError(f'LQ ({h_lq}, {w_lq}) smaller than patch '
                         f'{lq_patch_size}. {gt_path}')
    top = random.randint(0, h_lq - lq_patch_size)
    left = random.randint(0, w_lq - lq_patch_size)
    img_lqs = [v[top:top + lq_patch_size, left:left + lq_patch_size, ...]
               for v in img_lqs]
    top_gt, left_gt = int(top * scale), int(left * scale)
    img_gts = [v[top_gt:top_gt + gt_patch_size,
                 left_gt:left_gt + gt_patch_size, ...] for v in img_gts]
    if len(img_gts) == 1:
        img_gts = img_gts[0]
    if len(img_lqs) == 1:
        img_lqs = img_lqs[0]
    return img_gts, img_lqs


def augment(imgs, hflip: bool = True, rotation: bool = True, flows=None,
            return_status: bool = False):
    """hflip / vflip+rot90 augmentation with optional flow handling and
    status return (transforms.py:80-144)."""
    hflip = hflip and random.random() < 0.5
    vflip = rotation and random.random() < 0.5
    rot90 = rotation and random.random() < 0.5

    def _augment(img):
        if hflip:
            img = cv2.flip(img, 1)
        if vflip:
            img = cv2.flip(img, 0)
        if rot90:
            img = img.transpose(1, 0, 2)
        return img

    def _augment_flow(flow):
        if hflip:
            flow = cv2.flip(flow, 1)
            flow[:, :, 0] *= -1
        if vflip:
            flow = cv2.flip(flow, 0)
            flow[:, :, 1] *= -1
        if rot90:
            flow = flow.transpose(1, 0, 2)
            flow = flow[:, :, [1, 0]]
        return flow

    if not isinstance(imgs, list):
        imgs = [imgs]
    imgs = [_augment(img) for img in imgs]
    if len(imgs) == 1:
        imgs = imgs[0]
    if flows is not None:
        if not isinstance(flows, list):
            flows = [flows]
        flows = [_augment_flow(f) for f in flows]
        if len(flows) == 1:
            flows = flows[0]
        return imgs, flows
    if return_status:
        return imgs, (hflip, vflip, rot90)
    return imgs


def duf_downsample(x, kernel_size: int = 13, scale: int = 4):
    """Blur+downsample used by DUF-style VSR (reference
    basicsr/data/data_util.py:277-307): Gaussian blur (sigma 0.4*scale)
    then stride-`scale` sampling. x: NHWC jax/numpy array."""
    import jax.numpy as jnp
    from codeformer_tpu.ops.filters import gaussian_blur
    assert scale in (2, 3, 4), f'Only support scale (2, 3, 4), got {scale}'
    squeeze = False
    if x.ndim == 3:
        x = x[None]
        squeeze = True
    pad_w = kernel_size // 2 + scale * 2
    x = jnp.pad(x, ((0, 0), (pad_w, pad_w), (pad_w, pad_w), (0, 0)),
                mode='reflect')
    x = gaussian_blur(x, kernel_size, sigma=0.4 * scale)
    x = x[:, pad_w:-pad_w:1, pad_w:-pad_w:1, :]
    x = x[:, ::scale, ::scale, :]
    if squeeze:
        x = x[0]
    return x
