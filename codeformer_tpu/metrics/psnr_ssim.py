"""PSNR / SSIM — MATLAB-equivalent implementations.

Behavioral spec: basicsr/metrics/psnr_ssim.py (crop_border, optional
Y-channel evaluation, Gaussian-window SSIM with the standard 11x11
sigma-1.5 kernel and C1/C2 for k1=0.01, k2=0.03, L=255).
Inputs are HWC uint8/float images in [0, 255], BGR or RGB (consistent
between img and img2).
"""
from __future__ import annotations

import cv2
import numpy as np

from codeformer_tpu.utils.registry import METRIC_REGISTRY


def _to_y_channel(img: np.ndarray) -> np.ndarray:
    """BGR [0,255] -> ITU-R BT.601 Y [0,255] (matlab rgb2ycbcr luma)."""
    img = img.astype(np.float32) / 255.0
    y = (np.dot(img[..., ::-1], [65.481, 128.553, 24.966]) + 16.0)
    return y[..., None]


@METRIC_REGISTRY.register()
def calculate_psnr(img, img2, crop_border: int = 0,
                   test_y_channel: bool = False, **kwargs) -> float:
    """psnr_ssim.py:8-46."""
    assert img.shape == img2.shape
    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border,
                    ...]
    if test_y_channel:
        img = _to_y_channel(img)
        img2 = _to_y_channel(img2)
    mse = np.mean((img - img2) ** 2)
    if mse == 0:
        return float('inf')
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _ssim_single(img: np.ndarray, img2: np.ndarray) -> float:
    """11x11 Gaussian-window SSIM on one channel (psnr_ssim.py:49-80)."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq = mu1 ** 2
    mu2_sq = mu2 ** 2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = cv2.filter2D(img ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = (((2 * mu1_mu2 + c1) * (2 * sigma12 + c2))
                / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return float(ssim_map.mean())


@METRIC_REGISTRY.register()
def calculate_ssim(img, img2, crop_border: int = 0,
                   test_y_channel: bool = False, **kwargs) -> float:
    """psnr_ssim.py:83-128."""
    assert img.shape == img2.shape
    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border,
                    ...]
    if test_y_channel:
        img = _to_y_channel(img)
        img2 = _to_y_channel(img2)
    ssims = [
        _ssim_single(img[..., i], img2[..., i])
        for i in range(img.shape[2])]
    return float(np.mean(ssims))
