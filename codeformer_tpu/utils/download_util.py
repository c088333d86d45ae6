"""Pretrained-weight resolution (reference: basicsr/utils/download_util.py
+ scripts/download_pretrained_models.py).

This environment has zero network egress, so `load_file_from_url` resolves
to the conventional local path under weights/ and raises with download
instructions when the file is absent — keeping call sites source-compatible
with the reference.
"""
from __future__ import annotations

import os
from urllib.parse import urlparse

# released weight URL map (scripts/download_pretrained_models.py:27-47)
PRETRAINED_URLS = {
    'CodeFormer': {
        'codeformer.pth':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/codeformer.pth',
        'codeformer_colorization.pth':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/codeformer_colorization.pth',
        'codeformer_inpainting.pth':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/codeformer_inpainting.pth',
    },
    'facelib': {
        'detection_Resnet50_Final.pth':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/detection_Resnet50_Final.pth',
        'detection_mobilenet0.25_Final.pth':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/detection_mobilenet0.25_Final.pth',
        'yolov5l-face.pth':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/yolov5l-face.pth',
        'yolov5n-face.pth':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/yolov5n-face.pth',
        'parsing_parsenet.pth':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/parsing_parsenet.pth',
        'parsing_bisenet.pth':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/parsing_bisenet.pth',
    },
    'realesrgan': {
        'RealESRGAN_x2plus.pth':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/RealESRGAN_x2plus.pth',
    },
    'dlib': {
        'mmod_human_face_detector-4cb19393.dat':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/mmod_human_face_detector-4cb19393.dat',
        'shape_predictor_5_face_landmarks-c4b1e980.dat':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/shape_predictor_5_face_landmarks-c4b1e980.dat',
        'shape_predictor_68_face_landmarks-fbdc2cb8.dat':
            'https://github.com/sczhou/CodeFormer/releases/download/v0.1.0/shape_predictor_68_face_landmarks-fbdc2cb8.dat',
    },
}


def load_file_from_url(url: str, model_dir: str = 'weights',
                       progress: bool = True,
                       file_name: str | None = None) -> str:
    """Resolve a released-weights URL to its local path; raise with clear
    instructions if absent (no egress here)."""
    if file_name is None:
        file_name = os.path.basename(urlparse(url).path)
    path = os.path.abspath(os.path.join(model_dir, file_name))
    if os.path.exists(path):
        return path
    raise FileNotFoundError(
        f'Pretrained weights {file_name} not found at {path}. This '
        f'environment has no network access — download {url} on a '
        f'connected machine and place it at that path.')
