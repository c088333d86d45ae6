#!/usr/bin/env python
"""Gradio demo (reference: web-demos/hugging_face/app.py).

Exposes the same `inference(image, background_enhance, face_upsample,
upscale, codeformer_fidelity)` entry; the gradio UI is constructed only if
gradio is importable (not bundled in this image — the inference function is
usable standalone).
"""
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), '..', '..')))

from codeformer_tpu.pipeline import CodeFormerRestorer
from codeformer_tpu.pipeline.face_helper import FaceRestoreHelper
from codeformer_tpu.cli.common import resolve_checkpoint

_restorer = None
_bg_upsampler = None


def _get_restorer():
    global _restorer
    if _restorer is None:
        ckpt = resolve_checkpoint(None, 'restoration',
                                  os.environ.get('CODEFORMER_RANDOM_INIT')
                                  == '1')
        _restorer = CodeFormerRestorer(checkpoint=ckpt)
    return _restorer


def inference(image, background_enhance: bool, face_upsample: bool,
              upscale: int, codeformer_fidelity: float):
    """image: BGR numpy array or path. Returns the restored BGR image.
    Mirrors the reference demo flow (app.py:107-180) including the upscale
    clamps for large inputs (app.py:121-128)."""
    if isinstance(image, str):
        image = cv2.imread(image, cv2.IMREAD_COLOR)
    img = image

    upscale = int(upscale)
    if upscale > 4:  # avoid memory exhaustion for large upscales
        upscale = 4
    if upscale > 2 and max(img.shape[:2]) > 1000:
        upscale = 2
    if max(img.shape[:2]) > 1500:
        upscale = 1
        background_enhance = False
        face_upsample = False

    restorer = _get_restorer()
    allow_random = os.environ.get('CODEFORMER_RANDOM_INIT') == '1'
    face_helper = FaceRestoreHelper(
        upscale, face_size=512, crop_ratio=(1, 1),
        det_model='retinaface_resnet50', use_parse=True,
        allow_random_weights=allow_random)
    bg_upsampler = None
    face_upsampler = None
    if background_enhance or face_upsample:
        from codeformer_tpu.pipeline.realesrgan import set_realesrgan
        bg_upsampler = set_realesrgan(allow_random=allow_random)
        face_upsampler = bg_upsampler

    face_helper.read_image(img)
    face_helper.get_face_landmarks_5(only_center_face=False, resize=640,
                                     eye_dist_threshold=5)
    face_helper.align_warp_face()
    if face_helper.cropped_faces:
        restored = restorer.restore_batch(
            face_helper.cropped_faces, w=codeformer_fidelity, adain=True)
        for cropped, rest in zip(face_helper.cropped_faces, restored):
            face_helper.add_restored_face(rest, cropped)
    bg_img = None
    if background_enhance and bg_upsampler is not None:
        bg_img = bg_upsampler.enhance(img, outscale=upscale)[0]
    face_helper.get_inverse_affine(None)
    if face_upsample and face_upsampler is not None:
        return face_helper.paste_faces_to_input_image(
            upsample_img=bg_img, face_upsampler=face_upsampler)
    return face_helper.paste_faces_to_input_image(upsample_img=bg_img)


def build_ui():
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit('gradio is not installed in this image; import '
                         'and call inference() directly instead')

    def _run(image, background_enhance, face_upsample, upscale, fidelity):
        out = inference(image[..., ::-1], background_enhance,
                        face_upsample, upscale, fidelity)
        return out[..., ::-1]

    demo = gr.Interface(
        _run,
        inputs=[
            gr.Image(type='numpy', label='Input'),
            gr.Checkbox(value=True, label='Background_Enhance'),
            gr.Checkbox(value=True, label='Face_Upsample'),
            gr.Number(value=2, label='Rescaling_Factor (up to 4)'),
            gr.Slider(0, 1, value=0.5, step=0.01,
                      label='Codeformer_Fidelity'),
        ],
        outputs=gr.Image(type='numpy', label='Output'),
        title='CodeFormer-TPU: Robust Face Restoration')
    return demo


if __name__ == '__main__':
    build_ui().launch()
