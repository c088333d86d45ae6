#!/usr/bin/env python
"""Replicate/cog predictor (reference: web-demos/replicate/predict.py).

Same predict(image, codeformer_fidelity, background_enhance, face_upsample,
upscale) surface; the cog BasePredictor wrapper is constructed only if cog
is importable."""
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), '..', '..')))


def predict(image: str, codeformer_fidelity: float = 0.5,
            background_enhance: bool = True, face_upsample: bool = True,
            upscale: int = 2, output_path: str = 'output.png') -> str:
    """image: input path; returns the output path."""
    import cv2
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'hugging_face'))
    from app import inference
    img = cv2.imread(image, cv2.IMREAD_COLOR)
    out = inference(img, background_enhance, face_upsample, upscale,
                    codeformer_fidelity)
    cv2.imwrite(output_path, out)
    return output_path


try:
    from cog import BasePredictor, Input, Path

    class Predictor(BasePredictor):
        def predict(self,
                    image: Path = Input(description='Input image'),
                    codeformer_fidelity: float = Input(
                        default=0.5, ge=0, le=1),
                    background_enhance: bool = Input(default=True),
                    face_upsample: bool = Input(default=True),
                    upscale: int = Input(default=2)) -> Path:
            out = predict(str(image), codeformer_fidelity,
                          background_enhance, face_upsample, upscale)
            return Path(out)
except ImportError:
    pass
