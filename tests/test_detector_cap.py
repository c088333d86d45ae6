"""Detector keep-set escalation: a crowd beyond max_faces must escalate to
a larger NMS bucket instead of silently truncating (the reference has no
cap at all — facelib/detection/retinaface/retinaface.py:194-239)."""
import numpy as np

from codeformer_tpu.pipeline.detector import FaceDetector


class _StubDetector(FaceDetector):
    """Replaces the jitted graph with a synthetic 40-face scene."""
    N_TRUE_FACES = 40

    def __init__(self, max_faces=32):
        # bypass model/weight construction entirely
        self.max_faces = max_faces
        self.pre_nms_topk = 1024
        self.variables = None
        self._jitted = {}
        self.graph_calls = []

    def _graph(self, hw, max_faces):
        self.graph_calls.append(max_faces)

        def fn(variables, img, conf_t, nms_t):
            n = min(self.N_TRUE_FACES, max_faces)
            out = np.zeros((max_faces, 15), np.float32)
            # spread distinct boxes inside the image
            for i in range(n):
                x0, y0 = 10 + (i % 8) * 60, 10 + (i // 8) * 60
                out[i] = [x0, y0, x0 + 40, y0 + 40, 0.9,
                          x0 + 10, y0 + 15, x0 + 30, y0 + 15,
                          x0 + 20, y0 + 22, x0 + 12, y0 + 32,
                          x0 + 28, y0 + 32]
            valid = np.zeros(max_faces, bool)
            valid[:n] = True
            return out, valid
        return fn


def test_crowd_beyond_cap_keeps_all_faces():
    det = _StubDetector(max_faces=32)
    faces = det.detect_faces(np.zeros((640, 640, 3), np.uint8))
    assert faces.shape[0] == _StubDetector.N_TRUE_FACES
    # escalated exactly once: 32 saturated -> 128 not saturated
    assert det.graph_calls == [32, 128]


def test_small_scene_no_escalation():
    det = _StubDetector(max_faces=32)
    det.N_TRUE_FACES = 3
    faces = det.detect_faces(np.zeros((640, 640, 3), np.uint8))
    assert faces.shape[0] == 3
    assert det.graph_calls == [32]
