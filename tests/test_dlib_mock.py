"""Runtime coverage for the dlib detector flow with a mocked dlib module
(the package/weights are absent here, as in the reference's optional
dependency — facelib face_restoration_helper.py:152-193). Exercises
_init_dlib, get_face_landmarks_5_dlib, and the 1024-scale template
alignment geometry end to end."""
import sys
import types

import numpy as np
import pytest


class _Rect:
    def __init__(self, l, t, r, b):
        self._l, self._t, self._r, self._b = l, t, r, b

    def left(self):
        return self._l

    def top(self):
        return self._t

    def right(self):
        return self._r

    def bottom(self):
        return self._b


class _Det:
    def __init__(self, rect):
        self.rect = rect


class _Part:
    def __init__(self, x, y):
        self.x, self.y = x, y


class _Shape:
    def __init__(self, pts):
        self._pts = [_Part(float(x), float(y)) for x, y in pts]

    def parts(self):
        return self._pts


# the FFHQ 1024-scale 5-point template (eye corners + nose bottom)
TEMPLATE_1024 = np.array(
    [[686.77227723, 488.62376238], [586.77227723, 493.59405941],
     [337.91089109, 488.38613861], [437.95049505, 493.51485149],
     [513.58415842, 678.5049505]], np.float32)


@pytest.fixture()
def fake_dlib(monkeypatch, tmp_path):
    """Install a mock `dlib` module and point the weight paths at
    existing files. Two synthetic faces; landmarks are a scaled+shifted
    copy of the 1024 template, so alignment must recover that
    similarity."""
    placements = [(0.30, (60.0, 90.0)), (0.22, (420.0, 340.0))]

    def landmarks_for(scale, off):
        return TEMPLATE_1024 * scale + np.asarray(off, np.float32)

    class _CnnDetector:
        def __init__(self, path):
            self.path = path

        def __call__(self, img, scale):
            dets = []
            for s, off in placements:
                lm = landmarks_for(s, off)
                dets.append(_Det(_Rect(lm[:, 0].min() - 20,
                                       lm[:, 1].min() - 40,
                                       lm[:, 0].max() + 20,
                                       lm[:, 1].max() + 30)))
            return dets

    class _ShapePredictor:
        def __init__(self, path):
            self.path = path

        def __call__(self, img, rect):
            # recover which placement this rect belongs to by x-position
            for s, off in placements:
                lm = landmarks_for(s, off)
                if abs(rect.left() - (lm[:, 0].min() - 20)) < 1e-3:
                    return _Shape(lm)
            raise AssertionError('unknown rect')

    mod = types.ModuleType('dlib')
    mod.cnn_face_detection_model_v1 = _CnnDetector
    mod.shape_predictor = _ShapePredictor
    monkeypatch.setitem(sys.modules, 'dlib', mod)

    det_w = tmp_path / 'detector.dat'
    shape_w = tmp_path / 'shape5.dat'
    det_w.write_bytes(b'fake')
    shape_w.write_bytes(b'fake')
    from codeformer_tpu.pipeline.face_helper import FaceRestoreHelper
    monkeypatch.setattr(FaceRestoreHelper, 'DLIB_DETECTOR_WEIGHTS',
                        str(det_w))
    monkeypatch.setattr(FaceRestoreHelper, 'DLIB_SHAPE5_WEIGHTS',
                        str(shape_w))
    return placements


def test_dlib_flow_end_to_end(fake_dlib):
    from codeformer_tpu.pipeline.face_helper import FaceRestoreHelper
    helper = FaceRestoreHelper(
        upscale_factor=1, face_size=512, crop_ratio=(1, 1),
        det_model='dlib', use_parse=False, allow_random_weights=True)

    # 1024-scale template scaled to face_size
    np.testing.assert_allclose(helper.face_template,
                               TEMPLATE_1024 / 2.0, rtol=1e-5)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (820, 900, 3), np.uint8)
    helper.read_image(img)
    n = helper.get_face_landmarks_5()
    assert n == 2
    helper.align_warp_face()
    assert len(helper.cropped_faces) == 2
    assert helper.cropped_faces[0].shape == (512, 512, 3)

    # the affine must map each mocked landmark set onto the template
    for (scale, off), lm5, aff in zip(fake_dlib, helper.all_landmarks_5,
                                      helper.affine_matrices):
        lm_h = np.concatenate([lm5, np.ones((5, 1))], axis=1)
        mapped = lm_h @ aff.T
        np.testing.assert_allclose(mapped, helper.face_template,
                                   atol=0.5)

    helper.get_inverse_affine(None)
    assert len(helper.inverse_affine_matrices) == 2


def test_dlib_only_keep_largest(fake_dlib):
    from codeformer_tpu.pipeline.face_helper import FaceRestoreHelper
    helper = FaceRestoreHelper(
        upscale_factor=1, face_size=512, crop_ratio=(1, 1),
        det_model='dlib', use_parse=False, allow_random_weights=True)
    rng = np.random.default_rng(1)
    helper.read_image(rng.integers(0, 255, (820, 900, 3), np.uint8))
    n = helper.get_face_landmarks_5(only_keep_largest=True)
    assert n == 1
    # placement 0 has the larger scale -> its landmarks were kept
    expect = TEMPLATE_1024 * fake_dlib[0][0] + np.asarray(fake_dlib[0][1])
    np.testing.assert_allclose(helper.all_landmarks_5[0], expect,
                               atol=1e-3)


def test_dlib_missing_package_raises(monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, 'dlib', None)
    from codeformer_tpu.pipeline.face_helper import FaceRestoreHelper
    with pytest.raises(ImportError, match='dlib'):
        FaceRestoreHelper(upscale_factor=1, det_model='dlib',
                          use_parse=False, allow_random_weights=True)