"""MATLAB imresize / color-space parity vs the reference implementation."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from codeformer_tpu.utils.matlab_functions import (bgr2ycbcr, imresize,
                                                   rgb2ycbcr, ycbcr2rgb)

from torch_ref import _fake_basicsr, _load

_fake_basicsr()
ref = _load('basicsr.utils.matlab_functions',
            '/root/reference/basicsr/utils/matlab_functions.py')


@pytest.mark.parametrize('scale', [0.5, 0.31, 2.0, 1.3])
def test_imresize_matches_reference(scale):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (37, 53, 3)).astype(np.float32)
    ours = imresize(img, scale)
    theirs = ref.imresize(torch.from_numpy(img.transpose(2, 0, 1)), scale,
                          True).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_ycbcr_matches_reference():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    np.testing.assert_allclose(rgb2ycbcr(img), ref.rgb2ycbcr(img),
                               atol=1e-5)
    np.testing.assert_allclose(rgb2ycbcr(img, y_only=True),
                               ref.rgb2ycbcr(img, y_only=True), atol=1e-5)
    np.testing.assert_allclose(bgr2ycbcr(img), ref.bgr2ycbcr(img),
                               atol=1e-5)
    np.testing.assert_allclose(ycbcr2rgb(rgb2ycbcr(img)), img, atol=1e-4)
