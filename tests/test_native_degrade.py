"""Native fused degradation kernel: parity vs the cv2 chain."""
import numpy as np
import pytest

from codeformer_tpu.data.degradations import bivariate_gaussian
from codeformer_tpu.data.native import degrade_batch_native, get_lib

cv2 = pytest.importorskip('cv2')


@pytest.mark.skipif(get_lib() is None,
                    reason='native library unavailable (no toolchain)')
@pytest.mark.parametrize('scale', [2, 8])
def test_native_degrade_matches_cv2(scale):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    kernels = np.stack([bivariate_gaussian(9, 1.5),
                        bivariate_gaussian(9, 3.0, 1.0, 0.5,
                                           isotropic=False)])
    d = 96 // scale
    down = np.array([[d, d]] * 2, np.int32)
    sigma = np.zeros(2, np.float32)  # deterministic comparison
    out = degrade_batch_native(imgs, kernels, down, sigma, 96)
    assert out is not None
    ref = []
    for i in range(2):
        x = cv2.filter2D(imgs[i], -1, kernels[i])
        x = cv2.resize(x, (d, d), interpolation=cv2.INTER_LINEAR)
        x = cv2.resize(x, (96, 96), interpolation=cv2.INTER_LINEAR)
        ref.append(x)
    np.testing.assert_allclose(out, np.stack(ref), atol=2e-5)


@pytest.mark.skipif(get_lib() is None,
                    reason='native library unavailable')
def test_native_noise_statistics():
    rng = np.random.default_rng(1)
    imgs = np.full((1, 64, 64, 3), 0.5, np.float32)
    kernels = bivariate_gaussian(3, 0.01)[None]  # ~identity
    down = np.array([[64, 64]], np.int32)
    sigma = np.array([0.05], np.float32)
    out = degrade_batch_native(imgs, kernels, down, sigma, 64, seed=7)
    noise = out[0] - 0.5
    assert abs(float(noise.mean())) < 0.005
    assert abs(float(noise.std()) - 0.05) < 0.01
    # different seed -> different noise
    out2 = degrade_batch_native(imgs, kernels, down, sigma, 64, seed=8)
    assert np.abs(out - out2).max() > 0.01
