"""Skew-Gaussian kernel parity against the reference gaussian_kernels.py
(loaded standalone with a shim for the removed scipy.ndimage.interpolation
path)."""
import importlib.util
import sys
import types

import numpy as np
import pytest


@pytest.fixture(scope='module')
def ref_kernels():
    # scipy>=1.14 removed scipy.ndimage.interpolation; the reference still
    # imports `shift` from there
    if 'scipy.ndimage.interpolation' not in sys.modules:
        from scipy.ndimage import shift
        shim = types.ModuleType('scipy.ndimage.interpolation')
        shim.shift = shift
        sys.modules['scipy.ndimage.interpolation'] = shim
    spec = importlib.util.spec_from_file_location(
        'ref_gaussian_kernels',
        '/root/reference/basicsr/data/gaussian_kernels.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_skew_kernel_matches_reference(ref_kernels):
    from codeformer_tpu.data.degradations import \
        bivariate_skew_gaussian_center
    rng = np.random.default_rng(0)
    for _ in range(4):
        sx = rng.uniform(0.7, 5.0)
        sy = rng.uniform(0.7, 5.0)
        theta = rng.uniform(-np.pi, np.pi)
        thres = 3.0 / max(sx, sy)
        d = rng.uniform(-thres, thres, (2, 2))
        want = ref_kernels.bivariate_skew_Gaussian_center(
            21, sx, sy, theta, d)
        got = bivariate_skew_gaussian_center(21, sx, sy, theta, d)
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert abs(got.sum() - 1.0) < 1e-5


def test_aniso_kernel_matches_reference(ref_kernels):
    from codeformer_tpu.data.degradations import bivariate_gaussian
    want = ref_kernels.bivariate_anisotropic_Gaussian(21, 2.0, 4.0, 0.7)
    got = bivariate_gaussian(21, 2.0, 4.0, 0.7, isotropic=False)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mixed_dispatcher_accepts_skew():
    from codeformer_tpu.data.degradations import random_mixed_kernels
    k = random_mixed_kernels(['skew'], [1.0], 21, (0.6, 5), (0.6, 5),
                             rng=np.random.default_rng(3))
    assert k.shape == (21, 21)
    assert abs(k.sum() - 1.0) < 1e-5
    # skew kernels are asymmetric (unlike iso/aniso)
    assert not np.allclose(k, k[::-1, ::-1], atol=1e-6)
