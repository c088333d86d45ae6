"""Photometric jitter (color_jitter_pt numpy port) + dataset RNG tests.

Oracle for adjust_hue: Python stdlib colorsys per-pixel HSV round trip —
the same math torchvision's float path implements
(ref basicsr/data/ffhq_blind_dataset.py:124-143).
"""
import colorsys
from concurrent.futures import ThreadPoolExecutor

import cv2
import numpy as np
import pytest

from codeformer_tpu.data.transforms import (adjust_brightness,
                                            adjust_contrast, adjust_hue,
                                            adjust_saturation,
                                            color_jitter_pt)


def _rand_img(seed, shape=(13, 11, 3)):
    return np.random.default_rng(seed).uniform(0, 1, shape).astype(
        np.float32)


def test_adjust_identity_factors():
    img = _rand_img(0)
    np.testing.assert_allclose(adjust_brightness(img, 1.0), img, atol=1e-6)
    np.testing.assert_allclose(adjust_contrast(img, 1.0), img, atol=1e-6)
    np.testing.assert_allclose(adjust_saturation(img, 1.0), img, atol=1e-6)
    np.testing.assert_allclose(adjust_hue(img, 0.0), img, atol=1e-5)


def test_adjust_saturation_zero_is_gray():
    img = _rand_img(1)
    out = adjust_saturation(img, 0.0)
    assert np.allclose(out[..., 0], out[..., 1], atol=1e-6)
    assert np.allclose(out[..., 1], out[..., 2], atol=1e-6)


def test_adjust_hue_matches_colorsys():
    img = _rand_img(2, (6, 5, 3))
    for factor in (-0.37, -0.1, 0.05, 0.25, 0.49):
        out = adjust_hue(img, factor)
        expect = np.empty_like(img)
        for y in range(img.shape[0]):
            for x in range(img.shape[1]):
                h, s, v = colorsys.rgb_to_hsv(*img[y, x])
                expect[y, x] = colorsys.hsv_to_rgb((h + factor) % 1.0, s, v)
        np.testing.assert_allclose(out, expect, atol=1e-5)


def test_adjust_hue_full_turn_identity():
    img = _rand_img(3)
    # +0.5 twice = full turn
    out = adjust_hue(adjust_hue(img, 0.5), 0.5)
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_color_jitter_pt_deterministic_and_bounded():
    img = _rand_img(4, (32, 32, 3))
    a = color_jitter_pt(img, (0.5, 1.5), (0.5, 1.5), (0, 1.5),
                        (-0.1, 0.1), np.random.default_rng(7))
    b = color_jitter_pt(img, (0.5, 1.5), (0.5, 1.5), (0, 1.5),
                        (-0.1, 0.1), np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert not np.allclose(a, img)  # something actually changed


# ---------------- dataset RNG: thread safety + reproducibility -----------

@pytest.fixture(scope='module')
def tiny_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp('ffhq_aug')
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        cv2.imwrite(str(root / f'{i:05d}.png'), img)
    return str(root)


def _ds_opt(root, **extra):
    opt = {'dataroot_gt': root, 'io_backend': {'type': 'disk'},
           'in_size': 64, 'gt_size': 64, 'use_hflip': True,
           'use_corrupt': True, 'blur_kernel_size': 7,
           'kernel_list': ['iso', 'aniso'], 'kernel_prob': [0.5, 0.5],
           'blur_sigma': [1, 5], 'downsample_range': [2, 8],
           'noise_range': [0, 10], 'jpeg_range': [60, 90], 'seed': 11}
    opt.update(extra)
    return opt


def test_dataset_rng_reproducible_across_threads(tiny_folder):
    """Same seed => identical samples regardless of the fetch thread pool
    (the loader maps __getitem__ across threads; ADVICE round-1 item)."""
    from codeformer_tpu.data.ffhq_blind_dataset import FFHQBlindDataset

    ds_a = FFHQBlindDataset(_ds_opt(tiny_folder))
    seq = [ds_a[i]['in'] for i in range(4)]  # serial, visit 0 each

    ds_b = FFHQBlindDataset(_ds_opt(tiny_folder))
    with ThreadPoolExecutor(4) as pool:
        par = list(pool.map(ds_b.__getitem__, range(4)))
    for i in range(4):
        np.testing.assert_array_equal(seq[i], par[i]['in'])


def test_dataset_rng_varies_across_visits(tiny_folder):
    """Revisiting the same index must produce a fresh degradation draw
    (per-epoch variety, like the reference's global RNG stream)."""
    from codeformer_tpu.data.ffhq_blind_dataset import FFHQBlindDataset

    ds = FFHQBlindDataset(_ds_opt(tiny_folder))
    first = ds[0]['in']
    second = ds[0]['in']
    assert not np.array_equal(first, second)


def test_dataset_color_jitter_pt_applied(tiny_folder):
    """color_jitter_pt_prob=1 must change the LQ branch (and never GT)."""
    from codeformer_tpu.data.ffhq_blind_dataset import FFHQBlindDataset

    base = FFHQBlindDataset(_ds_opt(tiny_folder, use_hflip=False,
                                    use_corrupt=False))
    jit = FFHQBlindDataset(_ds_opt(tiny_folder, use_hflip=False,
                                   use_corrupt=False,
                                   color_jitter_pt_prob=1.0))
    a, b = base[1], jit[1]
    np.testing.assert_array_equal(a['gt'], b['gt'])
    assert not np.array_equal(a['in'], b['in'])


def test_device_prefetcher_order_and_content():
    """DevicePrefetcher must preserve order/content while staging one
    batch ahead (CUDAPrefetcher analog)."""
    from codeformer_tpu.data.loader import DevicePrefetcher
    import jax

    batches = [{'x': np.full((2, 3), i, np.float32), 'gt_path': [f'p{i}']}
               for i in range(5)]
    staged_log = []

    def stage(batch):
        staged_log.append(float(batch['x'][0, 0]))
        return {'x': jax.device_put(batch['x'])}

    out = list(DevicePrefetcher(batches, stage=stage))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b['x'], jax.Array)
        np.testing.assert_array_equal(np.asarray(b['x']),
                                      np.full((2, 3), i, np.float32))
    # batch i+1 was staged before batch i was yielded
    assert staged_log == [0.0, 1.0, 2.0, 3.0, 4.0]
