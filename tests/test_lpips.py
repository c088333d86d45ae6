"""LPIPSLoss parity vs an independent torch oracle of the lpips
net='vgg' pipeline (lpips package semantics: ScalingLayer -> VGG16 taps
relu1_2/2_2/3_3/4_3/5_3 -> unit-normalize -> trained 1x1 heads -> spatial
mean; reference basicsr/losses/losses.py:256-282 wraps it with range +
ImageNet normalization). Synthetic random weights exercise the exact same
math as released ones."""
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

VGG16_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
TAP_AFTER = {0: 1, 1: 1, 2: 2, 3: 2, 4: 2}  # tap conv index per stage


def _make_vgg16_sd(rng):
    sd = {}
    idx = 0
    in_ch = 3
    for ch, n_convs in VGG16_PLAN:
        for _ in range(n_convs):
            sd[f'features.{idx}.weight'] = torch.tensor(
                rng.normal(0, 0.08, (ch, in_ch, 3, 3)).astype(np.float32))
            sd[f'features.{idx}.bias'] = torch.tensor(
                rng.normal(0, 0.02, (ch,)).astype(np.float32))
            idx += 2
            in_ch = ch
        idx += 1  # pool
    return sd


def _make_lin_sd(rng):
    chans = [64, 128, 256, 512, 512]
    return {f'lin{i}.model.1.weight': torch.tensor(
        rng.uniform(0, 0.2, (1, c, 1, 1)).astype(np.float32))
        for i, c in enumerate(chans)}


def _torch_lpips(sd, lins, x, gt, range_norm=True, input_norm=True):
    """Independent NCHW oracle."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def pre(img):
        if range_norm:
            img = (img + 1) / 2
        if input_norm:
            img = (img - mean) / std
        return (img - shift) / scale

    def features(img):
        taps = []
        idx = 0
        h = img
        for s, (ch, n_convs) in enumerate(VGG16_PLAN):
            for j in range(n_convs):
                wgt = sd[f'features.{idx}.weight']
                b = sd[f'features.{idx}.bias']
                h = F.relu(F.conv2d(h, wgt, b, padding=1))
                if j == TAP_AFTER[s]:
                    taps.append(h)
                idx += 2
            h = F.max_pool2d(h, 2)
            idx += 1
        return taps

    fx = features(pre(x))
    fg = features(pre(gt))
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fg)):
        a = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        d = F.conv2d(d, lins[f'lin{i}.model.1.weight'])
        total += d.mean()
    return float(total)


@pytest.fixture()
def weights_dir(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    monkeypatch.chdir(tmp_path)
    os.makedirs('weights/vgg')
    sd = _make_vgg16_sd(rng)
    lins = _make_lin_sd(rng)
    torch.save(sd, 'weights/vgg/vgg16.pth')
    torch.save(lins, 'weights/vgg/lpips_vgg.pth')
    return sd, lins


def test_lpips_matches_torch_oracle(weights_dir):
    sd, lins = weights_dir
    from codeformer_tpu.train.perceptual import LPIPSLoss
    loss = LPIPSLoss(loss_weight=1.0, use_input_norm=True,
                     range_norm=True)
    assert not loss.degraded

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    gt = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    got = float(loss(x, gt))
    want = _torch_lpips(sd, lins,
                        torch.tensor(x.transpose(0, 3, 1, 2)),
                        torch.tensor(gt.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(got, want, rtol=2e-4)
    # identity
    assert abs(float(loss(x, x))) < 1e-6

    # trainers wrap the loss in jax.checkpoint under `train: remat: true`
    # (BaseTrainer._build_perceptual): same value, same input gradient —
    # only the backward's residual set changes
    import jax
    ck = jax.checkpoint(loss, prevent_cse=False)
    g_plain = jax.grad(lambda a: loss(a, gt))(x)
    g_ck = jax.grad(lambda a: ck(a, gt))(x)
    np.testing.assert_allclose(float(ck(x, gt)), got, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_ck), np.asarray(g_plain),
                               rtol=2e-5, atol=1e-7)


def test_lpips_degraded_fallbacks(tmp_path, monkeypatch, caplog):
    import logging
    rng = np.random.default_rng(2)
    monkeypatch.chdir(tmp_path)
    os.makedirs('weights/vgg')
    # only a vgg19 state dict: triggers both fallbacks, loudly
    sd = {}
    idx = 0
    in_ch = 3
    for ch, n_convs in [(64, 2), (128, 2), (256, 4), (512, 4), (512, 4)]:
        for _ in range(n_convs):
            sd[f'features.{idx}.weight'] = torch.tensor(
                rng.normal(0, 0.08, (ch, in_ch, 3, 3)).astype(np.float32))
            sd[f'features.{idx}.bias'] = torch.zeros(ch)
            idx += 2
            in_ch = ch
        idx += 1
    torch.save(sd, 'weights/vgg/vgg19.pth')

    from codeformer_tpu.train import perceptual
    from codeformer_tpu.train.perceptual import LPIPSLoss

    # capture the root logger's warnings directly (it doesn't propagate)
    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    from codeformer_tpu.utils.logger import get_root_logger
    get_root_logger().addHandler(Grab(level=logging.WARNING))
    try:
        loss = LPIPSLoss()
    finally:
        get_root_logger().handlers.pop()
    assert loss.degraded
    assert loss.layers == perceptual.LPIPS_LAYERS_VGG19
    assert loss.lins is None
    assert any('VGG19' in m for m in records)
    assert any('uniform heads' in m for m in records)
    x = np.random.default_rng(3).uniform(
        -1, 1, (1, 32, 32, 3)).astype(np.float32)
    assert float(loss(x, x)) < 1e-6
