"""CI dry-run of scripts/parity_check.py on synthetic weights/images so
the quality-parity tool can't rot before the released weights arrive
(docs/parity_runbook.md). Uses the same synthetic VGG16/lin-head
generators as test_lpips."""
import importlib.util
import os
import sys

import cv2
import numpy as np
import pytest
import torch


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), '..', 'scripts',
                        'parity_check.py')
    spec = importlib.util.spec_from_file_location('parity_check', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_pairs(tmp_path, noisy):
    rng = np.random.default_rng(0)
    ours = tmp_path / 'ours'
    theirs = tmp_path / 'theirs'
    ours.mkdir()
    theirs.mkdir()
    for i in range(3):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        cv2.imwrite(str(theirs / f'{i}.png'), img)
        out = img.copy()
        if noisy:
            out = np.clip(img.astype(np.int16)
                          + rng.integers(-6, 7, img.shape), 0,
                          255).astype(np.uint8)
        cv2.imwrite(str(ours / f'{i}.png'), out)
    return ours, theirs


def test_parity_check_psnr_ssim_no_lpips(tmp_path, monkeypatch, capsys):
    """Without VGG weights the tool must still report PSNR/SSIM and note
    that LPIPS is unavailable."""
    ours, theirs = _write_pairs(tmp_path, noisy=True)
    tool = _load_tool()
    monkeypatch.setattr(sys, 'argv', ['parity_check.py', '--ours',
                                      str(ours), '--theirs', str(theirs)])
    tool.main()
    out = capsys.readouterr().out
    assert 'PSNR  mean' in out
    assert 'SSIM  mean' in out
    assert 'LPIPS unavailable' in out or 'LPIPS mean' in out


def test_parity_check_with_synthetic_lpips(tmp_path, monkeypatch, capsys):
    """Full pipeline incl. LPIPS against a synthetic VGG16 + lin heads:
    identical pairs must score LPIPS ~0 (and PSNR inf)."""
    from tests.test_lpips import _make_lin_sd, _make_vgg16_sd

    rng = np.random.default_rng(1)
    vgg_path = tmp_path / 'vgg16.pth'
    lin_path = tmp_path / 'lins.pth'
    torch.save(_make_vgg16_sd(rng), str(vgg_path))
    torch.save(_make_lin_sd(rng), str(lin_path))

    import codeformer_tpu.train.perceptual as perc
    monkeypatch.setattr(perc, 'VGG16_WEIGHTS', str(vgg_path))
    monkeypatch.setattr(perc, 'LPIPS_LIN_WEIGHTS', str(lin_path))

    ours, theirs = _write_pairs(tmp_path, noisy=False)
    tool = _load_tool()
    monkeypatch.setattr(sys, 'argv', ['parity_check.py', '--ours',
                                      str(ours), '--theirs', str(theirs)])
    tool.main()
    out = capsys.readouterr().out
    assert 'LPIPS mean 0.0000' in out, out
    assert 'PSNR  mean inf' in out