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


@pytest.mark.slow
def test_parity_check_weights_mode_aligned(tmp_path, monkeypatch, capsys):
    """The one-command gate (--weights DIR): synthetic golden weights ->
    torch reference run -> .pth converter -> our CLI (fp32) -> metric
    table. With identical weights the two stacks must closely agree;
    configs whose weights are absent must be reported as skipped."""
    from torch_ref import load_reference_archs

    _, cf_arch = load_reference_archs()
    torch.manual_seed(0)
    net = cf_arch.CodeFormer(dim_embd=512, codebook_size=1024, n_head=8,
                             n_layers=9,
                             connect_list=['32', '64', '128', '256'])
    wdir = tmp_path / 'weights' / 'CodeFormer'
    wdir.mkdir(parents=True)
    torch.save({'params_ema': net.state_dict()},
               str(wdir / 'codeformer.pth'))

    tool = _load_tool()
    tool.main(['--weights', str(tmp_path / 'weights'),
               '--configs', 'aligned', 'colorization',
               '--limit', '1', '--out', str(tmp_path / 'out'),
               '--dtype', 'fp32'])
    out = capsys.readouterr().out
    assert 'skipped (weights absent)' in out  # colorization row
    row = [ln for ln in out.splitlines()
           if ln.startswith('aligned')][-1]
    psnr = float(row.split()[2])
    assert psnr > 30.0, row
    # both output trees exist with the CLI layouts
    assert (tmp_path / 'out' / 'ref' / 'aligned').is_dir()
    assert (tmp_path / 'out' / 'ours' / 'aligned'
            / 'restored_faces').is_dir()


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