#!/usr/bin/env python
"""Quality-parity harness: compare our restored outputs against reference
outputs (PSNR/SSIM always; LPIPS when VGG weights are present).

Usage: restore the same inputs with the reference PyTorch repo and with
this framework, then

    python scripts/parity_check.py --ours results/cropped_faces_0.5 \
        --theirs /path/to/reference/results/cropped_faces_0.5

The BASELINE acceptance criterion is LPIPS delta < 0.01 vs the reference
(BASELINE.md); this script is the measurement tool once the released
weights are in place.
"""
import os
import sys
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), '..')))

import argparse
import glob

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--ours', type=str, required=True)
    parser.add_argument('--theirs', type=str, required=True)
    args = parser.parse_args()

    from codeformer_tpu.metrics import calculate_psnr, calculate_ssim

    lpips_fn = None
    try:
        from codeformer_tpu.train.perceptual import LPIPSLoss
        import jax.numpy as jnp
        lpips = LPIPSLoss(use_input_norm=True, range_norm=True)

        def lpips_fn(a, b):
            aa = jnp.asarray(a[..., ::-1] / 127.5 - 1.0,
                             jnp.float32)[None]
            bb = jnp.asarray(b[..., ::-1] / 127.5 - 1.0,
                             jnp.float32)[None]
            return float(lpips(aa, bb))
    except FileNotFoundError as e:
        print(f'[note] LPIPS unavailable: {e}')

    def find(root):
        return {os.path.basename(p): p for p in
                glob.glob(os.path.join(root, '**', '*.[jp][pn]g'),
                          recursive=True)}

    ours = find(args.ours)
    theirs = find(args.theirs)
    common = sorted(set(ours) & set(theirs))
    if not common:
        raise SystemExit('no common output files found')

    psnrs, ssims, lpipss = [], [], []
    for name in common:
        a = cv2.imread(ours[name])
        b = cv2.imread(theirs[name])
        if a is None or b is None or a.shape != b.shape:
            print(f'[skip] {name}: unreadable or shape mismatch')
            continue
        psnrs.append(calculate_psnr(a, b, crop_border=0))
        ssims.append(calculate_ssim(a, b, crop_border=0))
        if lpips_fn is not None:
            lpipss.append(lpips_fn(a, b))
        print(f'{name}: psnr {psnrs[-1]:.2f} ssim {ssims[-1]:.4f}'
              + (f' lpips {lpipss[-1]:.4f}' if lpipss else ''))

    print(f'\n== {len(psnrs)} pairs ==')
    print(f'PSNR  mean {np.mean(psnrs):.2f} dB (inf = identical)')
    print(f'SSIM  mean {np.mean(ssims):.4f}')
    if lpipss:
        print(f'LPIPS mean {np.mean(lpipss):.4f} '
              f'(acceptance: < 0.01 vs reference)')


if __name__ == '__main__':
    main()
