#!/usr/bin/env python
"""Quality-parity gate vs the reference PyTorch CodeFormer.

Two modes:

1. Compare two output directories (restore the same inputs with the
   reference repo and with this framework, anywhere):

       python scripts/parity_check.py --ours results/cropped_faces_0.5 \
           --theirs /path/to/reference/results/cropped_faces_0.5

2. ONE-COMMAND end-to-end gate, pointed at a weights directory laid out
   like the reference's `weights/` (weights/README.md;
   scripts/download_pretrained_models.py of the reference):

       python scripts/parity_check.py --weights /path/to/weights

   For every BASELINE config whose weights are present it (a) runs the
   reference's own PyTorch model/pipeline (arch modules imported from
   /root/reference via tests/torch_ref.py) on the shipped `inputs/`
   fixtures, (b) runs OUR CLI on the same inputs through the .pth
   converter (utils/convert.py), and (c) prints the PSNR/SSIM/LPIPS
   delta table. LPIPS needs `<weights>/vgg/{vgg16.pth,lpips_vgg.pth}`
   (docs/parity_runbook.md §1).

   Configs (BASELINE.json):
     aligned      inputs/cropped_faces   --has_aligned, w (default 0.5)
                  ref: inference_codeformer.py:180-213
     colorization inputs/gray_faces      w=0, adain
                  ref: inference_colorization.py:56-85
     inpainting   inputs/masked_faces    w=1, no adain, mask composite
                  ref: inference_inpainting.py:56-90
     whole        inputs/whole_imgs      detect+align+restore+paste
                  ref: inference_codeformer.py:160-272

The acceptance criterion is LPIPS delta < 0.01 vs the reference
(BASELINE.md). Our CLI runs fp32 by default here (--dtype) so the
numbers isolate implementation parity; pass --dtype bf16 to audit the
TPU serving precision instead.
"""
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

import argparse
import glob

import cv2
import numpy as np

CONFIGS = ('aligned', 'colorization', 'inpainting', 'whole')


# ---------------------------------------------------------------------------
# metric plumbing
# ---------------------------------------------------------------------------

def make_lpips():
    """LPIPS scorer or None (with a note) when VGG weights are absent."""
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

        return lpips_fn
    except FileNotFoundError as e:
        print(f'[note] LPIPS unavailable: {e}')
        return None


def compare_dirs(ours_root, theirs_root, lpips_fn, verbose=True):
    """Match output images by basename and score them. Returns
    (n_pairs, psnr_mean, ssim_mean, lpips_mean_or_None)."""
    from codeformer_tpu.metrics import calculate_psnr, calculate_ssim

    def find(root):
        return {os.path.basename(p): p for p in
                glob.glob(os.path.join(root, '**', '*.[jp][pn]g'),
                          recursive=True)}

    ours = find(ours_root)
    theirs = find(theirs_root)
    common = sorted(set(ours) & set(theirs))
    if not common:
        raise SystemExit(
            f'no common output files between {ours_root} and '
            f'{theirs_root}')

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
        if verbose:
            print(f'{name}: psnr {psnrs[-1]:.2f} ssim {ssims[-1]:.4f}'
                  + (f' lpips {lpipss[-1]:.4f}' if lpipss else ''))
    return (len(psnrs), float(np.mean(psnrs)), float(np.mean(ssims)),
            float(np.mean(lpipss)) if lpipss else None)


# ---------------------------------------------------------------------------
# reference (torch) runners — the reference's own inference loops on its
# own arch modules, weights loaded from --weights
# ---------------------------------------------------------------------------

def _ref_codeformer(ckpt_path, codebook_size, connect_list):
    import torch
    from torch_ref import load_reference_archs
    _, cf_arch = load_reference_archs()
    net = cf_arch.CodeFormer(dim_embd=512, codebook_size=codebook_size,
                             n_head=8, n_layers=9,
                             connect_list=list(connect_list))
    state = torch.load(ckpt_path, map_location='cpu',
                       weights_only=False)
    if isinstance(state, dict) and 'params_ema' in state:
        state = state['params_ema']
    elif isinstance(state, dict) and 'params' in state:
        state = state['params']
    net.load_state_dict(state)
    net.eval()
    return net


def _bgr_to_ref_tensor(img_bgr):
    """reference img2tensor + normalize((0.5,)*3): BGR u8 -> (1,3,H,W)
    RGB in [-1, 1] (inference_codeformer.py:199-201)."""
    import torch
    x = img_bgr[..., ::-1].astype(np.float32) / 255.0
    t = torch.from_numpy(np.ascontiguousarray(x.transpose(2, 0, 1)))
    return ((t - 0.5) / 0.5).unsqueeze(0)


def _ref_tensor_to_bgr(t):
    """reference tensor2img(min_max=(-1,1)): (3,H,W) RGB -> BGR u8."""
    x = t.detach().clamp_(-1, 1).numpy()
    x = (x + 1.0) / 2.0
    x = (x.transpose(1, 2, 0)[..., ::-1] * 255.0).round()
    return x.astype(np.uint8)


def run_ref_aligned_family(config, ckpt_path, img_paths, out_dir, w):
    """aligned / colorization / inpainting reference loops (their CLI
    semantics, see module docstring for file:line cites)."""
    import torch

    spec = {
        'aligned': dict(codebook=1024,
                        connect=('32', '64', '128', '256')),
        'colorization': dict(codebook=1024, connect=('32', '64', '128')),
        'inpainting': dict(codebook=512, connect=('32', '64', '128')),
    }[config]
    net = _ref_codeformer(ckpt_path, spec['codebook'], spec['connect'])
    os.makedirs(out_dir, exist_ok=True)
    for p in img_paths:
        name = os.path.splitext(os.path.basename(p))[0]
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if config == 'aligned':
            img = cv2.resize(img, (512, 512),
                             interpolation=cv2.INTER_LINEAR)
        x = _bgr_to_ref_tensor(img)
        with torch.no_grad():
            if config == 'aligned':
                out = net(x, w=w, adain=True)[0]
                from codeformer_tpu.utils import img_util
                face = _ref_tensor_to_bgr(out[0])
                if img_util.is_gray(img, threshold=10):
                    # add_restored_face gray branch
                    # (face_restoration_helper.py:364-369)
                    face = img_util.adain_color_transfer(
                        img_util.bgr2gray3(face), img)
            elif config == 'colorization':
                out = net(x, w=0, adain=True)[0]
                face = _ref_tensor_to_bgr(out[0])
            else:  # inpainting (inference_inpainting.py:66-75)
                mask = (x[0].sum(dim=0) == 3.0).float()[None, None]
                out = net(x, w=1, adain=False)[0]
                out = (1 - mask) * x + mask * out
                face = _ref_tensor_to_bgr(out[0])
        cv2.imwrite(os.path.join(out_dir, f'{name}.png'), face)


import contextlib


@contextlib.contextmanager
def weights_cwd(weights_dir):
    """Temp cwd whose ./weights symlinks `weights_dir`, so both the
    reference's and our relative 'weights/facelib/...' lookups
    resolve."""
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        os.symlink(os.path.abspath(weights_dir),
                   os.path.join(td, 'weights'))
        old = os.getcwd()
        os.chdir(td)
        try:
            yield
        finally:
            os.chdir(old)


def run_ref_whole(weights_dir, ckpt_path, img_paths, out_dir, w,
                  upscale=2):
    """Reference whole-image loop (inference_codeformer.py:160-272) on
    the reference's own FaceRestoreHelper, detection and parsing models.
    Needs weights/facelib/{detection_Resnet50_Final,parsing_parsenet}.pth
    under `weights_dir`."""
    import torch
    from torch_ref import load_face_restoration_helper

    frh = load_face_restoration_helper()
    net = _ref_codeformer(ckpt_path, 1024, ('32', '64', '128', '256'))

    os.makedirs(out_dir, exist_ok=True)
    img_paths = [os.path.abspath(p) for p in img_paths]
    out_dir = os.path.abspath(out_dir)
    with weights_cwd(weights_dir):
        helper = frh.FaceRestoreHelper(
            upscale, face_size=512, crop_ratio=(1, 1),
            det_model='retinaface_resnet50', save_ext='png',
            use_parse=True, device='cpu')
        for p in img_paths:
            name = os.path.splitext(os.path.basename(p))[0]
            helper.clean_all()
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            helper.read_image(img)
            helper.get_face_landmarks_5(only_center_face=False,
                                        resize=640, eye_dist_threshold=5)
            helper.align_warp_face()
            for cropped in helper.cropped_faces:
                x = _bgr_to_ref_tensor(cropped)
                with torch.no_grad():
                    out = net(x, w=w, adain=True)[0]
                helper.add_restored_face(
                    _ref_tensor_to_bgr(out[0]).astype('uint8'), cropped)
            helper.get_inverse_affine(None)
            restored = helper.paste_faces_to_input_image(
                upsample_img=None, draw_box=False)
            cv2.imwrite(os.path.join(out_dir, f'{name}.png'), restored)


# ---------------------------------------------------------------------------
# our runners — the shipped CLIs, in-process
# ---------------------------------------------------------------------------

def run_ours(config, ckpt_path, inputs_dir, out_dir, w, dtype,
             weights_dir=None):
    ckpt_path = os.path.abspath(ckpt_path)
    inputs_dir = os.path.abspath(inputs_dir)
    out_dir = os.path.abspath(out_dir)
    if config == 'aligned':
        from codeformer_tpu.cli.inference_codeformer import main
        main(['-i', inputs_dir, '-w', str(w), '--has_aligned',
              '--checkpoint', ckpt_path, '--dtype', dtype,
              '-o', out_dir])
        return os.path.join(out_dir, 'restored_faces')
    if config == 'colorization':
        from codeformer_tpu.cli.inference_colorization import main
        main(['-i', inputs_dir, '--checkpoint', ckpt_path,
              '--dtype', dtype, '-o', out_dir])
        return out_dir
    if config == 'inpainting':
        from codeformer_tpu.cli.inference_inpainting import main
        main(['-i', inputs_dir, '--checkpoint', ckpt_path,
              '--dtype', dtype, '-o', out_dir])
        return out_dir
    # whole-image: the shipped default path (fused when eligible). Our
    # helper resolves weights/facelib/* relative to cwd like the
    # reference, hence weights_cwd.
    from codeformer_tpu.cli.inference_codeformer import main
    with weights_cwd(weights_dir):
        main(['-i', inputs_dir, '-w', str(w), '-s', '2',
              '--checkpoint', ckpt_path, '--dtype', dtype,
              '-o', out_dir])
    return os.path.join(out_dir, 'final_results')


# ---------------------------------------------------------------------------
# weights-mode orchestration
# ---------------------------------------------------------------------------

WEIGHTS_OF = {
    'aligned': ('CodeFormer/codeformer.pth',),
    'colorization': ('CodeFormer/codeformer_colorization.pth',),
    'inpainting': ('CodeFormer/codeformer_inpainting.pth',),
    'whole': ('CodeFormer/codeformer.pth',
              'facelib/detection_Resnet50_Final.pth',
              'facelib/parsing_parsenet.pth'),
}

INPUTS_OF = {
    'aligned': 'inputs/cropped_faces',
    'colorization': 'inputs/gray_faces',
    'inpainting': 'inputs/masked_faces',
    'whole': 'inputs/whole_imgs',
}


def run_weights_mode(args):
    rows = []
    vgg_dir = os.path.join(args.weights, 'vgg')
    if os.path.isdir(vgg_dir):
        # point the LPIPS head at the weights dir's vgg/ copies
        import codeformer_tpu.train.perceptual as perc
        perc.VGG16_WEIGHTS = os.path.join(vgg_dir, 'vgg16.pth')
        perc.LPIPS_LIN_WEIGHTS = os.path.join(vgg_dir, 'lpips_vgg.pth')
    lpips_fn = make_lpips()

    for config in args.configs:
        missing = [f for f in WEIGHTS_OF[config]
                   if not os.path.exists(os.path.join(args.weights, f))]
        if missing:
            print(f'[{config}] SKIPPED — missing weights: {missing}')
            rows.append((config, None))
            continue
        inputs_dir = os.path.join(REPO, INPUTS_OF[config])
        img_paths = sorted(
            glob.glob(os.path.join(inputs_dir, '*.[jpJP][pnPN]*[gG]')))
        if args.limit:
            img_paths = img_paths[:args.limit]
        ckpt = os.path.join(args.weights, WEIGHTS_OF[config][0])
        ref_dir = os.path.join(args.out, 'ref', config)
        ours_dir = os.path.join(args.out, 'ours', config)

        print(f'[{config}] reference (torch) on {len(img_paths)} '
              f'images ...')
        if config == 'whole':
            run_ref_whole(args.weights, ckpt, img_paths, ref_dir, args.w)
        else:
            run_ref_aligned_family(config, ckpt, img_paths, ref_dir,
                                   args.w)

        print(f'[{config}] ours (CLI, dtype={args.dtype}) ...')
        sub_inputs = inputs_dir
        if args.limit:
            import shutil
            import tempfile
            sub_inputs = tempfile.mkdtemp(prefix=f'parity_{config}_')
            for p in img_paths:
                shutil.copy(p, sub_inputs)
        ours_cmp = run_ours(config, ckpt, sub_inputs, ours_dir, args.w,
                            args.dtype, weights_dir=args.weights)

        n, psnr, ssim, lp = compare_dirs(ours_cmp, ref_dir, lpips_fn,
                                         verbose=False)
        rows.append((config, (n, psnr, ssim, lp)))

    print('\n== quality parity vs reference (weights: '
          f'{args.weights}, ours dtype={args.dtype}) ==')
    print(f'{"config":14s} {"n":>3s} {"PSNR":>8s} {"SSIM":>7s} '
          f'{"LPIPS":>8s}  verdict')
    ok = True
    for config, r in rows:
        if r is None:
            print(f'{config:14s} {"-":>3s} {"-":>8s} {"-":>7s} '
                  f'{"-":>8s}  skipped (weights absent)')
            continue
        n, psnr, ssim, lp = r
        if lp is None:
            verdict = 'no-LPIPS (add vgg/ weights)'
        elif lp < 0.01:
            verdict = 'PASS (<0.01)'
        else:
            verdict = 'FAIL (>=0.01)'
            ok = False
        print(f'{config:14s} {n:3d} {psnr:8.2f} {ssim:7.4f} '
              f'{lp if lp is not None else float("nan"):8.4f}  {verdict}')
    return ok


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--ours', type=str, default=None)
    parser.add_argument('--theirs', type=str, default=None)
    parser.add_argument('--weights', type=str, default=None,
                        help='reference-layout weights dir: runs the '
                             'full converter->CLI->metric gate for '
                             'every config whose weights are present')
    parser.add_argument('--configs', type=str, nargs='+',
                        default=list(CONFIGS), choices=list(CONFIGS))
    parser.add_argument('--out', type=str, default='results/parity')
    parser.add_argument('-w', type=float, default=0.5,
                        help='fidelity weight for aligned/whole')
    parser.add_argument('--dtype', type=str, default='fp32',
                        choices=['fp32', 'bf16'],
                        help='our CLI compute dtype (fp32 isolates '
                             'implementation parity; bf16 audits the '
                             'TPU serving precision)')
    parser.add_argument('--limit', type=int, default=0,
                        help='cap images per config (0 = all)')
    args = parser.parse_args(argv)

    if args.weights:
        ok = run_weights_mode(args)
        if not ok:
            sys.exit(1)
        return

    if not (args.ours and args.theirs):
        parser.error('need --weights DIR, or --ours DIR --theirs DIR')

    n, psnr, ssim, lp = compare_dirs(args.ours, args.theirs,
                                     make_lpips())
    print(f'\n== {n} pairs ==')
    print(f'PSNR  mean {psnr:.2f} dB (inf = identical)')
    print(f'SSIM  mean {ssim:.4f}')
    if lp is not None:
        print(f'LPIPS mean {lp:.4f} (acceptance: < 0.01 vs reference)')


if __name__ == '__main__':
    main()
