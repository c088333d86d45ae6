"""Whole-image / video restoration path: detect -> align -> batched restore
-> parse-guided paste-back (reference main loop:
inference_codeformer.py:160-272).

TPU-first restructuring: the reference restores image-by-image and
face-by-face; here the neural stages batch ACROSS files — all faces from
the whole folder flow through CodeFormer and ParseNet in bucketed batches
(like pipeline/video.py batches across frames), and only the host-side
read/detect/align/paste bookkeeping stays per image.
"""
from __future__ import annotations

import glob
import os

import cv2
import numpy as np

from codeformer_tpu.pipeline.face_helper import FaceRestoreHelper
from codeformer_tpu.utils import img_util
from codeformer_tpu.utils.profiler import stage


def run_whole_images(args, input_img_list, result_root, restorer,
                     input_video, video_meta=None):
    if args.bg_upsampler == 'realesrgan':
        from codeformer_tpu.pipeline.realesrgan import set_realesrgan
        bg_upsampler = set_realesrgan(tile=args.bg_tile,
                                      allow_random=args.random_init)
    else:
        bg_upsampler = None
    if args.face_upsample:
        if bg_upsampler is not None:
            face_upsampler = bg_upsampler
        else:
            from codeformer_tpu.pipeline.realesrgan import set_realesrgan
            face_upsampler = set_realesrgan(tile=args.bg_tile,
                                            allow_random=args.random_init)
    else:
        face_upsampler = None

    # the fused device pipeline runs detection/parsing in bfloat16 (the
    # TPU-native precision policy; argmax'd masks and NMS'd boxes are
    # robust to it) — the classic path stays float32 like the reference
    import jax.numpy as jnp
    aux_dtype = (jnp.bfloat16 if getattr(args, 'fused_pipeline', False)
                 else jnp.float32)
    face_helper = FaceRestoreHelper(
        args.upscale, face_size=512, crop_ratio=(1, 1),
        det_model=args.detection_model, save_ext='png', use_parse=True,
        allow_random_weights=args.random_init,
        compositor=getattr(args, 'compositor', 'xla'),
        det_dtype=aux_dtype, parse_dtype=aux_dtype)

    w = args.fidelity_weight
    video_name = (os.path.splitext(os.path.basename(args.input_path))[0]
                  if input_video else None)

    # batched fast path for videos: frames flow through each neural stage
    # in batches (detection / restoration / parsing)
    if input_video and bg_upsampler is None and face_upsampler is None \
            and not args.draw_box:
        if getattr(args, 'fused_pipeline', False):
            # everything device-resident between stages (HBM-to-HBM)
            from codeformer_tpu.pipeline.device_pipeline import \
                DeviceRestorePipeline
            pipe = DeviceRestorePipeline(
                restorer, face_helper, upscale=args.upscale, w=w,
                only_center_face=args.only_center_face)
            restored_frames = pipe.restore_frames(input_img_list)
        else:
            from codeformer_tpu.pipeline.video import restore_video_frames
            restored_frames = restore_video_frames(
                input_img_list, restorer, face_helper, w=w,
                upscale=args.upscale,
                only_center_face=args.only_center_face)
        for i, frame in enumerate(restored_frames):
            img_util.imwrite(frame, os.path.join(
                result_root, 'final_results', f'{i:06d}.png'))
        _write_video(args, result_root, video_name, video_meta)
        return

    # ---- pass 1 (per image): read + detect + align, collect all faces ----
    records = []
    all_faces = []
    with stage('folder_detect_align'):
        for i, img_path in enumerate(input_img_list):
            face_helper.clean_all()
            if isinstance(img_path, str):
                img_name = os.path.basename(img_path)
                basename, ext = os.path.splitext(img_name)
                print(f'[{i + 1}/{len(input_img_list)}] '
                      f'Processing: {img_name}')
                img = cv2.imread(img_path, cv2.IMREAD_COLOR)
            else:
                basename = str(i).zfill(6)
                img_name = f'{video_name}_{basename}' if input_video \
                    else basename
                print(f'[{i + 1}/{len(input_img_list)}] '
                      f'Processing: {img_name}')
                img = img_path

            face_helper.read_image(img)
            num_det_faces = face_helper.get_face_landmarks_5(
                only_center_face=args.only_center_face, resize=640,
                eye_dist_threshold=5)
            print(f'\tdetect {num_det_faces} faces')
            face_helper.align_warp_face()
            face_helper.get_inverse_affine(None)

            records.append({
                'basename': basename,
                'input_img': face_helper.input_img,
                'is_gray': face_helper.is_gray,
                'cropped': list(face_helper.cropped_faces),
                'inv_affines': list(face_helper.inverse_affine_matrices),
                'start': len(all_faces),
            })
            all_faces.extend(face_helper.cropped_faces)

    # ---- pass 2: ONE bucketed restoration stream over every face ----
    with stage('folder_restore'):
        restored_all = restorer.restore_batch(all_faces, w=w, adain=True) \
            if all_faces else []

    # ---- pass 3: per-face gray adaptation, then one parsing stream ----
    processed = []
    for rec in records:
        n = len(rec['cropped'])
        face_helper.clean_all()
        face_helper.is_gray = rec['is_gray']
        for j in range(n):
            face_helper.add_restored_face(
                restored_all[rec['start'] + j], rec['cropped'][j])
        rec['restored'] = list(face_helper.restored_faces)
        processed.extend(face_helper.restored_faces)

    # precompute parse masks across ALL files in one stream; with a
    # face_upsampler the reference parses the UPSAMPLED face, so leave
    # parsing to the per-image paste call in that case
    parse_ids_all = None
    if face_helper.use_parse and processed and face_upsampler is None:
        with stage('folder_parse'):
            parse_ids_all = face_helper._parse_masks(processed)

    # ---- pass 4 (per image): background upsample + paste + save ----
    for rec in records:
        face_helper.clean_all()
        face_helper.input_img = rec['input_img']
        face_helper.is_gray = rec['is_gray']
        face_helper.restored_faces = rec['restored']
        face_helper.inverse_affine_matrices = rec['inv_affines']
        basename = rec['basename']
        n = len(rec['cropped'])

        if bg_upsampler is not None:
            with stage('folder_bg_upsample'):
                bg_img = bg_upsampler.enhance(
                    rec['input_img'], outscale=args.upscale)[0]
        else:
            bg_img = None

        if parse_ids_all is not None:
            face_helper._precomputed_parse_ids = \
                parse_ids_all[rec['start']:rec['start'] + n]
        try:
            with stage('folder_paste'):
                if args.face_upsample and face_upsampler is not None:
                    restored_img = face_helper.paste_faces_to_input_image(
                        upsample_img=bg_img, draw_box=args.draw_box,
                        face_upsampler=face_upsampler)
                else:
                    restored_img = face_helper.paste_faces_to_input_image(
                        upsample_img=bg_img, draw_box=args.draw_box)
        finally:
            face_helper._precomputed_parse_ids = None

        # save faces
        for idx, (cropped_face, restored_face) in enumerate(zip(
                rec['cropped'], rec['restored'])):
            save_crop_path = os.path.join(result_root, 'cropped_faces',
                                          f'{basename}_{idx:02d}.png')
            img_util.imwrite(cropped_face, save_crop_path)
            save_face_name = f'{basename}_{idx:02d}.png'
            if args.suffix is not None:
                save_face_name = f'{save_face_name[:-4]}_{args.suffix}.png'
            img_util.imwrite(restored_face,
                             os.path.join(result_root, 'restored_faces',
                                          save_face_name))

        if restored_img is not None:
            save_base = basename
            if args.suffix is not None:
                save_base = f'{basename}_{args.suffix}'
            img_util.imwrite(restored_img,
                             os.path.join(result_root, 'final_results',
                                          f'{save_base}.png'))

    if input_video:
        _write_video(args, result_root, video_name, video_meta)


def _write_video(args, result_root, video_name, video_meta):
    from codeformer_tpu.utils.video_util import make_video_writer
    print('Video Saving...')
    img_list = sorted(glob.glob(
        os.path.join(result_root, 'final_results', '*.[jp][pn]g')))
    video_frames = [cv2.imread(p) for p in img_list]
    height, width = video_frames[0].shape[:2]
    fps = (video_meta or {}).get('fps', 24.0)
    audio = (video_meta or {}).get('audio')
    if args.save_video_fps is not None:
        fps = args.save_video_fps
    save_restore_path = os.path.join(result_root, f'{video_name}.mp4')
    vidwriter = make_video_writer(save_restore_path, height, width,
                                  fps, audio)
    for f in video_frames:
        vidwriter.write_frame(f)
    vidwriter.close()
