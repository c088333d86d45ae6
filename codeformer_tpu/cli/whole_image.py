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


def _fused_mode(args) -> str:
    """Normalize --fused_pipeline to 'auto' | 'on' | 'off' (older callers
    may still pass a boolean)."""
    v = getattr(args, 'fused_pipeline', 'off')
    if v is True:
        return 'on'
    if v in (False, None):
        return 'off'
    return v


def _fused_ineligibility(args, input_video, input_img_list):
    """Why the fused device pipeline cannot serve this invocation, or
    None if it can. For folder inputs the images must already be loaded
    (uniformity/grayscale checks)."""
    if args.bg_upsampler == 'realesrgan' or args.face_upsample:
        return 'bg/face upsampler requested'
    if args.draw_box:
        return 'draw_box requested'
    if not args.detection_model.startswith('retinaface'):
        return f'detector {args.detection_model} keeps host preprocessing'
    if not input_video:
        shapes = {im.shape for im in input_img_list}
        if len(shapes) != 1:
            return f'folder images differ in size ({len(shapes)} shapes)'
        if any(img_util.is_gray(im, threshold=10)
               for im in input_img_list):
            return 'grayscale inputs need per-face tone adaptation'
    return None


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

    # decide fused vs classic BEFORE building the helper (the fused
    # pipeline runs detection/parsing in bfloat16 — the TPU-native
    # precision policy; the classic path stays float32 like the
    # reference). Folder inputs load up front for the eligibility check
    # (the fused path batches them like video frames anyway).
    mode = _fused_mode(args)
    names = None
    if not input_video:
        loaded, names = [], []
        for i, entry in enumerate(input_img_list):
            if isinstance(entry, str):
                names.append(os.path.splitext(os.path.basename(entry))[0])
                loaded.append(cv2.imread(entry, cv2.IMREAD_COLOR))
            else:
                names.append(str(i).zfill(6))
                loaded.append(entry)
        input_img_list = loaded
    use_fused = False
    if mode != 'off':
        reason = _fused_ineligibility(args, input_video, input_img_list)
        if reason is None:
            use_fused = True
        elif mode == 'on':
            raise RuntimeError(
                f'--fused_pipeline on, but the fused pipeline cannot '
                f'serve this invocation: {reason}')
        else:
            print(f'Fused pipeline unavailable ({reason}); '
                  f'using the classic per-stage path.')

    import jax.numpy as jnp
    aux_dtype = jnp.bfloat16 if use_fused else jnp.float32
    face_helper = FaceRestoreHelper(
        args.upscale, face_size=512, crop_ratio=(1, 1),
        det_model=args.detection_model, save_ext='png', use_parse=True,
        allow_random_weights=args.random_init,
        compositor=getattr(args, 'compositor', 'xla'),
        det_dtype=aux_dtype, parse_dtype=aux_dtype)

    w = args.fidelity_weight
    video_name = (os.path.splitext(os.path.basename(args.input_path))[0]
                  if input_video else None)

    if use_fused:
        # everything device-resident between stages (HBM-to-HBM)
        from codeformer_tpu.pipeline.device_pipeline import \
            DeviceRestorePipeline
        pipe = DeviceRestorePipeline(
            restorer, face_helper, upscale=args.upscale, w=w,
            only_center_face=args.only_center_face,
            parse_res=getattr(args, 'parse_res', 256))
        if input_video:
            # streaming: frames are pulled from the (lazy) source chunk
            # by chunk and written straight to the encoder — bounded
            # memory for arbitrarily long videos. PNG dumps per frame
            # are kept for output parity with the reference.
            writer = None
            n = 0
            try:
                for frame in pipe.restore_frames_stream(
                        iter(input_img_list)):
                    img_util.imwrite(frame, os.path.join(
                        result_root, 'final_results', f'{n:06d}.png'))
                    if writer is None:
                        from codeformer_tpu.utils.video_util import \
                            make_video_writer
                        meta = video_meta or {}
                        fps = meta.get('fps', 24.0)
                        if args.save_video_fps is not None:
                            fps = args.save_video_fps
                        writer = make_video_writer(
                            os.path.join(result_root,
                                         f'{video_name}.mp4'),
                            frame.shape[0], frame.shape[1], fps,
                            meta.get('audio'))
                        print('Video Saving (streaming)...')
                    writer.write_frame(frame)
                    n += 1
            finally:
                if writer is not None:
                    writer.close()
        else:
            restored_frames, faces = pipe.restore_frames(
                input_img_list, return_faces=True)
            for i, (name, frame) in enumerate(zip(names, restored_frames)):
                print(f'[{i + 1}/{len(names)}] Processing: {name} '
                      f'({len(faces[i])} faces)')
                for idx, (cropped, restored) in enumerate(faces[i]):
                    img_util.imwrite(cropped, os.path.join(
                        result_root, 'cropped_faces',
                        f'{name}_{idx:02d}.png'))
                    face_name = f'{name}_{idx:02d}.png'
                    if args.suffix is not None:
                        face_name = f'{face_name[:-4]}_{args.suffix}.png'
                    img_util.imwrite(restored, os.path.join(
                        result_root, 'restored_faces', face_name))
                save_base = name if args.suffix is None \
                    else f'{name}_{args.suffix}'
                img_util.imwrite(frame, os.path.join(
                    result_root, 'final_results', f'{save_base}.png'))
        return

    # classic paths need the frames materialized (video inputs may
    # arrive as a lazy stream from _open_video_stream)
    if input_video and not isinstance(input_img_list, list):
        input_img_list = list(input_img_list)

    # classic batched fast path for videos: frames flow through each
    # neural stage in batches (detection / restoration / parsing)
    if input_video and bg_upsampler is None and face_upsampler is None \
            and not args.draw_box:
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
                basename = names[i] if names is not None \
                    else str(i).zfill(6)
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
