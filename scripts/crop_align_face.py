#!/usr/bin/env python
"""FFHQ-style face crop+align tool (reference: scripts/crop_align_face.py).

The reference uses dlib 68-point landmarks + the NVlabs ffhq-dataset
oriented-quad recipe (scripts/crop_align_face.py:38-70). Both landmark
sources are implemented: --landmark-source dlib runs the 68-point dlib
flow when the dlib package + weights are present; the default
--landmark-source retinaface uses the 5-point detector (the facelib
face_utils variant of the same quad recipe), which needs no extra
packages.
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


DLIB_68_WEIGHTS = 'weights/dlib/shape_predictor_68_face_landmarks-fbdc2cb8.dat'


def make_dlib_landmarker():
    """dlib frontal detector + 68-point predictor, largest face kept
    (reference scripts/crop_align_face.py:38-70). Raises only when the
    dlib package or its .dat weights are missing."""
    try:
        import dlib
    except ImportError as e:
        raise SystemExit('dlib package not installed: '
                         'conda install -c conda-forge dlib') from e
    if not os.path.exists(DLIB_68_WEIGHTS):
        raise SystemExit(f'dlib weights missing at {DLIB_68_WEIGHTS}; '
                         'fetch with scripts/download_pretrained_models.py dlib')
    detector = dlib.get_frontal_face_detector()
    predictor = dlib.shape_predictor(DLIB_68_WEIGHTS)

    def get_landmarks(img_bgr):
        import numpy as np
        img = img_bgr[..., ::-1]  # dlib wants RGB
        dets = detector(img, 1)
        print(f'\tNumber of faces detected: {len(dets)}')
        if not dets:
            return None
        areas = [(d.right() - d.left()) * (d.bottom() - d.top())
                 for d in dets]
        d = dets[int(np.argmax(areas))]
        shape = predictor(img, d)
        return np.array([[p.x, p.y] for p in shape.parts()])  # (68, 2)

    return get_landmarks


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
        get_lm = make_dlib_landmarker()
    else:
        from codeformer_tpu.pipeline.detector import init_detection_model
        detector = init_detection_model('retinaface_resnet50',
                                        allow_random=args.random_init)
        get_lm = lambda img: get_landmarks_retinaface(detector, img)

    for i, in_path in enumerate(img_list):
        img_name = os.path.basename(in_path)
        print(f'[{i + 1}/{len(img_list)}] Processing: {img_name}')
        img = cv2.imread(in_path)
        lm = get_lm(img)
        if lm is None:
            print('\tno face detected, skipping')
            continue
        face, _ = align_crop_face_landmarks(img, lm, args.output_size)
        out_path = os.path.join(
            args.out_dir, img_name.replace('.jpg', '.png'))
        cv2.imwrite(out_path, face)


if __name__ == '__main__':
    main()
