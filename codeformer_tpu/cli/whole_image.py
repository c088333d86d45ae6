"""Whole-image / video restoration path: detect -> align -> restore ->
paste back. Placeholder until the detection/parsing stack lands."""
from __future__ import annotations

import sys


def run_whole_images(args, input_img_list, result_root, restorer,
                     input_video):
    sys.exit(
        'Whole-image restoration (face detection + paste-back) is not wired '
        'into this build yet — run with --has_aligned on 512x512 cropped '
        'faces. The detection/parsing stack lands in the next milestones.')
