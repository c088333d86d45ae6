"""Command-line interfaces mirroring the reference's public CLI surface
(inference_codeformer.py / inference_colorization.py /
inference_inpainting.py flags, defaults, and results layout)."""
