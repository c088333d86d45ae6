#!/usr/bin/env python
"""Top-level shim matching the reference entry point:
`python inference_codeformer.py -w 0.5 --input_path ... [--has_aligned]`."""
from codeformer_tpu.cli.inference_codeformer import main

if __name__ == '__main__':
    main()
