#!/usr/bin/env python
"""Top-level shim matching the reference entry point."""
from codeformer_tpu.cli.inference_inpainting import main

if __name__ == '__main__':
    main()
