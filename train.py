#!/usr/bin/env python
"""Training entry point matching the reference invocation:
`python train.py -opt options/CodeFormer_stage2.yml` (the reference uses
`python basicsr/train.py -opt ...`; same flags)."""
import os.path as osp

from codeformer_tpu.train.train import train_pipeline

if __name__ == '__main__':
    root_path = osp.abspath(osp.dirname(__file__))
    train_pipeline(root_path)
