#!/usr/bin/env python
"""Download (or explain how to obtain) the released pretrained weights
(reference: scripts/download_pretrained_models.py). In network-less
environments it prints the URL -> path mapping and exits non-zero for
missing files."""
import os
import sys
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), '..')))

import argparse
import os

from codeformer_tpu.utils.download_util import PRETRAINED_URLS


def download_pretrained_models(method: str, file_urls: dict) -> int:
    save_root = os.path.join('weights', method)
    os.makedirs(save_root, exist_ok=True)
    missing = 0
    for file_name, url in file_urls.items():
        save_path = os.path.join(save_root, file_name)
        if os.path.exists(save_path):
            print(f'[ok] {save_path}')
            continue
        try:
            import urllib.request
            print(f'downloading {url} -> {save_path}')
            urllib.request.urlretrieve(url, save_path)
            print(f'[ok] {save_path}')
        except Exception as e:
            missing += 1
            print(f'[missing] {save_path}\n    source: {url}\n'
                  f'    ({type(e).__name__}: download on a connected '
                  f'machine and place it there)')
    return missing


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument(
        'method', type=str,
        help=("Options: 'CodeFormer' 'facelib' 'realesrgan'. "
              "Set to 'all' to download all the models."))
    args = parser.parse_args()

    methods = list(PRETRAINED_URLS) if args.method == 'all' \
        else [args.method]
    total_missing = 0
    for method in methods:
        total_missing += download_pretrained_models(
            method, PRETRAINED_URLS[method])
    raise SystemExit(1 if total_missing else 0)
