#!/usr/bin/env python
"""Google-Drive weight fetcher (reference:
scripts/download_pretrained_models_from_gdrive.py). Requires network +
gdown; in network-less environments it prints the file-id map."""
import os
import sys
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), '..')))

import argparse

FILE_IDS = {
    'CodeFormer': {'codeformer.pth': '1v_E_vZvP-dQPF55Kc5SRCjaKTQXDz-JB'},
    'facelib': {
        'yolov5l-face.pth': '131578zMA6B2x8VQHyHfa6GEPtulMCNzV',
        'parsing_parsenet.pth': '16pkohyZZ8ViHGBk3QtVqxLZKzdo466bK',
    },
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('method', type=str,
                        help="Options: 'CodeFormer' 'facelib'. Set to "
                             "'all' to download all the models.")
    args = parser.parse_args()
    methods = list(FILE_IDS) if args.method == 'all' else [args.method]
    for method in methods:
        save_root = os.path.join('weights', method)
        os.makedirs(save_root, exist_ok=True)
        for name, file_id in FILE_IDS[method].items():
            path = os.path.join(save_root, name)
            if os.path.exists(path):
                print(f'[ok] {path}')
                continue
            url = f'https://drive.google.com/uc?id={file_id}'
            try:
                import gdown
                gdown.download(url, path, quiet=False)
            except Exception as e:
                print(f'[missing] {path}\n    source: {url}\n'
                      f'    ({type(e).__name__}: download manually)')


if __name__ == '__main__':
    main()
