"""Folder -> LMDB dataset packer (reference: basicsr/utils/lmdb_util.py):
encodes images to png bytes, writes an lmdb with md5-keyed meta_info.txt.
Gated on the lmdb package (not in this image); the packer logic is complete
so it works wherever lmdb is installed."""
from __future__ import annotations

import os.path as osp
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import cv2


def make_lmdb_from_imgs(data_path: str, lmdb_path: str,
                        img_path_list: List[str], keys: List[str],
                        batch: int = 5000, compress_level: int = 1,
                        multiprocessing_read: bool = False,
                        n_thread: int = 40,
                        map_size: Optional[int] = None):
    """(lmdb_util.py:9-135)"""
    try:
        import lmdb
    except ImportError:
        raise ImportError('lmdb package is required for make_lmdb_from_imgs '
                          '(not available in this image)')
    assert len(img_path_list) == len(keys)
    if not lmdb_path.endswith('.lmdb'):
        raise ValueError("lmdb_path must end with '.lmdb'.")
    if osp.exists(lmdb_path):
        raise FileExistsError(f'Folder {lmdb_path} already exists.')

    def read_img(path, key):
        img = cv2.imread(osp.join(data_path, path), cv2.IMREAD_UNCHANGED)
        _, img_byte = cv2.imencode(
            '.png', img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        h, w = img.shape[0], img.shape[1]
        c = img.shape[2] if img.ndim == 3 else 1
        return key, img_byte.tobytes(), (h, w, c)

    if multiprocessing_read:
        with ThreadPoolExecutor(n_thread) as pool:
            results = list(pool.map(lambda a: read_img(*a),
                                    zip(img_path_list, keys)))
        dataset = {k: (b, shape) for k, b, shape in results}
    else:
        dataset = None

    if map_size is None:
        _, probe, _ = read_img(img_path_list[0], keys[0])
        map_size = len(probe) * len(img_path_list) * 10

    env = lmdb.open(lmdb_path, map_size=map_size)
    txn = env.begin(write=True)
    meta_lines = []
    for idx, (path, key) in enumerate(zip(img_path_list, keys)):
        if dataset is not None:
            img_byte, (h, w, c) = dataset[key]
        else:
            _, img_byte, (h, w, c) = read_img(path, key)
        txn.put(key.encode('ascii'), img_byte)
        meta_lines.append(f'{key}.png ({h},{w},{c}) {compress_level}\n')
        if (idx + 1) % batch == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.close()
    with open(osp.join(lmdb_path, 'meta_info.txt'), 'w') as f:
        f.writelines(meta_lines)
    print(f'Finish writing lmdb {lmdb_path}.')
