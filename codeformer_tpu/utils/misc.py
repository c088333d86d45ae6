"""Misc runtime utilities (reference: basicsr/utils/misc.py)."""
from __future__ import annotations

import os
import random
import time
from typing import Optional

import numpy as np


def setup_jax(compilation_cache: Optional[str] = None):
    """One-time JAX setup: persistent compilation cache (first compiles of
    the 512x512 graph take tens of seconds; cached reruns are instant)."""
    import jax
    cache = compilation_cache or os.environ.get(
        'CODEFORMER_TPU_COMPILE_CACHE', '/tmp/jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
    except Exception:
        pass


def get_device_info() -> str:
    import jax
    devs = jax.devices()
    return f'{jax.default_backend()}: {[str(d) for d in devs]}'


def set_random_seed(seed: int):
    """Seed host-side RNGs (numpy/python). Device randomness is explicit
    via jax.random keys — no global device seed exists by design."""
    random.seed(seed)
    np.random.seed(seed)


def mkdir_and_rename(path: str):
    """Make a dir, archiving any existing one with a timestamp suffix
    (reference misc.py:48-60 — keeps old experiment dirs)."""
    if os.path.exists(path):
        new_name = path + '_archived_' + time.strftime('%Y%m%d_%H%M%S')
        print(f'Path already exists. Rename it to {new_name}', flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def sizeof_fmt(size: float, suffix: str = 'B') -> str:
    """Human-readable byte size (misc.py:143-157)."""
    for unit in ['', 'K', 'M', 'G', 'T', 'P', 'E', 'Z']:
        if abs(size) < 1024.0:
            return f'{size:3.1f} {unit}{suffix}'
        size /= 1024.0
    return f'{size:3.1f} Y{suffix}'


def check_resume(opt: dict, resume_iter: int):
    """Rewrite pretrain paths to the matching resume iteration
    (reference misc.py:116-140)."""
    if not opt['path'].get('resume_state'):
        return
    networks = [k for k in opt.keys() if k.startswith('network_')]
    flag_pretrain = any(
        opt['path'].get(f'pretrain_{n}') is not None for n in
        (k.replace('network_', 'network_') for k in networks))
    if flag_pretrain:
        print('pretrain_network paths will be ignored during resuming.')
    for network in networks:
        name = f'pretrain_{network}'
        basename = network.replace('network_', '')
        if opt['path'].get('ignore_resume_networks') is None or \
                basename not in opt['path']['ignore_resume_networks']:
            opt['path'][name] = os.path.join(
                opt['path']['models'], f'net_{basename}_{resume_iter}.ckpt')
