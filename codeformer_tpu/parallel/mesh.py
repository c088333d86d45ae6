"""Device-mesh construction — the TPU-native replacement for the reference's
NCCL process groups (basicsr/utils/dist_util.py).

There is no rank/world_size bootstrap: a `jax.sharding.Mesh` over ICI (and a
'dcn' outer axis for multi-slice, if ever needed) plus NamedSharding
annotations replace init_dist / DistributedDataParallel / dist.reduce. XLA
inserts the collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(n_devices: Optional[int] = None,
                model_parallel: int = 1,
                axis_names: Sequence[str] = ('data', 'model'),
                devices=None) -> Mesh:
    """Create a (data, model) mesh.

    `model_parallel` devices cooperate on one replica (tensor-parallel axis);
    the rest is pure data parallelism — the reference's only strategy
    (SURVEY.md §2h), generalized. Defaults to all visible devices, model=1.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if n_devices % model_parallel != 0:
        raise ValueError(
            f'n_devices={n_devices} not divisible by '
            f'model_parallel={model_parallel}')
    grid = np.asarray(devices).reshape(n_devices // model_parallel,
                                       model_parallel)
    return Mesh(grid, axis_names)


def local_batch_slice(global_batch: int, mesh: Mesh,
                      axis: str = 'data') -> int:
    """Per-data-shard batch size; the analog of the reference's
    EnlargedSampler rank arithmetic (basicsr/data/data_sampler.py:29-42)."""
    n = mesh.shape[axis]
    if global_batch % n != 0:
        raise ValueError(f'global batch {global_batch} not divisible by '
                         f'data axis size {n}')
    return global_batch // n
