"""Parameter/activation sharding rules.

The CodeFormer family is small (~94M params) so the primary strategy is data
parallelism with replicated params; the transformer MLP / attention / logits
projections and the codebook are additionally shardable over a 'model' axis
(tensor parallelism) for large-batch serving where weight-replication HBM
matters. XLA inserts all collectives from these annotations.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-path fragments whose kernels are tensor-shardable on their output dim
_COL_SHARDED = ('linear1', 'in_proj_weight')
# ... and on their input dim (row-parallel: follows a col-parallel matmul)
_ROW_SHARDED = ('linear2', 'out_proj')


def infer_param_spec(path: tuple, leaf: Any, mesh: Mesh) -> P:
    """PartitionSpec for one parameter leaf given its tree path."""
    if 'model' not in mesh.axis_names or mesh.shape['model'] == 1:
        return P()
    names = [getattr(p, 'key', getattr(p, 'name', str(p))) for p in path]
    m = mesh.shape['model']
    joined = '/'.join(str(n) for n in names)
    last = leaf.shape[-1] if hasattr(leaf, 'shape') and leaf.ndim else 0

    if any(f in joined for f in _COL_SHARDED) and leaf.ndim >= 2 \
            and last % m == 0:
        return P(*([None] * (leaf.ndim - 1)), 'model')
    if any(f in joined for f in _ROW_SHARDED) and leaf.ndim == 2 \
            and leaf.shape[0] % m == 0:
        return P('model', None)
    # codebook: shard entries over the model axis (argmin/one-hot matmul
    # become partial + collective under XLA)
    if joined.endswith('quantize/embedding') and leaf.shape[0] % m == 0:
        return P('model', None)
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a parameter tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh,
                                         infer_param_spec(path, leaf, mesh)),
        params)


def batch_sharding(mesh: Mesh, ndim: int = 4,
                   axis: str = 'data') -> NamedSharding:
    """Batch-dim sharding for activations/inputs (data parallelism)."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
