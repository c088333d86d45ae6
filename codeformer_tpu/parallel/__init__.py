from .mesh import create_mesh, local_batch_slice
from .sharding import (batch_sharding, infer_param_spec, param_shardings,
                       replicated)

__all__ = [
    'create_mesh', 'local_batch_slice', 'infer_param_spec',
    'param_shardings', 'batch_sharding', 'replicated',
]
