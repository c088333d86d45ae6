"""Checkpoint IO: flax msgpack for our native format, plus ingestion of the
reference's released torch `.pth` files via the converter.

Native format: a single msgpack file holding the variables pytree (and a
small JSON sidecar-free header dict), written atomically. Training states
(optimizers, schedulers, step) are handled by orbax in train/ — this module
covers inference weights, the analog of net_g_*.pth
(basicsr/models/base_model.py:170-200).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def save_params(variables: Dict[str, Any], path: str):
    """Serialize a variables pytree to msgpack (atomic write)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_vars = jax.tree.map(np.asarray, variables)
    # to_state_dict converts namedtuples/tuples (e.g. optax states) into
    # msgpack-serializable nested dicts
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(host_vars))
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, path)


def load_params(path: str) -> Dict[str, Any]:
    """Load a variables pytree from msgpack."""
    with open(path, 'rb') as f:
        return serialization.msgpack_restore(f.read())


def init_params_fast(model, *sample_args, seed: int = 0,
                     **sample_kwargs) -> Dict[str, Any]:
    """Heuristic parameter initialization WITHOUT compiling the model.

    flax's model.init traces AND compiles the full forward graph — tens of
    seconds for the 512x512 CodeFormer on the tunneled TPU. For random-init
    smoke tests / benchmarks we only need correctly-shaped, sane-scaled
    leaves: eval_shape gives the tree (trace only, no compile), then each
    leaf is filled by name: norm scales -> 1, biases -> 0, kernels ->
    scaled normal, embeddings -> uniform.
    """
    import jax

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *sample_args,
                           **sample_kwargs))
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], 'key') else path[-1])
        shape, dtype = leaf.shape, leaf.dtype
        if name == 'scale':
            return np.ones(shape, dtype)
        if name in ('bias', 'in_proj_bias', 'position_emb', 'mean'):
            return np.zeros(shape, dtype)
        if name == 'var':
            return np.ones(shape, dtype)
        if name in ('embedding', 'embed'):
            k = shape[0]
            return rng.uniform(-1.0 / k, 1.0 / k, shape).astype(dtype)
        fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else shape[0]
        std = (2.0 / max(fan_in, 1)) ** 0.5
        return (rng.standard_normal(shape) * std).astype(dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def save_orbax(variables: Dict[str, Any], path: str):
    """Orbax backend: sharded/async-capable checkpointing for large or
    multi-host training states (the production alternative to msgpack;
    SURVEY §5 checkpoint/resume)."""
    import orbax.checkpoint as ocp
    from flax import serialization as ser
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), ser.to_state_dict(variables),
               force=True)


def load_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def load_checkpoint(path: str, param_key: str | None = None
                    ) -> Dict[str, Any]:
    """Load inference weights from either our msgpack format or a reference
    torch .pth checkpoint (converted on the fly)."""
    if path.endswith(('.pth', '.pt')):
        from .convert import load_torch_checkpoint
        return load_torch_checkpoint(path, param_key)
    tree = load_params(path)
    # our native net_*.ckpt hold {'params', 'params_ema'} — serve EMA by
    # default like the reference (base_model.py:250-253)
    if param_key is not None and param_key in tree:
        return {'params': tree[param_key]}
    if 'params_ema' in tree:
        return {'params': tree['params_ema']}
    if 'params' in tree:
        return {'params': tree['params'],
                **({'batch_stats': tree['batch_stats']}
                   if 'batch_stats' in tree else {})}
    return tree
