"""PyTorch checkpoint -> JAX/flax parameter conversion.

Converts the reference's released `.pth` state dicts (params / params_ema
keys, see basicsr/models/base_model.py:250-253) into the NHWC flax pytrees
used by this framework:

  * Conv2d  weight (O, I, kH, kW) -> kernel (kH, kW, I, O)
  * Linear  weight (O, I)         -> kernel (I, O)
  * Norms   weight/bias           -> scale/bias
  * nn.MultiheadAttention packed in_proj_weight (3E, E) -> (E, 3E)
  * BatchNorm running stats       -> batch_stats collection
  * Module list/dict indices: 'blocks.3' -> 'blocks_3',
    'fuse_convs_dict.32' -> 'fuse_convs_dict_32'
  * torch Sequential heads renamed to their flax submodule names
    ('idx_pred_layer.0' -> 'idx_pred_norm', 'scale.0' -> 'scale_0', ...)

Works on anything that yields a {key: array-like} mapping — torch tensors,
numpy arrays, or the output of the pure-python .pth reader.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

# torch-name fragment renames applied before generic index merging.
_RENAMES = [
    (re.compile(r'\bidx_pred_layer\.0\b'), 'idx_pred_norm'),
    (re.compile(r'\bidx_pred_layer\.1\b'), 'idx_pred_proj'),
    (re.compile(r'\bscale\.0\b'), 'scale_0'),
    (re.compile(r'\bscale\.2\b'), 'scale_2'),
    (re.compile(r'\bshift\.0\b'), 'shift_0'),
    (re.compile(r'\bshift\.2\b'), 'shift_2'),
]

# 2-D weights that are embeddings/parameters, not linear layers: no transpose.
_EMBEDDING_KEYS = re.compile(
    r'(quantize\.embedding\.weight|quantize\.embed\.weight|position_emb)$')


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _merge_indices(parts: list[str]) -> list[str]:
    """['blocks', '3', 'norm1'] -> ['blocks_3', 'norm1'];
    also merges string dict keys after *_dict attrs."""
    out: list[str] = []
    for p in parts:
        if out and (p.isdigit() or out[-1].endswith('_dict')):
            out[-1] = f'{out[-1]}_{p}'
        else:
            out.append(p)
    return out


def _set_in(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def torch_state_dict_to_flax(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a torch state dict into flax variables
    {'params': ..., 'batch_stats': ...} (batch_stats only when present)."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    for key, value in state_dict.items():
        if key.endswith('num_batches_tracked'):
            continue
        arr = _to_numpy(value)
        name = key
        for pat, repl in _RENAMES:
            name = pat.sub(repl, name)

        if _EMBEDDING_KEYS.search(name):
            # strip trailing '.weight' for the raw-param embeddings
            path_str = name[:-len('.weight')] if name.endswith('.weight') else name
            path = tuple(_merge_indices(path_str.split('.')))
            _set_in(params, path, arr)
            continue

        parts = name.split('.')
        leaf = parts[-1]
        prefix = _merge_indices(parts[:-1])

        if leaf == 'in_proj_weight':
            _set_in(params, (*prefix, 'in_proj_weight'), arr.T)
        elif leaf == 'in_proj_bias':
            _set_in(params, (*prefix, 'in_proj_bias'), arr)
        elif leaf == 'weight':
            if arr.ndim == 4:      # Conv2d OIHW -> HWIO
                _set_in(params, (*prefix, 'kernel'), arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:    # Linear (O, I) -> (I, O)
                _set_in(params, (*prefix, 'kernel'), arr.T)
            elif arr.ndim == 1:    # Group/Layer/BatchNorm affine
                _set_in(params, (*prefix, 'scale'), arr)
            else:
                raise ValueError(f'unhandled weight ndim for {key}: {arr.ndim}')
        elif leaf == 'bias':
            _set_in(params, (*prefix, 'bias'), arr)
        elif leaf == 'running_mean':
            _set_in(batch_stats, (*prefix, 'mean'), arr)
        elif leaf == 'running_var':
            _set_in(batch_stats, (*prefix, 'var'), arr)
        else:  # raw nn.Parameter leaves (e.g. position_emb handled above)
            _set_in(params, tuple(_merge_indices(parts)), arr)

    out: Dict[str, Any] = {'params': params}
    if batch_stats:
        out['batch_stats'] = batch_stats
    return out


def load_torch_checkpoint(path: str, param_key: str | None = None) -> Dict:
    """Load a torch .pth checkpoint and return flax variables.

    Prefers 'params_ema' then 'params' (matching the reference inference
    loaders, inference_codeformer.py:139-142), unless `param_key` is given.
    """
    import torch  # local import: torch is only needed for .pth ingestion
    chkpt = torch.load(path, map_location='cpu', weights_only=True)
    if param_key is not None:
        state = chkpt[param_key]
    elif isinstance(chkpt, dict) and 'params_ema' in chkpt:
        state = chkpt['params_ema']
    elif isinstance(chkpt, dict) and 'params' in chkpt:
        state = chkpt['params']
    else:
        state = chkpt
    # strip DataParallel 'module.' prefixes like base_model.py:222-228
    state = {k.removeprefix('module.'): v for k, v in state.items()}
    return torch_state_dict_to_flax(state)
