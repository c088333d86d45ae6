"""Optimizer construction from YAML (`optim_g:` / `optim_d:` blocks).

The reference supports Adam only (base_model.py:79-84); we mirror that and
add the frozen-module masking that replaces `requires_grad=False` for
fix_modules (codeformer_arch.py:172-175): masked leaves get zero updates.
"""
from __future__ import annotations

from typing import Optional, Sequence

import optax


def build_optimizer(train_opt_optim: dict, schedule,
                    fix_modules: Optional[Sequence[str]] = None
                    ) -> optax.GradientTransformation:
    opt = dict(train_opt_optim)
    otype = opt.pop('type', 'Adam')
    if otype != 'Adam':
        raise NotImplementedError(
            f'optimizer {otype} is not supported (reference supports Adam '
            f'only, base_model.py:83)')
    betas = opt.get('betas', (0.9, 0.999))
    wd = float(opt.get('weight_decay', 0) or 0)
    tx = optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=1e-8),
        optax.add_decayed_weights(wd) if wd else optax.identity(),
        optax.scale_by_learning_rate(schedule),
    )
    if fix_modules:
        def mask_fn(params):
            import jax
            def trainable(path, _):
                top = str(getattr(path[0], 'key', path[0]))
                return top not in fix_modules
            return jax.tree_util.tree_map_with_path(trainable, params)
        tx = optax.masked(tx, mask_fn)
    return tx
