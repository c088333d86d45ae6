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
        # optax.masked alone is NOT a freeze: updates for masked-out
        # leaves pass through as the raw gradient, which apply_updates
        # would then ADD to the "frozen" params. Frozen leaves must get
        # a hard zero update (torch requires_grad=False semantics).
        def label_fn(params):
            import jax
            def label(path, _):
                top = str(getattr(path[0], 'key', path[0]))
                return 'frozen' if top in fix_modules else 'train'
            return jax.tree_util.tree_map_with_path(label, params)
        tx = optax.multi_transform(
            {'train': tx, 'frozen': optax.set_to_zero()}, label_fn)
    return tx
