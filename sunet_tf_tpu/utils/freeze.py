"""Parameter freezing (reference utils/model_utils.py:6-18 freeze/unfreeze).

In a functional framework freezing is an optimizer concern: build a boolean
mask over the param tree and wrap the optimizer with optax.masked / zero
updates for frozen leaves.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def freeze_mask(params, predicate: Callable[[tuple], bool]):
    """Boolean pytree: True where the parameter (addressed by its key path)
    is TRAINABLE. predicate receives the jax.tree_util key path."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = [p for p, _ in flat]
    treedef = jax.tree.structure(params)
    return jax.tree.unflatten(treedef, [predicate(p) for p in paths])


def partition_trainable(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Apply tx only where mask is True; frozen leaves get zero updates."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", mask),
    )
