"""Optimizer construction.

Mirrors the reference's AdamW with two parameter groups — weight decay
5e-4 for matrices, none for biases / LayerNorm params
(reference: engine.py:89-102) — plus an explicit zero-update mask for the
frozen backbone (the reference relies on ``requires_grad=False`` +
``find_unused_parameters=True``; under JAX frozen-ness must be explicit,
see SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Any

import jax
import optax

__all__ = ["make_optimizer", "param_labels"]


def _path_names(path) -> list:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        else:
            names.append(str(k))
    return names


def param_labels(params: Any) -> Any:
    """'frozen' for backbone params, 'no_decay' for 1-D params, else 'decay'.

    1-D params are exactly the reference's no-decay set (biases + LayerNorm
    scale/bias; engine.py:95).
    """

    def label(path, leaf):
        names = _path_names(path)
        if any("backbone" in n for n in names):
            return "frozen"
        if leaf.ndim <= 1:
            return "no_decay"
        return "decay"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(params: Any, lr: float = 1e-4, weight_decay: float = 5e-4):
    labels = param_labels(params)
    tx = optax.multi_transform(
        {
            "decay": optax.adamw(lr, weight_decay=weight_decay),
            "no_decay": optax.adamw(lr, weight_decay=0.0),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx
