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
import jax.numpy as jnp
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


def make_optimizer(
    params: Any,
    lr: float = 1e-4,
    weight_decay: float = 5e-4,
    flatten: bool = True,
):
    """AdamW with the reference's decay/no-decay groups + frozen backbone.

    flatten=True (default) runs each group's AdamW over ONE concatenated
    1-D vector instead of per-leaf: the act3d step trace showed ~5 ms/step
    of µs-scale per-parameter update fusions (hundreds of (60,), (60,60)
    tensors) — two fused vector updates replace them.  The frozen group
    carries no optimizer state at all.  Checkpointed opt_state layout
    differs from the per-leaf form (concatenated moments).
    """
    labels = param_labels(params)
    if not flatten:
        return optax.multi_transform(
            {
                "decay": optax.adamw(lr, weight_decay=weight_decay),
                "no_decay": optax.adamw(lr, weight_decay=0.0),
                "frozen": optax.set_to_zero(),
            },
            labels,
        )

    label_leaves, treedef = jax.tree_util.tree_flatten(labels)
    groups = {
        "decay": optax.adamw(lr, weight_decay=weight_decay),
        "no_decay": optax.adamw(lr, weight_decay=0.0),
    }
    group_ids = {
        g: [i for i, l in enumerate(label_leaves) if l == g] for g in groups
    }

    def _flat(leaves, ids):
        """Concatenate group leaves into one vector, zero-padded to a
        1024 multiple so the moment vectors divide evenly over any
        power-of-two fsdp axis (parallel/mesh.py param_sharding)."""
        flat = jnp.concatenate([leaves[i].reshape(-1) for i in ids])
        pad = (-flat.size) % 1024
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
        return flat

    def init_fn(params):
        leaves = treedef.flatten_up_to(params)
        return {
            g: groups[g].init(_flat(leaves, ids))
            for g, ids in group_ids.items()
            if ids
        }

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("flattened AdamW requires params")
        gl = treedef.flatten_up_to(grads)
        pl = treedef.flatten_up_to(params)
        upd = [jnp.zeros_like(x) for x in gl]  # frozen leaves: zero update
        new_state = {}
        for g, ids in group_ids.items():
            if not ids:
                continue
            u, new_state[g] = groups[g].update(
                _flat(gl, ids), state[g], _flat(pl, ids)
            )
            off = 0
            for i in ids:
                n = gl[i].size
                upd[i] = u[off : off + n].reshape(gl[i].shape).astype(gl[i].dtype)
                off += n
        return treedef.unflatten(upd), new_state

    return optax.GradientTransformation(init_fn, update_fn)
