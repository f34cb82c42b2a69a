"""Flattened-group AdamW == per-leaf multi_transform AdamW."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from act3d_tpu.train.optim import make_optimizer, param_labels


def _params(rng):
    return {
        "backbone": {  # frozen group
            "conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 4)), jnp.float32)},
            "bn": {"scale": jnp.asarray(rng.normal(size=(4,)), jnp.float32)},
        },
        "head": {
            "dense": {
                "kernel": jnp.asarray(rng.normal(size=(4, 8)), jnp.float32),
                "bias": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
            },
            "norm": {"scale": jnp.asarray(rng.normal(size=(8,)), jnp.float32)},
        },
    }


def test_labels(rng):
    labels = param_labels(_params(rng))
    assert labels["backbone"]["conv"]["kernel"] == "frozen"
    assert labels["head"]["dense"]["kernel"] == "decay"
    assert labels["head"]["dense"]["bias"] == "no_decay"


def test_flat_matches_per_leaf(rng):
    params0 = _params(rng)
    grads = jax.tree.map(
        lambda x: jnp.asarray(rng.normal(size=x.shape), x.dtype), params0
    )

    results = {}
    for flatten in (False, True):
        tx = make_optimizer(params0, lr=1e-2, weight_decay=1e-3, flatten=flatten)
        params = params0
        state = tx.init(params)
        for step in range(4):
            g = jax.tree.map(lambda x: x * (step + 1), grads)
            updates, state = tx.update(g, state, params)
            params = optax.apply_updates(params, updates)
        results[flatten] = params

    flat_a = jax.tree_util.tree_leaves(results[False])
    flat_b = jax.tree_util.tree_leaves(results[True])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)

    # frozen leaves never moved
    np.testing.assert_array_equal(
        results[True]["backbone"]["conv"]["kernel"],
        params0["backbone"]["conv"]["kernel"],
    )


def test_flat_under_jit_and_multisteps(rng):
    params = _params(rng)
    tx = optax.MultiSteps(make_optimizer(params, lr=1e-2), every_k_schedule=2)
    state = tx.init(params)
    grads = jax.tree.map(
        lambda x: jnp.asarray(rng.normal(size=x.shape), x.dtype), params
    )

    @jax.jit
    def step(params, state):
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    p1, state = step(params, state)
    # first micro-step accumulates only: params unchanged
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(params)):
        np.testing.assert_allclose(a, b)
    p2, state = step(p1, state)
    # second micro-step applies: head params must move
    assert not np.allclose(
        np.asarray(p2["head"]["dense"]["kernel"]),
        np.asarray(params["head"]["dense"]["kernel"]),
    )
