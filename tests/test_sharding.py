"""SPMD correctness: dp-sharded training equals single-device training."""

import numpy as np

import jax
import jax.numpy as jnp

from act3d_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from act3d_tpu.train.engine import Trainer


def _loss_fn(p, batch, key):
    pred = jnp.tanh(batch["x"] @ p["w1"]) @ p["w2"]
    return jnp.mean((pred - batch["y"]) ** 2), {}


def _make(rng):
    return {
        "w1": jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32) * 0.3),
        "w2": jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32) * 0.3),
    }


def test_dp_training_matches_single_device(rng):
    params = _make(rng)
    batch = {
        "x": jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32)),
        "y": jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32)),
    }
    results = {}
    for n in (1, 8):
        trainer = Trainer(_loss_fn, params, mesh=make_mesh(num_devices=n), lr=1e-2)
        losses = []
        for i in range(5):
            out = trainer.step(batch, jax.random.PRNGKey(i))
            losses.append(float(out["loss"]))
        results[n] = (losses, jax.device_get(trainer.state.params))

    np.testing.assert_allclose(results[1][0], results[8][0], rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(
            results[1][1][k], results[8][1][k], atol=1e-6
        )


def test_batch_sharding_layout(rng):
    mesh = make_mesh(num_devices=8)
    batch = {"x": np.zeros((16, 3), np.float32)}
    dev = shard_batch(batch, mesh)
    sharding = dev["x"].sharding
    # batch axis split 8 ways, feature axis replicated
    assert sharding.shard_shape(dev["x"].shape) == (2, 3)

    params = replicate({"w": np.zeros((4, 4), np.float32)}, mesh)
    assert params["w"].sharding.shard_shape((4, 4)) == (4, 4)


def test_uneven_batch_raises(rng):
    mesh = make_mesh(num_devices=8)
    batch = {"x": np.zeros((10, 3), np.float32)}  # 10 % 8 != 0
    try:
        shard_batch(batch, mesh)
        raised = False
    except ValueError:
        raised = True
    assert raised
