"""Determinism + data-feeder tests.

The reference relies on global seeding + cudnn.deterministic
(main_keypose.py:511-520); here determinism is structural — explicit PRNG
key threading — and these tests pin it.
"""

import numpy as np

import jax
import jax.numpy as jnp


def _tiny_trainer(seed):
    from act3d_tpu.parallel.mesh import make_mesh
    from act3d_tpu.train.engine import Trainer

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(6, 6)).astype(np.float32))}

    def loss_fn(p, batch, key):
        noise = jax.random.normal(key, batch["x"].shape)
        pred = (batch["x"] + 0.01 * noise) @ p["w"]
        return jnp.mean((pred - batch["y"]) ** 2), {}

    mesh = make_mesh(num_devices=2)
    return Trainer(loss_fn, params, mesh=mesh, lr=1e-2)


def test_training_is_deterministic():
    batch = {
        "x": jnp.asarray(
            np.random.default_rng(1).normal(size=(8, 6)).astype(np.float32)
        ),
        "y": jnp.zeros((8, 6), jnp.float32),
    }
    losses = []
    for _ in range(2):
        trainer = _tiny_trainer(0)
        run = []
        key = jax.random.PRNGKey(42)
        for _ in range(3):
            key, sub = jax.random.split(key)
            run.append(float(trainer.step(batch, sub)["loss"]))
        losses.append(run)
    assert losses[0] == losses[1]


def test_model_forward_deterministic(rng):
    from act3d_tpu.models import DiffusionPlanner

    model = DiffusionPlanner(
        image_size=(128, 128), embedding_dim=24,
        num_query_cross_attn_layers=3, diffusion_timesteps=5,
        gripper_loc_bounds=((-1.0,) * 3, (1.0,) * 3),
    )
    rgb = jnp.asarray(rng.uniform(0, 1, (1, 1, 3, 128, 128)).astype(np.float32))
    pcd = jnp.asarray(rng.uniform(-1, 1, (1, 1, 3, 128, 128)).astype(np.float32))
    grip = jnp.asarray(rng.uniform(0, 1, (1, 7)).astype(np.float32))
    traj = jnp.asarray(rng.uniform(-1, 1, (1, 4, 7)).astype(np.float32))
    mask = jnp.zeros((1, 4), bool)
    variables = model.init(
        jax.random.PRNGKey(0), traj, mask, rgb, pcd, None, grip, grip,
        noise_rng=jax.random.PRNGKey(1),
    )
    l1 = model.apply(
        variables, traj, mask, rgb, pcd, None, grip, grip,
        noise_rng=jax.random.PRNGKey(7),
    )
    l2 = model.apply(
        variables, traj, mask, rgb, pcd, None, grip, grip,
        noise_rng=jax.random.PRNGKey(7),
    )
    assert float(l1) == float(l2)


def test_device_feeder_prefetches():
    from act3d_tpu.data.feeder import DeviceFeeder

    counter = {"n": 0}

    def batch_fn():
        counter["n"] += 1
        return {"x": np.full((4, 2), counter["n"], np.float32)}

    feeder = DeviceFeeder(batch_fn, prefetch=2)
    seen = [np.asarray(next(feeder)["x"])[0, 0] for _ in range(5)]
    feeder.close()
    # batches arrive in order, no duplicates or gaps
    assert seen == sorted(seen)
    assert len(set(seen)) == 5
