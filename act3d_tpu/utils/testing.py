"""Synthetic batch builders shared by tests, bench.py and __graft_entry__.py."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BOUNDS = ((-0.5, -0.5, 0.5), (0.5, 0.5, 1.5))


def synthetic_trajectory_batch(
    batch: int = 2,
    ncam: int = 3,
    image_size: Tuple[int, int] = (256, 256),
    traj_len: int = 50,
    seed: int = 0,
):
    """A fixed-shape trajectory-training batch matching the dataset schema
    (reference datasets/dataset_engine.py:239-252 with action_dim=7)."""
    rng = np.random.default_rng(seed)
    h, w = image_size
    rgb = rng.uniform(0, 1, (batch, ncam, 3, h, w)).astype(np.float32)
    pcd = rng.uniform(-0.4, 1.4, (batch, ncam, 3, h, w)).astype(np.float32)
    quat = rng.normal(size=(batch, traj_len, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    traj = np.concatenate(
        [rng.uniform(-0.4, 1.4, (batch, traj_len, 3)).astype(np.float32), quat],
        axis=-1,
    )
    mask = np.zeros((batch, traj_len), bool)
    instr = rng.normal(size=(batch, 53, 512)).astype(np.float32)

    def pose():
        q = rng.normal(size=(batch, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        p = rng.uniform(-0.4, 1.4, (batch, 3)).astype(np.float32)
        return np.concatenate([p, q], axis=-1)

    return {
        "trajectory": jnp.asarray(traj),
        "trajectory_mask": jnp.asarray(mask),
        "rgbs": jnp.asarray(rgb),
        "pcds": jnp.asarray(pcd),
        "instr": jnp.asarray(instr),
        "curr_gripper": jnp.asarray(pose()),
        "action": jnp.asarray(pose()),  # goal gripper (keypose)
    }


def synthetic_keypose_batch(
    batch: int = 2,
    ncam: int = 3,
    image_size: Tuple[int, int] = (256, 256),
    seed: int = 0,
):
    """A keypose-training batch (reference main_keypose.py:284-292)."""
    rng = np.random.default_rng(seed)
    h, w = image_size
    rgb = rng.uniform(0, 1, (batch, ncam, 3, h, w)).astype(np.float32)
    pcd = rng.uniform(-0.4, 1.4, (batch, ncam, 3, h, w)).astype(np.float32)
    instr = rng.normal(size=(batch, 53, 512)).astype(np.float32)

    def pose8():
        q = rng.normal(size=(batch, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        p = rng.uniform(-0.3, 0.9, (batch, 3)).astype(np.float32)
        g = rng.integers(0, 2, (batch, 1)).astype(np.float32)
        return np.concatenate([p, q, g], axis=-1)

    return {
        "rgbs": jnp.asarray(rgb),
        "pcds": jnp.asarray(pcd),
        "instr": jnp.asarray(instr),
        "curr_gripper": jnp.asarray(pose8()),
        "action": jnp.asarray(pose8()),
    }
