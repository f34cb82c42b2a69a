"""Device mesh + sharding helpers.

The reference scales with single-node DDP over NCCL
(reference: engine.py:121-124, main_keypose.py:517).  The TPU-native
equivalent is SPMD data-parallelism over a 1-D ``jax.sharding.Mesh``:
batches are sharded over the ``dp`` axis (riding ICI), parameters are
replicated, and XLA inserts the gradient all-reduce automatically when a
jitted step computes a mean over the sharded batch dimension.

The mesh is sized to the available devices; tests exercise an 8-way
virtual CPU mesh (``xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
]


def make_mesh(
    num_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the dp axis."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with the batch dim sharded.

    Batch sizes must divide the dp axis; callers pad or drop remainders
    (mirroring DataLoader(drop_last=True), reference engine.py:60).
    """
    sharding = batch_sharding(mesh)
    ndev = mesh.devices.size
    leaves = jax.tree_util.tree_leaves(batch)
    if leaves and leaves[0].shape[0] % ndev != 0:
        raise ValueError(
            f"batch size {leaves[0].shape[0]} is not divisible by the "
            f"{ndev}-device dp mesh; pick a multiple (e.g. --batch_size "
            f"{-(-leaves[0].shape[0] // ndev) * ndev}) or fewer devices "
            "(--num_devices)"
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
