"""Device mesh + sharding helpers.

The reference scales with single-node DDP over NCCL
(reference: engine.py:121-124, main_keypose.py:517).  The TPU-native
equivalent is SPMD data-parallelism over a ``jax.sharding.Mesh``:
batches are sharded over the data axes (riding ICI), and XLA inserts the
gradient all-reduce automatically when a jitted step computes a mean
over the sharded batch dimension.

Beyond the reference's DDP, the mesh optionally carries a second
``fsdp`` axis (``make_mesh(..., fsdp=N)``): parameters and optimizer
moments are sharded over it ZeRO-style (``param_sharding`` picks the
largest evenly-divisible axis of each leaf), XLA all-gathers weights for
the forward/backward and reduce-scatters gradients.  Batches stay
data-parallel over BOTH axes, so the numerics are identical to plain dp
— proven by tests/test_sharding.py — while per-device parameter+state
memory drops by ~the fsdp factor.

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
    "param_sharding",
    "state_shardings",
    "shard_params",
    "shard_batch",
    "replicate",
]


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    fsdp: int = 1,
) -> Mesh:
    """Mesh over the first ``num_devices`` devices.

    fsdp=1 (default): 1-D ("dp",) data-parallel mesh.
    fsdp=N: 2-D ("dp", "fsdp") mesh of shape (num_devices // N, N);
    parameters/optimizer state shard over the fsdp axis.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    devices = np.asarray(devices)
    if fsdp <= 1:
        return Mesh(devices, ("dp",))
    if devices.size % fsdp != 0:
        raise ValueError(
            f"fsdp={fsdp} does not divide the {devices.size} devices"
        )
    return Mesh(devices.reshape(-1, fsdp), ("dp", "fsdp"))


def _data_axes(mesh: Mesh):
    """Batch dim shards over every mesh axis (dp, and fsdp if present)."""
    return tuple(mesh.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axes."""
    return NamedSharding(mesh, P(_data_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, x) -> NamedSharding:
    """ZeRO-style placement of one parameter/moment leaf: shard the
    largest axis that divides evenly over the fsdp axis, else replicate.
    On a 1-D (pure dp) mesh everything is replicated."""
    if "fsdp" not in mesh.axis_names:
        return replicated_sharding(mesh)
    n = mesh.shape["fsdp"]
    shape = getattr(x, "shape", ())
    cands = [i for i, s in enumerate(shape) if s >= n and s % n == 0]
    if not cands:
        return replicated_sharding(mesh)
    ax = max(cands, key=lambda i: shape[i])
    spec = [None] * len(shape)
    spec[ax] = "fsdp"
    return NamedSharding(mesh, P(*spec))


def state_shardings(mesh: Mesh, tree: Any) -> Any:
    """Pytree of NamedShardings for a pytree of arrays/ShapeDtypeStructs
    (params or optimizer state) under the mesh's fsdp policy."""
    return jax.tree.map(lambda x: param_sharding(mesh, x), tree)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put a parameter/state pytree under the fsdp policy (a
    replicate on pure-dp meshes)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, param_sharding(mesh, x)), params
    )


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
