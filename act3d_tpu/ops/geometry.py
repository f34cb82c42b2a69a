"""Geometric helpers shared by the models (pure JAX).

TPU-native equivalents of reference model/utils/utils.py:7-84 — all
dynamic-shape / host-side constructs are replaced by static-shape
``lax.top_k`` selections.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "find_traj_nn",
    "topk_nearest_context",
    "gather_tokens",
    "find_cylinder_points",
    "normalise_quat",
]


import functools


def gather_tokens(
    x: jax.Array, idx: jax.Array, *, sorted_indices: bool = False
) -> jax.Array:
    """Batched token gather whose backward avoids the wide scatter-add.

    x: (B, P, C); idx: (B, K) int32, unique per row (top-k output).
    sorted_indices: caller guarantees idx is ascending per row — the
    adjoint then contracts a searchsorted 2-block window instead of all K
    cotangent rows (kernels/gather.py::onehot_scatter_rows_sorted; Act3D
    sorts its fine-context picks at models/act3d.py:233).

    Profiling (BENCH_NOTES.md): the naive VJP — a (B·K, C) scatter-add into
    (B·P, C) — is a kCustom TPU scatter costing ~19 ms/step in Act3D
    (fusion.7917, 21% of the step).  Since the indices are unique, the
    adjoint is a *permuted expand*, not an accumulation: round 1 replaced
    it with an int32 slot scatter + dense gather; round 3 with a one-hot×
    MXU Pallas kernel (windowed when sorted_indices).
    """
    if sorted_indices:
        return _gather_tokens_sorted(x, idx)
    return _gather_tokens_any(x, idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _gather_tokens_any(x: jax.Array, idx: jax.Array) -> jax.Array:
    return _gather_fwd_impl(x, idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _gather_tokens_sorted(x: jax.Array, idx: jax.Array) -> jax.Array:
    return _gather_fwd_impl(x, idx)


def _gather_fwd_impl(x, idx):
    b, p, c = x.shape
    return jax.lax.gather(
        x,
        idx[..., None],
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(2,),
            collapsed_slice_dims=(1,),
            start_index_map=(1,),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        ),
        slice_sizes=(1, 1, c),
        unique_indices=True,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _gather_tokens_fwd(x, idx):
    return _gather_fwd_impl(x, idx), (idx, x.shape)


def _onehot_bwd_enabled(c: int) -> bool:
    """The Pallas one-hot×MXU adjoint pays off for wide feature rows on
    TPU (r3 A/B vs the slot-map dense gather, BENCH_NOTES round 3); the
    tiny C=3 xyz gathers and CPU test runs keep the jnp formulation.
    ACT3D_ONEHOT_GATHER_BWD=0/1 overrides."""
    import os

    env = os.environ.get("ACT3D_ONEHOT_GATHER_BWD")
    if env is not None:
        return env == "1"
    return c >= 16 and jax.default_backend() == "tpu"


def _slot_map_bwd(idx, b, p, g):
    k = idx.shape[1]
    # inverse slot map via a cheap int32 scatter: inv[b, idx[b, j]] = j + 1
    inv = jnp.zeros((b, p), jnp.int32)
    inv = inv.at[jnp.arange(b)[:, None], idx].set(
        jnp.arange(1, k + 1, dtype=jnp.int32)[None, :],
        unique_indices=True,
        mode="promise_in_bounds",
    )
    hit = inv > 0
    slot = jnp.maximum(inv - 1, 0)
    rows = jnp.take_along_axis(g, slot[..., None], axis=1)  # dense gather
    return jnp.where(hit[..., None], rows, 0).astype(g.dtype)


def _gather_tokens_bwd(residuals, g):
    idx, (b, p, c) = residuals
    if _onehot_bwd_enabled(c):
        from ..kernels.gather import onehot_scatter_rows

        return onehot_scatter_rows(g, idx, p), None
    return _slot_map_bwd(idx, b, p, g), None


def _gather_tokens_sorted_bwd(residuals, g):
    idx, (b, p, c) = residuals
    if _onehot_bwd_enabled(c):
        from ..kernels.gather import onehot_scatter_rows_sorted

        return onehot_scatter_rows_sorted(g, idx, p), None
    return _slot_map_bwd(idx, b, p, g), None


_gather_tokens_any.defvjp(_gather_tokens_fwd, _gather_tokens_bwd)
_gather_tokens_sorted.defvjp(_gather_tokens_fwd, _gather_tokens_sorted_bwd)

from .rotations import normalise_quat  # re-export, single definition


def find_traj_nn(
    trajectory: jax.Array, point_cloud: jax.Array, nn_per_step: int = 64
) -> jax.Array:
    """Indices of the k·L point-cloud entries nearest to any trajectory point.

    Mirrors reference ``find_traj_nn`` (model/utils/utils.py:38-48) with
    ``lax.top_k`` instead of ``Tensor.topk``.

    Args:
      trajectory: (B, L, 3)
      point_cloud: (B, P, 3)
      nn_per_step: k; total selected indices = k * L.

    Returns:
      (B, k*L) int32 indices into P.
    """
    d2 = jnp.sum(
        jnp.square(trajectory[:, :, None, :] - point_cloud[:, None, :, :]), axis=-1
    )  # (B, L, P)
    min_d2 = jnp.min(d2, axis=1)  # (B, P)
    k = nn_per_step * trajectory.shape[1]
    _, idx = jax.lax.top_k(-min_d2, k)
    return idx


def topk_nearest_context(
    anchor: jax.Array, point_cloud: jax.Array, k: int, approx: bool = False
) -> jax.Array:
    """Indices of the k points nearest to a single anchor per batch element.

    Replaces the fine-level context selection of Act3D (reference
    act3d.py:244-254: L2 to last predicted position, ``topk(largest=False)``).

    Args:
      anchor: (B, 3) predicted position.
      point_cloud: (B, P, 3) fine point-cloud pyramid level.
      k: number of context tokens to keep (32*32*ncam in the reference).
      approx: use TPU-accelerated ``approx_max_k`` (recall ~0.95; the
        neighbourhood is a soft attention context, so near-misses among the
        ~3k nearest of ~49k points are training-noise-level).

    Returns:
      (B, k) int32 indices.
    """
    d2 = jnp.sum(jnp.square(anchor[:, None, :] - point_cloud), axis=-1)  # (B, P)
    if approx:
        _, idx = jax.lax.approx_max_k(-d2, k)
    else:
        _, idx = jax.lax.top_k(-d2, k)
    return idx


def find_cylinder_points(
    start: jax.Array, end: jax.Array, num_points: int, point_cloud: jax.Array
) -> jax.Array:
    """Boolean mask of cloud points within a 'cylinder' around segment start→end.

    Mirrors reference ``find_cylinder_points`` (model/utils/utils.py:7-35):
    the union of balls centred on ``num_points`` line samples, radius equal to
    the max per-axis extent of (end - start).

    Args:
      start, end: (B, 3)
      num_points: static line sample count.
      point_cloud: (B, P, 3)

    Returns:
      (B, P) bool mask.
    """
    size = jnp.max(jnp.abs(end - start), axis=1)  # (B,)
    ts = jnp.arange(num_points, dtype=jnp.float32)  # (n,)
    slope = (end - start) / (num_points - 1)  # (B, 3)
    line = start[:, None, :] + slope[:, None, :] * ts[None, :, None]  # (B, n, 3)
    d = jnp.sqrt(
        jnp.sum(
            jnp.square(line[:, :, None, :] - point_cloud[:, None, :, :]), axis=-1
        )
    )  # (B, n, P)
    return jnp.any(d <= size[:, None, None], axis=1)
