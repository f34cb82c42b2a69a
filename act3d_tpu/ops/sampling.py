"""On-device ghost-point sampling with static shapes.

The reference samples ghost points with NumPy on the host *inside* the
forward pass (reference: model/keypose_optimization/act3d.py:394-440,
model/utils/utils.py:59-84), forcing a device→host sync every pyramid level.
Here everything runs on-device with ``jax.random`` so the whole Act3D forward
is a single traced computation.

The sphere sampler replaces the reference's unbounded rejection loop
(utils.py:76-84) with a fixed-shape equivalent: oversample uniformly in the
(bounds-clipped) cube, then take the *first* N points that fall inside the
ball — exactly the order statistics rejection sampling produces, but with a
static 4x oversampling buffer instead of a while-loop.  The probability of a
deficit is negligible (ball fills ≥~52% of its bounding cube; 4x oversampling
puts the expected hit count at >2N); any deficit falls back to the nearest
in-cube points, which are still inside the clipped bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "sample_uniform_cube",
    "sample_uniform_ball",
    "sample_grid",
    "ghost_point_bounds",
]


def sample_grid(bounds: jax.Array, num_points_per_dim: int = 10) -> jax.Array:
    """Regular grid over a box (reference sample_ghost_points_grid,
    model/utils/utils.py:59-65): (N^3, 3) points, x-major order."""
    axes = [
        jnp.linspace(bounds[0, d], bounds[1, d], num_points_per_dim)
        for d in range(3)
    ]
    x, y, z = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)

_OVERSAMPLE = 4


def sample_uniform_cube(
    key: jax.Array, bounds: jax.Array, num_points: int
) -> jax.Array:
    """Uniform points in an axis-aligned box.

    Args:
      key: PRNG key.
      bounds: (2, 3) [min, max] corners (may be batched (..., 2, 3)).
      num_points: static point count N.

    Returns:
      (..., N, 3) points.
    """
    lo = bounds[..., 0, :]
    hi = bounds[..., 1, :]
    shape = lo.shape[:-1] + (num_points, 3)
    u = jax.random.uniform(key, shape, dtype=jnp.float32)
    return lo[..., None, :] + u * (hi - lo)[..., None, :]


def sample_uniform_ball(
    key: jax.Array,
    center: jax.Array,
    radius: float,
    bounds: jax.Array,
    num_points: int,
) -> jax.Array:
    """Uniform points in ball(center, radius) ∩ box(bounds), static shape.

    Args:
      key: PRNG key.
      center: (..., 3) ball centers.
      radius: scalar ball radius.
      bounds: (..., 2, 3) per-sample clipped boxes.
      num_points: static point count N.

    Returns:
      (..., N, 3) points, distributed as the reference's rejection sampler
      (utils.py:76-84): uniform over the box restricted to the ball.
    """
    n_over = _OVERSAMPLE * num_points
    pts = sample_uniform_cube(key, bounds, n_over)  # (..., 4N, 3)
    d2 = jnp.sum(jnp.square(pts - center[..., None, :]), axis=-1)
    inside = d2 < radius * radius  # strict <, as in the reference

    # Stable-sort rejected points to the back; the accepted prefix keeps its
    # sampling order, which is exactly what sequential rejection would yield.
    order = jnp.argsort(jnp.logical_not(inside), axis=-1, stable=True)
    take = order[..., :num_points]
    return jnp.take_along_axis(pts, take[..., None], axis=-2)


def ghost_point_bounds(
    anchor: jax.Array, diameter: float, workspace_bounds: jax.Array
) -> jax.Array:
    """Clip an anchor-centred cube of the given diameter to the workspace.

    Mirrors reference act3d.py:418-427.

    Args:
      anchor: (..., 3) ball centers.
      diameter: sampling ball diameter at this pyramid level.
      workspace_bounds: (2, 3) global gripper workspace bounds.

    Returns:
      (..., 2, 3) per-anchor clipped [min, max] boxes.
    """
    lo = jnp.clip(
        anchor - diameter / 2.0, workspace_bounds[0], workspace_bounds[1]
    )
    hi = jnp.clip(
        anchor + diameter / 2.0, workspace_bounds[0], workspace_bounds[1]
    )
    return jnp.stack([lo, hi], axis=-2)
