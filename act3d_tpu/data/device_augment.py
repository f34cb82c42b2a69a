"""On-device (in-jit) training augmentations.

TPU-native alternative to the host-side ``data.augment`` transforms
(reference: datasets/utils.py:40-181 runs them in DataLoader workers).
On a host-bound input pipeline the resize/crop and yaw-rotate are pure
memory traffic — moving them into the jitted training step cuts host
batch assembly to decode + memcpy at the price of ~10 ms/step of device
gathers at the flagship diffusion scale (544 → 444 samples/s in-jit,
BENCH_NOTES round 3): the right trade whenever the host, not the chip,
bounds e2e throughput.  ``bench_data.py`` quantifies the host-side
savings.

Semantics match the host transforms *exactly* for the same draws
(tests/test_device_augment.py):

  * :func:`resize_sample` = ``augment.Resize``: NEAREST scale resize
    (src = floor(dst * in/out)), bottom/right reflect-pad, random crop —
    expressed as one static-shape gather per axis so XLA sees a fixed
    (H, W) output regardless of the traced scale.
  * :func:`yaw_rotate_batch` = ``augment.Rotate``: up-to-``num_tries``
    yaw draws with workspace-bound rejection, first acceptable draw
    applied to point clouds and poses (xyzw quaternions), original
    arrays kept when every try lands out of bounds.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["resize_sample", "yaw_rotate_batch", "make_device_augment"]


# --------------------------------------------------------------------- resize
def _axis_src_index(out_len: int, new: jax.Array, crop: jax.Array) -> jax.Array:
    """Source index per output pixel for scale-resize + reflect-pad + crop.

    new: traced scalar int (resized length); crop: traced scalar int offset.
    Output position r maps through the crop (p = r + crop), the bottom/right
    reflect pad (p >= new mirrors to 2*new - 2 - p; numpy 'reflect' mode) and
    the NEAREST resize (src = floor(p * in / new), clipped).
    Integer arithmetic reproduces the host's float64 floor exactly.
    """
    r = jnp.arange(out_len)
    p = r + crop
    p = jnp.where(p < new, p, 2 * new - 2 - p)
    return jnp.clip((p * out_len) // new, 0, out_len - 1)


def _take_rows(a: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather along the second-minor axis: each picked element is a full
    contiguous minor-axis row, which XLA lowers to slice-granularity
    copies.  (A minor-axis ``jnp.take`` lowers to scalar-granularity
    gathers on TPU — measured ~0.6 s/batch inside the e2e train step,
    BENCH_NOTES round 3.)"""
    shaped = idx.reshape((1,) * (a.ndim - 2) + (-1, 1))
    return jnp.take_along_axis(
        a, jnp.broadcast_to(shaped, a.shape[:-2] + (idx.shape[0], 1)),
        axis=-2,
    )


def resize_with_params(
    arrays: Dict[str, jax.Array],
    scale: jax.Array,
    crop_i: jax.Array,
    crop_j: jax.Array,
) -> Dict[str, jax.Array]:
    """Deterministic core of :func:`resize_sample` (exposed for parity
    tests against the host ``augment.Resize`` with identical draws).

    Both axes are gathered as contiguous rows — the W axis through a
    transpose pair — so the whole resize is slice copies + relayouts
    instead of per-element gathers; bitwise-identical output."""
    import os

    first = next(iter(arrays.values()))
    h, w = first.shape[-2:]
    new_h = jnp.floor(h * scale).astype(jnp.int32)
    new_w = jnp.floor(w * scale).astype(jnp.int32)
    rows = _axis_src_index(h, new_h, crop_i)
    cols = _axis_src_index(w, new_w, crop_j)
    # r3 A/B at the diffusion trainer's shapes (in-jit scan, b22):
    # take-based 444.2 samples/s vs row-slice 435.5 — XLA already lowers
    # the per-axis takes well; the row-slice variant stays for A/B.
    impl = os.environ.get("ACT3D_RESIZE_IMPL", "take")
    out = {}
    for n, a in arrays.items():
        if impl == "take":
            out[n] = jnp.take(jnp.take(a, rows, axis=-2), cols, axis=-1)
        else:
            x = _take_rows(a, rows)
            x = _take_rows(x.swapaxes(-1, -2), cols).swapaxes(-1, -2)
            out[n] = x
    return out


def resize_sample(
    arrays: Dict[str, jax.Array],
    scale: jax.Array,
    crop_rng: jax.Array,
) -> Dict[str, jax.Array]:
    """Apply one random-scale resize+crop to every array of a sample.

    arrays: {name: (..., H, W)} with identical trailing (H, W).
    scale: traced scalar in the rescale range.  crop_rng: PRNG key for the
    crop offsets (only consumed when the scaled image is larger than the
    frame, matching the host's crop draw).
    """
    first = next(iter(arrays.values()))
    h, w = first.shape[-2:]
    new_h = jnp.floor(h * scale).astype(jnp.int32)
    new_w = jnp.floor(w * scale).astype(jnp.int32)
    kh, kw = jax.random.split(crop_rng)
    crop_i = jax.random.randint(kh, (), 0, jnp.maximum(new_h - h, 0) + 1)
    crop_j = jax.random.randint(kw, (), 0, jnp.maximum(new_w - w, 0) + 1)
    return resize_with_params(arrays, scale, crop_i, crop_j)


# --------------------------------------------------------------------- rotate
def _quat_xyzw_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) xyzw -> (..., 3, 3) (augment.py:71-86 math)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.sum(q * q, axis=-1)
    s = 2.0 / jnp.maximum(n, 1e-12)
    rows = [
        [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
        [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
        [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
    ]
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


def _matrix_to_quat_xyzw(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) xyzw, stable component method."""
    w = 0.5 * jnp.sqrt(
        jnp.maximum(0.0, 1 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2])
    )
    x = 0.5 * jnp.sqrt(
        jnp.maximum(0.0, 1 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2])
    )
    y = 0.5 * jnp.sqrt(
        jnp.maximum(0.0, 1 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2])
    )
    z = 0.5 * jnp.sqrt(
        jnp.maximum(0.0, 1 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2])
    )
    x = jnp.copysign(x, m[..., 2, 1] - m[..., 1, 2])
    y = jnp.copysign(y, m[..., 0, 2] - m[..., 2, 0])
    z = jnp.copysign(z, m[..., 1, 0] - m[..., 0, 1])
    q = jnp.stack([x, y, z, w], axis=-1)
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-10)


def _rot_pose(pose: jax.Array, rot: jax.Array) -> jax.Array:
    """Rotate (…, 7+) xyzw poses by one (3, 3) matrix (vmap over batch)."""
    pos = pose[..., :3] @ rot.T
    quat = _matrix_to_quat_xyzw(rot @ _quat_xyzw_to_matrix(pose[..., 3:7]))
    return jnp.concatenate([pos, quat, pose[..., 7:]], axis=-1)


def yaw_rotate_batch(
    rng: jax.Array,
    pcds: jax.Array,  # (B, ncam, 3, H, W)
    poses: Dict[str, jax.Array],  # name -> (B, ..., 7+) xyzw pose arrays
    *,
    yaw_range_rad: float,
    bounds: jax.Array,  # (2, 3) workspace bounds
    bound_keys: Tuple[str, ...] = ("curr_gripper", "action"),
    num_tries: int = 10,
    yaws: Optional[jax.Array] = None,  # (B, num_tries) override for tests
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Per-sample yaw augmentation with bound rejection (augment.Rotate)."""
    b = pcds.shape[0]
    if yaws is None:
        yaws = jax.random.uniform(
            rng, (b, num_tries), minval=-yaw_range_rad, maxval=yaw_range_rad
        )
    c, s = jnp.cos(yaws), jnp.sin(yaws)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    rots = jnp.stack(
        [
            jnp.stack([c, -s, zero], -1),
            jnp.stack([s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        axis=-2,
    )  # (B, T, 3, 3)

    # bound check on the gating poses for every try
    ok = jnp.ones((b, num_tries), bool)
    for key in bound_keys:
        p = poses[key].reshape(b, -1, poses[key].shape[-1])[..., :3]
        rp = jnp.einsum("btij,bnj->btni", rots, p)
        ok &= jnp.all((rp >= bounds[0]) & (rp <= bounds[1]), axis=(-2, -1))

    any_ok = jnp.any(ok, axis=1)  # (B,)
    first = jnp.argmax(ok, axis=1)  # first acceptable try
    rot = jnp.take_along_axis(rots, first[:, None, None, None], axis=1)[:, 0]

    rotated_pcd = jnp.einsum("bij,bcjhw->bcihw", rot, pcds)
    pcds_out = jnp.where(any_ok[:, None, None, None, None], rotated_pcd, pcds)
    poses_out = {}
    for key, pose in poses.items():
        flat = pose.reshape(b, -1, pose.shape[-1])
        rp = jax.vmap(_rot_pose)(flat, rot).reshape(pose.shape)
        keep = any_ok.reshape((b,) + (1,) * (pose.ndim - 1))
        poses_out[key] = jnp.where(keep, rp, pose)
    return pcds_out, poses_out


# ------------------------------------------------------------------- pipeline
def make_device_augment(
    image_rescale: Tuple[float, float] = (0.75, 1.25),
    yaw_range_deg: float = 0.0,
    gripper_loc_bounds=None,
    pose_keys: Tuple[str, ...] = ("curr_gripper", "action", "trajectory"),
):
    """Build a jit-friendly ``(batch, rng) -> batch`` augmentation.

    Compose it with a loss function so it fuses into the training step:
    the dataset is then constructed with ``augment_host=False`` and the
    host pipeline only decodes and stacks.
    """
    lo, hi = image_rescale
    yaw_rad = float(jnp.deg2rad(yaw_range_deg))
    bounds = (
        jnp.asarray(gripper_loc_bounds, jnp.float32)
        if gripper_loc_bounds is not None
        else jnp.asarray([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]], jnp.float32)
    )

    def augment(batch: Dict[str, jax.Array], rng: jax.Array):
        batch = dict(batch)
        k_rot, k_scale, k_crop = jax.random.split(rng, 3)
        if yaw_rad > 0.0:
            poses = {k: batch[k] for k in pose_keys if k in batch}
            pcds, poses = yaw_rotate_batch(
                k_rot, batch["pcds"], poses,
                yaw_range_rad=yaw_rad, bounds=bounds,
            )
            batch["pcds"] = pcds
            batch.update(poses)
        if (lo, hi) != (1.0, 1.0):
            b = batch["rgbs"].shape[0]
            scales = jax.random.uniform(k_scale, (b,), minval=lo, maxval=hi)
            crop_keys = jax.random.split(k_crop, b)
            resized = jax.vmap(
                lambda r, p, sc, k: resize_sample(
                    {"rgbs": r, "pcds": p}, sc, k
                )
            )(batch["rgbs"], batch["pcds"], scales, crop_keys)
            batch["rgbs"], batch["pcds"] = resized["rgbs"], resized["pcds"]
        return batch

    return augment
