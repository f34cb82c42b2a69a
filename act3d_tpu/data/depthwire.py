"""Depth-based host→device wire for point clouds.

The episode schema ships per-pixel WORLD coordinates (3 channels,
reference data_preprocessing/data_gen.py:44-70 packs RGB+XYZ states;
datasets/dataset_engine.py:139-149 reads them back).  On hosts where the
accelerator link bounds e2e training (BENCH_NOTES "e2e": 1656 ms/batch of
H2D vs a 70 ms device step), shipping 3 channels of world XYZ wastes 3×
the wire: the XYZ image is a deterministic function of the 1-channel
depth map and the camera model, so we ship depth + (intrinsics,
extrinsics) and rebuild the XYZ image inside the jitted step, where the
few extra fused FLOPs are free.

Exactness (why this is not an approximation):

  * RLBench point clouds are themselves computed by reprojecting the
    depth buffer through the camera model, so world XYZ → camera z →
    world XYZ round-trips to float precision.  ``pinhole_residual`` is
    checked per episode at load time and the loader silently falls back
    to the XYZ wire for data that is not pinhole-consistent.
  * The training-time Resize augmentation is NEAREST (index remap,
    reference datasets/utils.py:40-100) — so augmentation commutes with
    reconstruction: shipping the *original* depth plus the per-axis
    source-index maps and gathering on device reproduces the host's
    augmented XYZ image bit-for-bit (same source pixel, same ray).
  * The yaw Rotate augmentation is a rigid world transform, folded into
    the camera-to-world extrinsic on the host (16 floats), so the
    per-pixel rotation moves into the reconstruction for free.

Batch keys of the depth wire (produced by RLBenchDataset(wire="depth"),
consumed by ``data.compact.expand_batch``):

  depth     (B, ncam, H, W)   f32 metres (u16-quantised on the wire)
  cam_intr  (B, ncam, 3, 3)   f32 pinhole K (zero skew)
  cam_c2w   (B, ncam, 4, 4)   f32 camera→world
  aug_rows  (B, H) int32      source row per output row   (optional)
  aug_cols  (B, W) int32      source col per output col   (optional)

`rgbs` ride the wire unresized; expand applies the same index maps.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "derive_depth",
    "pinhole_residual",
    "reconstruct_pcds",
    "gather_hw",
]


# ------------------------------------------------------------------ host side
def derive_depth(pcd: np.ndarray, c2w: np.ndarray) -> np.ndarray:
    """Per-pixel camera-frame z from a world-XYZ image.

    pcd: (..., 3, H, W) world coordinates; c2w: (..., 4, 4) camera→world
    (RLBench's ``misc[f"{cam}_camera_extrinsics"]`` layout, see
    eval/rlbench_env.py:66 which inverts it to project).  Returns
    (..., H, W) float32 camera z (metric depth).
    """
    pcd = np.asarray(pcd, np.float64)
    c2w = np.asarray(c2w, np.float64)
    w2c = np.linalg.inv(c2w)
    # z_cam = R_w2c[2] . p + t_w2c[2]
    r2 = w2c[..., 2, :3]  # (..., 3)
    t2 = w2c[..., 2, 3]  # (...,)
    depth = np.einsum("...k,...khw->...hw", r2, pcd) + t2[..., None, None]
    return depth.astype(np.float32)


def pinhole_residual(
    pcd: np.ndarray,
    depth: np.ndarray,
    intr: np.ndarray,
    c2w: np.ndarray,
    stride: int = 7,
) -> float:
    """Max |reconstructed − stored| (metres) on a pixel subsample.

    Guards the depth wire against data whose XYZ image is NOT the pinhole
    reprojection of its depth map (wrong conventions, distortion, edited
    clouds): the dataset falls back to the XYZ wire above a tolerance.
    """
    pcd = np.asarray(pcd, np.float64)
    h, w = pcd.shape[-2:]
    vs = np.arange(0, h, stride)
    us = np.arange(0, w, stride)
    sub = pcd[..., vs[:, None], us[None, :]]
    dsub = np.asarray(depth, np.float64)[..., vs[:, None], us[None, :]]
    intr = np.asarray(intr, np.float64)
    fx = intr[..., 0, 0][..., None, None]
    fy = intr[..., 1, 1][..., None, None]
    cx = intr[..., 0, 2][..., None, None]
    cy = intr[..., 1, 2][..., None, None]
    x = (us[None, :] - cx) / fx * dsub
    y = (vs[:, None] - cy) / fy * dsub
    cam = np.stack([x, y, dsub], axis=-3)  # (..., 3, hs, ws)
    c2w = np.asarray(c2w, np.float64)
    rec = (
        np.einsum("...ik,...khw->...ihw", c2w[..., :3, :3], cam)
        + c2w[..., :3, 3][..., None, None]
    )
    return float(np.max(np.abs(rec - sub)))


# ---------------------------------------------------------------- device side
def gather_hw(
    a: jax.Array, rows: jax.Array, cols: jax.Array
) -> jax.Array:
    """Outer-index gather a[..., rows, :][..., :, cols] per batch element.

    a: (B, ..., H, W); rows: (B, H'); cols: (B, W').  Both axes gather as
    contiguous second-minor rows (the W axis through a transpose pair) —
    slice-granularity copies instead of per-element minor-axis gathers,
    which lower to scalar gathers on TPU (BENCH_NOTES round 3, same
    trick as data/device_augment.py).
    """

    def take2(x, idx):
        # x: (..., H, W), idx: (H',) -> gather along -2
        shaped = idx.reshape((1,) * (x.ndim - 2) + (-1, 1))
        return jnp.take_along_axis(
            x, jnp.broadcast_to(shaped, x.shape[:-2] + (idx.shape[0], 1)),
            axis=-2,
        )

    def per_sample(x, r, c):
        x = take2(x, r)
        x = jnp.swapaxes(x, -1, -2)
        x = take2(x, c)
        return jnp.swapaxes(x, -1, -2)

    return jax.vmap(per_sample)(a, rows, cols)


def reconstruct_pcds(
    depth: jax.Array,
    intr: jax.Array,
    c2w: jax.Array,
    rows: Optional[jax.Array] = None,
    cols: Optional[jax.Array] = None,
) -> jax.Array:
    """World-XYZ image from depth + camera model (jit-traceable).

    depth: (B, ncam, H, W) f32 metres — the ORIGINAL (unaugmented) map;
    intr: (B, ncam, 3, 3); c2w: (B, ncam, 4, 4);
    rows/cols: optional (B, H)/(B, W) int source-index maps from the host
    NEAREST Resize draw (augment.Resize.sample_index_maps).  Returns
    (B, ncam, 3, H, W) world coordinates equal to the reference's
    host-augmented XYZ image (datasets/utils.py:40-100 NEAREST resize of
    the XYZ channels) up to the wire quantisation.
    """
    b, ncam, h, w = depth.shape
    if rows is not None:
        depth = gather_hw(depth, rows, cols)
        # pixel coordinate of the SOURCE pixel each output pixel came
        # from — its ray, not the output position's ray
        u = cols[:, None, None, :].astype(depth.dtype)  # (B, 1, 1, W)
        v = rows[:, None, :, None].astype(depth.dtype)  # (B, 1, H, 1)
    else:
        u = jnp.arange(w, dtype=depth.dtype)[None, None, None, :]
        v = jnp.arange(h, dtype=depth.dtype)[None, None, :, None]
    fx = intr[..., 0, 0][..., None, None]
    fy = intr[..., 1, 1][..., None, None]
    cx = intr[..., 0, 2][..., None, None]
    cy = intr[..., 1, 2][..., None, None]
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    cam = jnp.stack([x, y, depth], axis=2)  # (B, ncam, 3, H, W)
    rot = c2w[..., :3, :3]  # (B, ncam, 3, 3)
    t = c2w[..., :3, 3]  # (B, ncam, 3)
    return (
        jnp.einsum("bnik,bnkhw->bnihw", rot, cam)
        + t[..., None, None]
    )
