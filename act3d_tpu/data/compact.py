"""Compact host→device batch encodings.

The training batch at reference scale is ~104 MB of f32 per step (22 × 3
cams × 2 modalities × 3×256²); on hosts where the accelerator link is the
bottleneck (the benchmark VM tunnels the chip: BENCH_NOTES.md "e2e"),
shipping images as f32 wastes 2.6× the wire.  The reference keeps f32
end-to-end (DataLoader → .cuda(), engine.py:51-62); TPU-native rule #1 is
minimise host↔device transfers, so we encode on the host and decode
inside the jitted step (free — XLA fuses the casts into the first
consumers):

  * rgbs (f32 in [0, 1]) → uint8.  LOSSLESS for real data: episode RGB
    originates from uint8 sensor images, the stored [-1, 1] encoding is
    2*(u8/255)-0.5*2, and neither the NEAREST resize nor the yaw rotation
    leaves that 256-value palette.  4× smaller.
  * pcds (f32, metres) → workspace-bounded uint16 (default).  Linear
    quantisation over ``PCD_U16_BOUNDS`` = ±3.2 m: step (hi-lo)/65535 ≈
    0.098 mm, uniform across the range — 5 orders below the 1 cm
    position-accuracy metric, and strictly tighter than float16 beyond
    |x| > 0.8 m (f16 spacing at 2 m is ~1 mm).  Points outside the bounds
    clip; RLBench workspaces fit well inside ±3.2 m.  2× smaller than
    f32, same wire size as f16 with ~10× less error at workspace edges.
  * ``pcd_mode="f16"`` keeps the round-2 float16 encoding (~0.5 mm
    worst-case inside ±2 m) for data that can exceed the fixed bounds.

``expand_batch`` dispatches on dtype, so no side-channel metadata rides
the batch and it stays a no-op on already-float batches — loss functions
call it unconditionally.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

__all__ = [
    "compact_batch", "expand_batch", "PCD_U16_BOUNDS", "DEPTH_U16_RANGE",
]

_RGB_KEYS = ("rgbs",)
_PCD_KEYS = ("pcds",)
_DEPTH_KEYS = ("depth",)

# fixed workspace bounds for the uint16 pcd encoding (metres); must match
# between compact_batch and expand_batch, so they are module constants —
# no per-batch metadata to shard/ship
PCD_U16_BOUNDS = (-3.2, 3.2)

# camera-z range for the uint16 depth encoding (metres): step ~0.098 mm,
# and the world-space reconstruction error is step × |K^-1 u| ≲ 0.2 mm —
# 2 orders below the 1 cm position-accuracy metric
DEPTH_U16_RANGE = (0.0, 6.4)


def compact_batch(batch: Dict, pcd_mode: str = "u16") -> Dict:
    """Host-side (numpy) encode: uint8 rgbs + u16 (default) or f16 pcds."""
    out = dict(batch)
    for k in _RGB_KEYS:
        v = out.get(k)
        if v is not None and v.dtype == np.float32:
            out[k] = np.rint(np.clip(v, 0.0, 1.0) * 255.0).astype(np.uint8)
    for k in _PCD_KEYS:
        v = out.get(k)
        if v is None or v.dtype != np.float32:
            continue
        if pcd_mode == "u16":
            lo, hi = PCD_U16_BOUNDS
            scale = 65535.0 / (hi - lo)
            out[k] = np.rint(
                (np.clip(v, lo, hi) - lo) * scale
            ).astype(np.uint16)
        elif pcd_mode == "f16":
            out[k] = v.astype(np.float16)
        else:
            raise ValueError(f"unknown pcd_mode {pcd_mode!r}")
    for k in _DEPTH_KEYS:
        v = out.get(k)
        if v is not None and v.dtype == np.float32:
            lo, hi = DEPTH_U16_RANGE
            scale = 65535.0 / (hi - lo)
            out[k] = np.rint(
                (np.clip(v, lo, hi) - lo) * scale
            ).astype(np.uint16)
    return out


def expand_batch(batch: Dict) -> Dict:
    """Device-side (jit-traceable) decode; identity on float batches.

    Depth-wire batches (``RLBenchDataset(wire="depth")``: `depth` +
    `cam_intr`/`cam_c2w` and optional `aug_rows`/`aug_cols` index maps)
    are expanded to the standard `pcds`/`rgbs` keys here — the XYZ image
    is reconstructed in-jit and the NEAREST resize augmentation is a
    device gather (see data/depthwire.py for the exactness argument)."""
    out = dict(batch)
    for k in _RGB_KEYS:
        v = out.get(k)
        if v is not None and v.dtype == jnp.uint8:
            out[k] = v.astype(jnp.float32) / 255.0
    for k in _PCD_KEYS:
        v = out.get(k)
        if v is None:
            continue
        if v.dtype == jnp.uint16:
            lo, hi = PCD_U16_BOUNDS
            out[k] = v.astype(jnp.float32) * ((hi - lo) / 65535.0) + lo
        elif v.dtype == jnp.float16:
            out[k] = v.astype(jnp.float32)
    for k in _DEPTH_KEYS:
        v = out.get(k)
        if v is not None and v.dtype == jnp.uint16:
            lo, hi = DEPTH_U16_RANGE
            out[k] = v.astype(jnp.float32) * ((hi - lo) / 65535.0) + lo
    if "depth" in out and "cam_intr" in out:
        from .depthwire import gather_hw, reconstruct_pcds

        rows = out.pop("aug_rows", None)
        cols = out.pop("aug_cols", None)
        out["pcds"] = reconstruct_pcds(
            out.pop("depth"), out.pop("cam_intr"), out.pop("cam_c2w"),
            rows=rows, cols=cols,
        )
        if rows is not None and "rgbs" in out:
            out["rgbs"] = gather_hw(out["rgbs"], rows, cols)
    return out
