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
  * pcds (f32, metres) → float16.  ~0.5 mm worst-case quantisation inside
    the ±2 m workspace (11-bit mantissa at magnitude 2) — an order of
    magnitude below the 1 cm position-accuracy metric.  2× smaller.

``expand_batch`` is a no-op on already-float batches, so loss functions
call it unconditionally.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

__all__ = ["compact_batch", "expand_batch"]

_RGB_KEYS = ("rgbs",)
_PCD_KEYS = ("pcds",)


def compact_batch(batch: Dict) -> Dict:
    """Host-side (numpy) encode: uint8 rgbs + f16 pcds."""
    out = dict(batch)
    for k in _RGB_KEYS:
        v = out.get(k)
        if v is not None and v.dtype == np.float32:
            out[k] = np.rint(np.clip(v, 0.0, 1.0) * 255.0).astype(np.uint8)
    for k in _PCD_KEYS:
        v = out.get(k)
        if v is not None and v.dtype == np.float32:
            out[k] = v.astype(np.float16)
    return out


def expand_batch(batch: Dict) -> Dict:
    """Device-side (jit-traceable) decode; identity on float batches."""
    out = dict(batch)
    for k in _RGB_KEYS:
        v = out.get(k)
        if v is not None and v.dtype == jnp.uint8:
            out[k] = v.astype(jnp.float32) / 255.0
    for k in _PCD_KEYS:
        v = out.get(k)
        if v is not None and v.dtype == jnp.float16:
            out[k] = v.astype(jnp.float32)
    return out
