"""Rotary 3D positional encodings and sinusoidal timestep embeddings.

TPU-native equivalents of the reference's position-encoding layer
(reference: model/utils/position_encodings.py:7-97).  These are pure
functions of coordinates — there are no parameters — so they live in
``ops`` rather than ``nn``.

Layout convention: a position code for N tokens with feature dim F is an
array ``(..., N, F, 2)`` where ``[..., 0]`` is the cos half and
``[..., 1]`` the sin half, exactly mirroring the reference so converted
checkpoints see identical rotations.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rotary_pe_3d", "embed_rotary", "pair_rotation_matrix",
           "sinusoidal_pos_emb"]


def _duplicate_interleave(x: jax.Array) -> jax.Array:
    """(…, d) -> (…, 2d) via [a, b] -> [a, a, b, b] pairing.

    Mirrors ``torch.stack([feat, feat], -1).view(b, n, -1)`` in the reference
    (position_encodings.py:84-87).
    """
    return jnp.stack([x, x], axis=-1).reshape(x.shape[:-1] + (2 * x.shape[-1],))


def rotary_pe_3d(xyz: jax.Array, feature_dim: int) -> jax.Array:
    """3D rotary position code.

    Args:
      xyz: (..., N, 3) world-coordinate positions.
      feature_dim: embedding dim F; must satisfy ``(F // 3) % 2 == 0``.

    Returns:
      (..., N, F, 2) stacked (cos, sin) code.  The F axis is split into three
      contiguous thirds, one per spatial axis (reference
      position_encodings.py:58-97).
    """
    d_axis = feature_dim // 3
    div_term = jnp.exp(
        jnp.arange(0, d_axis, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_axis)
    )  # (d_axis // 2,)

    pos = xyz[..., None].astype(jnp.float32)  # (..., N, 3, 1)
    angles = pos * div_term  # (..., N, 3, d_axis//2)

    sin = _duplicate_interleave(jnp.sin(angles))  # (..., N, 3, d_axis)
    cos = _duplicate_interleave(jnp.cos(angles))

    # concat over the three axes -> (..., N, 3*d_axis)
    cos_pos = cos.reshape(cos.shape[:-2] + (3 * d_axis,))
    sin_pos = sin.reshape(sin.shape[:-2] + (3 * d_axis,))
    code = jnp.stack([cos_pos, sin_pos], axis=-1)
    return jax.lax.stop_gradient(code)


@lru_cache(maxsize=8)
def _pair_rotation_np(f: int) -> np.ndarray:
    """(F, F) constant with ``x @ R == rotate_pairs(x)``.

    Column j holds the single signed source of output lane j:
    ``x2[2m] = -x[2m+1]`` and ``x2[2m+1] = x[2m]``.
    """
    r = np.zeros((f, f), dtype=np.float32)
    even = np.arange(0, f, 2)
    odd = np.arange(1, f, 2)
    r[odd, even] = -1.0  # x2[even j] = -x[j + 1]
    r[even, odd] = 1.0  # x2[odd j] = x[j - 1]
    return r


def pair_rotation_matrix(
    f: int, dtype, lane_map: "np.ndarray | None" = None, padded_dim: int = 0
) -> jax.Array:
    """The rotate-pairs permutation as a dense ±1 matrix.

    With ``lane_map`` (unpadded lane i lives at padded lane ``lane_map[i]``)
    the matrix is re-indexed into the padded layout: pad lanes get all-zero
    rows and columns, so padded inputs with zero pad lanes produce padded
    outputs with zero pad lanes.
    """
    r = _pair_rotation_np(f)
    if lane_map is not None:
        rp = np.zeros((padded_dim, padded_dim), dtype=np.float32)
        rp[np.ix_(lane_map, lane_map)] = r
        r = rp
    return jnp.asarray(r, dtype=dtype)


def embed_rotary(
    x: jax.Array, code: jax.Array, rot: "jax.Array | None" = None
) -> jax.Array:
    """Apply a rotary position code to features.

    Args:
      x: (..., N, F) features (full embedding dim, before head split — the
         reference applies RoPE on the fused q/k projections,
         multihead_custom_attention.py:348-353).
      code: (..., N, F, 2) output of :func:`rotary_pe_3d`.
      rot: optional precomputed pair-rotation matrix (e.g. the padded-layout
         variant from :func:`pair_rotation_matrix` when the caller runs the
         fused kernel's head-dim lane padding); default is the standard
         (F, F) one.

    Returns:
      (..., N, F) rotated features: ``x * cos + rotate_pairs(x) * sin`` with
      pair rotation (x0, x1) -> (-x1, x0) (position_encodings.py:30-34).
    """
    # The code is always built in f32 (trig precision); cast it to the
    # feature dtype so mixed-precision q/k stay bf16 into the MXU instead
    # of silently promoting the score matmul to f32.
    code = code.astype(x.dtype)
    cos, sin = code[..., 0], code[..., 1]
    # ACT3D_ROTARY_MATMUL (trace-time): rotate_pairs as a dense matmul
    # against a ±1 permutation matrix instead of the strided stack/reshape
    # lane shuffle.  Exact: each output lane is one signed copy of one
    # input lane.  Ships ON since r5 — ISOLATED same-process chip A/Bs
    # (BENCH_NOTES r5): act3d 456.8 vs 452.6 (+0.9%), diffusion 785.0 vs
    # 776.1 (+1.1%); =0 reverts to the lane shuffle.  Callers passing
    # ``rot`` explicitly (the padded fold path) always use the matmul
    # form.
    if rot is None and os.environ.get("ACT3D_ROTARY_MATMUL", "1") != "1":
        x2 = jnp.stack([-x[..., 1::2], x[..., ::2]], axis=-1).reshape(x.shape)
        return x * cos + x2 * sin
    if rot is None:
        rot = pair_rotation_matrix(x.shape[-1], x.dtype)
    x2 = jnp.einsum("...f,fg->...g", x, rot)
    return x * cos + x2 * sin


def sinusoidal_pos_emb(x: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding for diffusion timesteps / sequence indices.

    Matches reference SinusoidalPosEmb (position_encodings.py:7-20):
    (B,) -> (B, dim) with [sin | cos] halves.
    """
    half_dim = dim // 2
    emb_scale = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb_scale)
    angles = x.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
