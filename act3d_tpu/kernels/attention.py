"""Pallas TPU kernel: fused cross-attention (scores + softmax + weighted sum).

The reference's hottest kernel is the ghost-point↔context cross-attention
(reference: model/utils/multihead_custom_attention.py:391-415 — explicit
bmm(q,kᵀ) → softmax → bmm(·,v), which materialises the (B·H, L, S) score
matrix in HBM; ~3.3k ghost points × ~3.2k context tokens at eval).  This
kernel keeps the score tile in VMEM and writes only the (L, D) output.

Design (TPU-first, sized for this model family):
  * head_dim is tiny (60/4 = 15, 120/8 = 15) and S ≈ 3.2k, so the whole
    per-head K/V (S × D ≈ 200 KB) fits VMEM comfortably: the grid is
    (B·H, L/L_TILE) with K/V resident per head and Q streamed in L-tiles.
    No online-softmax pass is needed — the (L_TILE, S) score tile lives
    entirely in VMEM.
  * matmuls run on the MXU with f32 accumulation (`preferred_element_type`).
  * optional key-padding mask (additive -inf) for the trajectory denoiser.

The jnp reference path (ops.attention) remains the source of truth; this
kernel is validated against it in tests (interpret mode on CPU, compiled on
TPU) and selected via ``use_fused_attention``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_cross_attention", "attention_core"]


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    # q: (1, Lt, D), k/v: (1, S, D), o: (1, Lt, D)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Lt, S)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(weights, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _attn_kernel_masked(mask_ref, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    neg = jnp.asarray(-1e30, scores.dtype)
    scores = jnp.where(mask_ref[0], neg, scores)  # mask block is (1, 1, S)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(weights, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def attention_core(
    q: jax.Array,  # (BH, L, D) — pre-scaled, post-rotary
    k: jax.Array,  # (BH, S, D) — post-rotary
    v: jax.Array,  # (BH, S, D)
    mask: Optional[jax.Array] = None,  # (BH, S) bool, True = masked
    l_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q @ kᵀ) @ v with the score tile kept in VMEM.

    Differentiable: forward runs the Pallas kernel; the backward pass
    recomputes scores in jnp (standard softmax-attention VJP) — XLA fuses
    it the same way it fuses the reference path's backward.
    """
    return _attention_core(q, k, v, mask, l_tile, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_core(q, k, v, mask, l_tile, interpret):
    return _attention_core_fwd_impl(q, k, v, mask, l_tile, interpret)


@functools.partial(jax.jit, static_argnames=("l_tile", "interpret"))
def _attention_core_fwd_impl(
    q, k, v, mask=None, l_tile: int = 512, interpret: bool = False
):
    bh, l, d = q.shape
    s = k.shape[1]

    l_pad = _round_up(l, l_tile)
    if l_pad != l:
        q = jnp.pad(q, ((0, 0), (0, l_pad - l), (0, 0)))
    grid = (bh, l_pad // l_tile)

    q_spec = pl.BlockSpec(
        (1, l_tile, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, s, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, l_tile, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )

    if mask is None:
        out = pl.pallas_call(
            _attn_kernel,
            out_shape=jax.ShapeDtypeStruct((bh, l_pad, d), q.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=out_spec,
            interpret=interpret,
        )(q, k, v)
    else:
        # (BH, 1, S): keeps the block's trailing dims equal to the array's
        # (Mosaic tiling constraint)
        mask3 = mask[:, None, :]
        mask_spec = pl.BlockSpec(
            (1, 1, s), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            _attn_kernel_masked,
            out_shape=jax.ShapeDtypeStruct((bh, l_pad, d), q.dtype),
            grid=grid,
            in_specs=[mask_spec, q_spec, kv_spec, kv_spec],
            out_specs=out_spec,
            interpret=interpret,
        )(mask3, q, k, v)
    return out[:, :l]


def _attention_core_fwd(q, k, v, mask, l_tile, interpret):
    out = _attention_core_fwd_impl(q, k, v, mask, l_tile, interpret)
    return out, (q, k, v, mask)


def _attention_core_bwd(l_tile, interpret, residuals, g):
    q, k, v, mask = residuals
    scores = jnp.einsum(
        "bld,bsd->bls", q, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = jnp.where(mask[:, None, :], -1e30, scores)
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    dv = jnp.einsum("bls,bld->bsd", w, g)
    dw = jnp.einsum("bld,bsd->bls", g, v)
    dw32 = dw.astype(jnp.float32) * w.astype(jnp.float32)
    ds = (dw32 - jnp.sum(dw32, axis=-1, keepdims=True) * w.astype(jnp.float32))
    ds = ds.astype(q.dtype)
    dq = jnp.einsum("bls,bsd->bld", ds, k)
    dk = jnp.einsum("bls,bld->bsd", ds, q)
    return dq, dk, dv, None


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


def fused_cross_attention(
    q: jax.Array,  # (B, L, E) — pre-scaled, post-rotary
    k: jax.Array,  # (B, S, E) — post-rotary
    v: jax.Array,  # (B, S, E)
    num_heads: int,
    key_padding_mask: Optional[jax.Array] = None,  # (B, S)
    l_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention core on (B, L, E) tensors via the Pallas kernel.

    Projections and rotary embedding happen outside (XLA fuses those); this
    replaces only the scores→softmax→values core.
    """
    b, l, e = q.shape
    s = k.shape[1]
    d = e // num_heads

    def split(x, n):
        return (
            x.reshape(b, n, num_heads, d)
            .transpose(0, 2, 1, 3)
            .reshape(b * num_heads, n, d)
        )

    qh, kh, vh = split(q, l), split(k, s), split(v, s)
    mask = None
    if key_padding_mask is not None:
        mask = jnp.repeat(key_padding_mask, num_heads, axis=0)
    lt = min(l_tile, _round_up(l, 128))
    out = attention_core(qh, kh, vh, mask, l_tile=lt, interpret=interpret)
    return (
        out.reshape(b, num_heads, l, d).transpose(0, 2, 1, 3).reshape(b, l, e)
    )
