"""Pallas TPU kernels: fused multi-head cross-attention (fwd + bwd).

The reference's hottest kernel is the ghost-point↔context cross-attention
(reference: model/utils/multihead_custom_attention.py:391-415 — explicit
bmm(q,kᵀ) → softmax → bmm(·,v), which materialises the (B·H, L, S) score
matrix in HBM; ~3.1k context tokens at training, ~10k ghost points at
eval).  The act3d step trace (BENCH_NOTES round 2) shows the XLA lowering
paying ~13 ms/step writing score matrices fwd+bwd plus ~9 ms/step in head
split/merge transposes.  These kernels keep scores entirely in VMEM and
read q/k/v in their natural (B, L, E) layout:

  * the grid iterates (batch, L-tile); heads are a *static in-kernel loop*
    over lane slices ``[:, h*d:(h+1)*d]`` — no (B, H, L, D) transpose ever
    exists in HBM.
  * matmuls run on the MXU with f32 accumulation; softmax in f32.
  * the backward kernel recomputes the softmax from q/k (flash-style, no
    stored probabilities) and emits dq/dk/dv in one pass — nothing of size
    (L, S) ever reaches HBM.
  * optional key-padding mask (additive -1e30) for the trajectory denoiser.

``attention_core`` (B·H-flat layout, jnp backward) is retained as the
simpler reference kernel; ``fused_mha`` is what the model path uses via
``ops.attention.use_fused_attention``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_cross_attention", "fused_mha", "attention_core"]

# Backward keeps K/V plus f32 dk/dv accumulators resident in VMEM; above
# this S the custom VJP falls back to the jnp formulation (only eval-scale
# contexts exceed it, and eval never differentiates).
_MAX_BWD_S = 8192
# L-tile of the backward grid: keeps the per-tile (Lt, S) f32 score
# temporaries inside the 16 MB scoped-vmem budget at S ≈ 3.2k (the
# Mosaic stack holds ~3 such temporaries plus the f32 dk/dv accumulators).
_BWD_L_TILE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------- fwd kernel
def _mha_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int):
    e = q_ref.shape[-1]
    d = e // heads
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Lt, S)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _mha_fwd_kernel_masked(mask_ref, q_ref, k_ref, v_ref, o_ref, *, heads: int):
    e = q_ref.shape[-1]
    d = e // heads
    neg = jnp.float32(-1e30)
    mask = mask_ref[0]  # (1, S)
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(mask, neg, s)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


# ---------------------------------------------------------------- bwd kernel
def _mha_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
    heads: int,
):
    _mha_bwd_body(None, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                  dk_acc, dv_acc, heads=heads)


def _mha_bwd_kernel_masked(
    mask_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, dk_acc,
    dv_acc, *, heads: int,
):
    _mha_bwd_body(mask_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                  dv_ref, dk_acc, dv_acc, heads=heads)


def _mha_bwd_body(mask_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                  dv_ref, dk_acc, dv_acc, *, heads: int):
    """One (batch, L-tile) backward step.

    The grid walks L-tiles innermost; dk/dv accumulate in f32 VMEM scratch
    across the tiles of one batch row and flush to HBM on the last tile —
    nothing of size (L, S) ever leaves VMEM.
    """
    e = q_ref.shape[-1]
    d = e // heads
    i = pl.program_id(1)
    n = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Lt, S)
        if mask_ref is not None:
            s = jnp.where(mask_ref[0], jnp.float32(-1e30), s)
        p = jax.nn.softmax(s, axis=-1)
        pb = p.astype(v.dtype)
        # dv += pᵀ @ do
        dv = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, d)
        dv_acc[:, sl] += dv
        # dp = do @ vᵀ ; ds = p * (dp - rowsum(dp * p))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Lt, S)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dq = jnp.dot(dsb, k, preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk = jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, d)
        dk_acc[:, sl] += dk

    @pl.when(i == n - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


# ------------------------------------------------------------------ wrappers
@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 5, 6)
)
def fused_mha(q, k, v, num_heads, key_padding_mask=None, l_tile=512,
              interpret=False):
    """Multi-head softmax attention core on (B, L, E) tensors.

    q: (B, L, E) pre-scaled, post-rotary; k/v: (B, S, E);
    key_padding_mask: optional (B, S) bool, True = masked out.
    Returns (B, L, E) — per-head attention with heads taken as contiguous
    E/num_heads lane slices (identical to the reshape-based jnp path).
    """
    return _fused_mha_fwd_impl(
        q, k, v, num_heads, key_padding_mask, l_tile, interpret
    )


@functools.partial(
    jax.jit, static_argnames=("num_heads", "l_tile", "interpret")
)
def _fused_mha_fwd_impl(q, k, v, num_heads, mask, l_tile, interpret):
    b, l, e = q.shape
    s = k.shape[1]
    lt = min(l_tile, _round_up(l, 128))
    l_pad = _round_up(l, lt)
    if l_pad != l:
        q = jnp.pad(q, ((0, 0), (0, l_pad - l), (0, 0)))
    grid = (b, l_pad // lt)

    q_spec = pl.BlockSpec(
        (1, lt, e), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, s, e), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b, l_pad, e), q.dtype)

    if mask is None:
        out = pl.pallas_call(
            functools.partial(_mha_fwd_kernel, heads=num_heads),
            out_shape=out_shape,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            interpret=interpret,
        )(q, k, v)
    else:
        mask_spec = pl.BlockSpec(
            (1, 1, s), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_mha_fwd_kernel_masked, heads=num_heads),
            out_shape=out_shape,
            grid=grid,
            in_specs=[mask_spec, q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            interpret=interpret,
        )(mask[:, None, :], q, k, v)
    return out[:, :l]


def _fused_mha_fwd(q, k, v, num_heads, mask, l_tile, interpret):
    out = _fused_mha_fwd_impl(q, k, v, num_heads, mask, l_tile, interpret)
    return out, (q, k, v, mask)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "interpret")
)
def _fused_mha_bwd_impl(q, k, v, mask, g, num_heads, interpret):
    b, l, e = q.shape
    s = k.shape[1]
    lt = min(_BWD_L_TILE, _round_up(l, 128))
    l_pad = _round_up(l, lt)
    if l_pad != l:
        q = jnp.pad(q, ((0, 0), (0, l_pad - l), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, l_pad - l), (0, 0)))

    grid = (b, l_pad // lt)
    q_spec = pl.BlockSpec(
        (1, lt, e), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, s, e), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = (
        jax.ShapeDtypeStruct((b, l_pad, e), q.dtype),  # dq
        jax.ShapeDtypeStruct((b, s, e), k.dtype),  # dk
        jax.ShapeDtypeStruct((b, s, e), v.dtype),  # dv
    )
    scratch = [
        pltpu.VMEM((s, e), jnp.float32),  # dk accumulator
        pltpu.VMEM((s, e), jnp.float32),  # dv accumulator
    ]
    if mask is None:
        dq, dk, dv = pl.pallas_call(
            functools.partial(_mha_bwd_kernel, heads=num_heads),
            out_shape=out_shapes,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, q_spec],
            out_specs=(q_spec, kv_spec, kv_spec),
            scratch_shapes=scratch,
            interpret=interpret,
        )(q, k, v, g)
    else:
        mask_spec = pl.BlockSpec(
            (1, 1, s), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
        )
        dq, dk, dv = pl.pallas_call(
            functools.partial(_mha_bwd_kernel_masked, heads=num_heads),
            out_shape=out_shapes,
            grid=grid,
            in_specs=[mask_spec, q_spec, kv_spec, kv_spec, q_spec],
            out_specs=(q_spec, kv_spec, kv_spec),
            scratch_shapes=scratch,
            interpret=interpret,
        )(mask[:, None, :], q, k, v, g)
    return dq[:, :l], dk, dv


def _fused_mha_bwd_jnp(q, k, v, mask, g, num_heads):
    """Fallback VJP for L beyond the VMEM budget (eval-scale; rarely
    differentiated) — the standard materialised formulation."""
    b, l, e = q.shape
    d = e // num_heads

    def split(x):
        return x.reshape(b, -1, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh, gh = split(q), split(k), split(v), split(g)
    scores = jnp.einsum(
        "bhld,bhsd->bhls", qh, kh, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], -1e30, scores)
    p = jax.nn.softmax(scores, axis=-1)
    pb = p.astype(vh.dtype)
    dv = jnp.einsum("bhls,bhld->bhsd", pb, gh)
    dp = jnp.einsum("bhld,bhsd->bhls", gh, vh, preferred_element_type=jnp.float32)
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(q.dtype)
    dq = jnp.einsum("bhls,bhsd->bhld", ds, kh)
    dk = jnp.einsum("bhls,bhld->bhsd", ds, qh)

    def merge(x):
        return x.transpose(0, 2, 1, 3).reshape(b, -1, e)

    return merge(dq), merge(dk), merge(dv)


def _fused_mha_bwd(num_heads, l_tile, interpret, residuals, g):
    q, k, v, mask = residuals
    if k.shape[1] > _MAX_BWD_S:
        dq, dk, dv = _fused_mha_bwd_jnp(q, k, v, mask, g, num_heads)
    else:
        dq, dk, dv = _fused_mha_bwd_impl(
            q, k, v, mask, g, num_heads, interpret
        )
    return dq, dk, dv, None


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def fused_cross_attention(
    q: jax.Array,  # (B, L, E) — pre-scaled, post-rotary
    k: jax.Array,  # (B, S, E) — post-rotary
    v: jax.Array,  # (B, S, E)
    num_heads: int,
    key_padding_mask: Optional[jax.Array] = None,  # (B, S)
    l_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention core — kernel entry used by ops.attention."""
    return fused_mha(
        q, k, v, num_heads, key_padding_mask, l_tile, interpret
    )


# ------------------------------------------------------------------
# Reference single-head-layout kernel (kept for tests/experiments):
# (B·H, L, D) in, jnp backward.
# ------------------------------------------------------------------
def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
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
    recomputes scores in jnp (standard softmax-attention VJP).
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
