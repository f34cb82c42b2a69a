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
# ACT3D_BWD_L_TILE (trace-time env) overrides — the projection-fold
# re-enable condition (BENCH_NOTES "Projection-fold A/B"): pre-padded
# 128-lane operands push the S=3074 working set 716 KB over the scoped
# limit at Lt=128; Lt=64 halves the (Lt, S) temporaries.  With dropout,
# Lt < 128 is only allowed for L <= 128 (see _mha_bwd_body's block-bits
# slice, which keeps the PRNG stream identical to the forward's).
_BWD_L_TILE = 128


def fold_headpad_enabled() -> bool:
    """ACT3D_FOLD_HEADPAD default (ON since r5, BENCH_NOTES
    "Projection-fold re-attempt") — the single source of truth shared by
    the ops-layer fold and the backward-tile rule below (an earlier
    default mismatch left Lt=128 under folded e=128 operands and
    resurrected the r4 scoped-VMEM OOM)."""
    import os

    return os.environ.get("ACT3D_FOLD_HEADPAD", "1") == "1"


def _bwd_l_tile(e: int = 0, s: int = 0) -> int:
    """Backward L-tile for lane width ``e`` and context length ``s``.

    r5 chip A/Bs (BENCH_NOTES): with the head-pad FOLD on, the
    pre-padded e=128 operands overflow scoped VMEM at Lt=128/S≈3k, and
    the shrunken tiles cost throughput (fold-tile A/B: Lt=96 = 779.3 vs
    Lt=64 = 761.6 samples/s) — so the default picks the largest tile
    that fits: 96 for fold-padded full-tile widths at the measured S
    range, 64 beyond it (unmeasured S > 4096 where 96's margin is
    unproven), 128 otherwise.  ACT3D_BWD_L_TILE forces either way.
    """
    import os

    env = os.environ.get("ACT3D_BWD_L_TILE")
    if env is not None:
        return int(env)
    if fold_headpad_enabled() and e >= 128:
        return 96 if 0 < s <= 4096 else 64
    return _BWD_L_TILE


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Attention-weight dropout (reference multihead_custom_attention.py:407-415)
# inside the kernel: the keep mask is (re)generated from the TPU PRNG with a
# seed folded from (base_seed, batch, l_tile, head), so the backward pass
# reproduces the forward's exact mask without an (L, S) mask in HBM.  The
# row-block size is pinned to _DROPOUT_L_TILE in BOTH passes so the
# (batch, l_tile) seeding identifies the same rows.
_DROPOUT_L_TILE = 128


def _dropout_bits(seed_ref, h, shape, tile_id=None):
    # one folded scalar: this TPU toolchain's prng_set_seed lowering only
    # takes a single value.  Strides keep (batch, l_tile, head) triples
    # collision-free at any realistic grid (1000003 > 128 tiles * 7919;
    # 7919 > 16 heads * 101).  tile_id overrides the grid position for
    # callers whose row tile differs from the seeding block (the
    # shrunken-Lt backward).
    if tile_id is None:
        tile_id = pl.program_id(1)
    pltpu.prng_seed(
        seed_ref[0]
        + pl.program_id(0) * 1000003
        + tile_id * 7919
        + h * 101
    )
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _keep_threshold(rate):
    # drop with probability `rate`: bits < rate * 2^32
    return jnp.uint32(min(int(rate * 2.0**32), 2**32 - 1))


def _dropout_keep(seed_ref, h, shape, rate, tile_id=None):
    bits = _dropout_bits(seed_ref, h, shape, tile_id)
    return bits >= _keep_threshold(rate)


def _apply_dropout(p, keep, rate):
    return jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)


def _emulated_keep(seed, b, heads, l, s, rate):
    """Interpret-mode stand-in for the in-kernel PRNG (pltpu.prng_* has no
    CPU lowering): a deterministic function of the same seed, shared by
    the fwd and bwd emulation paths so gradients stay consistent.  The
    bit stream differs from the TPU kernel's — dropout semantics, not bit
    parity, is the contract."""
    key = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32).reshape(()))
    return jax.random.bernoulli(key, 1.0 - rate, (b, heads, l, s))


def _split_heads(x, heads):
    b, n, e = x.shape
    return x.reshape(b, n, heads, e // heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _dropout_interpret_fwd(q, k, v, num_heads, mask, rate, seed):
    qh, kh, vh = (_split_heads(x, num_heads) for x in (q, k, v))
    scores = jnp.einsum(
        "bhld,bhsd->bhls", qh, kh, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], -1e30, scores)
    p = jax.nn.softmax(scores, axis=-1)
    keep = _emulated_keep(seed, *p.shape[:1], num_heads, *p.shape[2:], rate)
    pd = _apply_dropout(p, keep, rate)
    return _merge_heads(
        jnp.einsum("bhls,bhsd->bhld", pd.astype(vh.dtype), vh)
    ).astype(q.dtype)


def _dropout_interpret_bwd(q, k, v, mask, g, num_heads, rate, seed):
    qh, kh, vh, gh = (_split_heads(x, num_heads) for x in (q, k, v, g))
    scores = jnp.einsum(
        "bhld,bhsd->bhls", qh, kh, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], -1e30, scores)
    p = jax.nn.softmax(scores, axis=-1)
    keep = _emulated_keep(seed, *p.shape[:1], num_heads, *p.shape[2:], rate)
    pd = _apply_dropout(p, keep, rate)
    dv = jnp.einsum("bhls,bhld->bhsd", pd.astype(vh.dtype), gh)
    dp = jnp.einsum(
        "bhld,bhsd->bhls", gh, vh, preferred_element_type=jnp.float32
    )
    dp = _apply_dropout(dp, keep, rate)
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(q.dtype)
    dq = jnp.einsum("bhls,bhsd->bhld", ds, kh)
    dk = jnp.einsum("bhls,bhld->bhsd", ds, qh)
    return _merge_heads(dq), _merge_heads(dk), _merge_heads(dv)


# ---------------------------------------------------------------- fwd kernel
def _mha_fwd_kernel(q_ref, k_ref, v_ref, o_ref, stats_ref, *, heads: int):
    _mha_fwd_body(None, None, q_ref, k_ref, v_ref, o_ref, stats_ref,
                  heads=heads, rate=0.0)


def _mha_fwd_kernel_masked(mask_ref, q_ref, k_ref, v_ref, o_ref, stats_ref,
                           *, heads: int):
    _mha_fwd_body(mask_ref, None, q_ref, k_ref, v_ref, o_ref, stats_ref,
                  heads=heads, rate=0.0)


def _mha_fwd_kernel_dropout(seed_ref, q_ref, k_ref, v_ref, o_ref, stats_ref,
                            *, heads: int, rate: float):
    _mha_fwd_body(None, seed_ref, q_ref, k_ref, v_ref, o_ref, stats_ref,
                  heads=heads, rate=rate)


def _mha_fwd_kernel_masked_dropout(seed_ref, mask_ref, q_ref, k_ref, v_ref,
                                   o_ref, stats_ref, *, heads: int,
                                   rate: float):
    _mha_fwd_body(mask_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, stats_ref,
                  heads=heads, rate=rate)


def _mha_fwd_body(mask_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, stats_ref,
                  *, heads: int, rate: float):
    """Softmax attention forward for one (batch, L-tile) block.

    Flash-style: the row max ``m`` and exp-sum ``l`` are written to
    ``stats_ref`` (layout (1, Lt, 2·heads), f32) so the backward never
    re-reduces the (Lt, S) score matrix.  The 1/l normalisation is
    applied to the (Lt, d) output instead of the (Lt, S) probabilities —
    one VPU pass on the small operand replaces one on the big one.
    """
    e = q_ref.shape[-1]
    d = e // heads
    neg = jnp.float32(-1e30)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Lt, S)
        if mask_ref is not None:
            s = jnp.where(mask_ref[0], neg, s)
        m = jnp.max(s, axis=-1, keepdims=True)  # (Lt, 1)
        ex = jnp.exp(s - m)  # (Lt, S)
        lsum = jnp.sum(ex, axis=-1, keepdims=True)  # (Lt, 1)
        if rate > 0.0:
            keep = _dropout_keep(seed_ref, h, ex.shape, rate)
            ex = jnp.where(keep, ex, 0.0)
        o = jnp.dot(
            ex.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o = o * (inv_keep / lsum)  # (Lt, d) row-scale
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
        stats_ref[0, :, 2 * h:2 * h + 1] = m
        stats_ref[0, :, 2 * h + 1:2 * h + 2] = lsum


# ---------------------------------------------------------------- bwd kernel
def _mha_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, stats_ref, delta_ref, dq_ref, dk_ref,
    dv_ref, dk_acc, dv_acc, *, heads: int,
):
    _mha_bwd_body(None, None, q_ref, k_ref, v_ref, do_ref, stats_ref,
                  delta_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                  heads=heads, rate=0.0)


def _mha_bwd_kernel_masked(
    mask_ref, q_ref, k_ref, v_ref, do_ref, stats_ref, delta_ref, dq_ref,
    dk_ref, dv_ref, dk_acc, dv_acc, *, heads: int,
):
    _mha_bwd_body(mask_ref, None, q_ref, k_ref, v_ref, do_ref, stats_ref,
                  delta_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                  heads=heads, rate=0.0)


def _mha_bwd_kernel_dropout(
    seed_ref, q_ref, k_ref, v_ref, do_ref, stats_ref, delta_ref, dq_ref,
    dk_ref, dv_ref, dk_acc, dv_acc, *, heads: int, rate: float,
):
    _mha_bwd_body(None, seed_ref, q_ref, k_ref, v_ref, do_ref, stats_ref,
                  delta_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                  heads=heads, rate=rate)


def _mha_bwd_kernel_masked_dropout(
    seed_ref, mask_ref, q_ref, k_ref, v_ref, do_ref, stats_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, heads: int, rate: float,
):
    _mha_bwd_body(mask_ref, seed_ref, q_ref, k_ref, v_ref, do_ref, stats_ref,
                  delta_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                  heads=heads, rate=rate)


def _mha_bwd_body(mask_ref, seed_ref, q_ref, k_ref, v_ref, do_ref, stats_ref,
                  delta_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                  heads: int, rate: float):
    """One (batch, L-tile) backward step — flash-style with saved stats.

    The grid walks L-tiles innermost; dk/dv accumulate in f32 VMEM scratch
    across the tiles of one batch row and flush to HBM on the last tile —
    nothing of size (L, S) ever leaves VMEM.

    VPU economy (the kernel is VPU-bound at small head dims — the act3d
    trace attributed ~20 ms/step to this backward before the rework):

      * the forward's row stats (m, l) arrive via ``stats_ref`` — no
        (Lt, S) max/sum re-reductions, only the exp recompute;
      * ``delta_ref`` carries rowsum(dO ⊙ O) computed in XLA on the
        (Lt, d) output — the classic flash-bwd identity
        Σ_s dP_s·P_s = Σ_d dO_d·O_d — replacing a (Lt, S) product + a
        reduction with nothing in-kernel;
      * the 1/l softmax normalisation is folded into the (Lt, d)
        operands (dO rows for dV, q rows for dK, dQ rows post-matmul),
        never touching an (Lt, S) temporary.

    With dropout, the keep mask is regenerated from the same
    (seed, batch, l_tile, head) PRNG stream as the forward.
    """
    e = q_ref.shape[-1]
    d = e // heads
    i = pl.program_id(1)
    n = pl.num_programs(1)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

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
        m = stats_ref[0][:, 2 * h:2 * h + 1]  # (Lt, 1) f32
        lsum = stats_ref[0][:, 2 * h + 1:2 * h + 2]  # (Lt, 1) f32
        delta = delta_ref[0][:, h:h + 1]  # (Lt, 1) f32
        r = 1.0 / lsum  # (Lt, 1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Lt, S)
        if mask_ref is not None:
            s = jnp.where(mask_ref[0], jnp.float32(-1e30), s)
        ex = jnp.exp(s - m)  # (Lt, S); p = ex * r
        if rate > 0.0:
            if ex.shape[0] == _DROPOUT_L_TILE:
                keep = _dropout_keep(seed_ref, h, ex.shape, rate)
            else:
                # Lt < the forward's seeding block (ACT3D_BWD_L_TILE
                # shrink): regenerate the FULL 128-row block's bit stream
                # and take this tile's row window, so the mask is
                # bit-identical to the forward's.  The caller asserts
                # l_pad <= _DROPOUT_L_TILE, so the block id is 0 for
                # every backward tile.
                full = _dropout_bits(
                    seed_ref, h, (_DROPOUT_L_TILE, ex.shape[1]), tile_id=0
                )
                # dynamic_slice has no Pallas TPU lowering in this
                # toolchain, and arith.select won't legalize on i1
                # vectors — so: static row windows of the u32 bits, a
                # scalar select between them, threshold after
                lt_rows = ex.shape[0]
                bits = full[:lt_rows]
                for j in range(1, _DROPOUT_L_TILE // lt_rows):
                    bits = jnp.where(
                        pl.program_id(1) == j,
                        full[j * lt_rows:(j + 1) * lt_rows], bits,
                    )
                keep = bits >= _keep_threshold(rate)
            ex_d = jnp.where(keep, ex, 0.0)
        else:
            ex_d = ex
        # dv += p_dropᵀ @ do, with the r·inv_keep row scale folded into
        # the (Lt, d) do operand
        dof = (do.astype(jnp.float32) * (r * inv_keep)).astype(v.dtype)
        dv = jax.lax.dot_general(
            ex_d.astype(v.dtype), dof, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, d)
        dv_acc[:, sl] += dv
        # dp = (do @ vᵀ) through the dropout mask; ds = p ⊙ (dp - delta)
        # with the r fold deferred to the small operands
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Lt, S)
        if rate > 0.0:
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = ex * (dp - delta)  # (Lt, S); true ds = this * r (folded below)
        dsb = ds.astype(q.dtype)
        dq = jnp.dot(dsb, k, preferred_element_type=jnp.float32) * r
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        qf = (q.astype(jnp.float32) * r).astype(q.dtype)
        dk = jax.lax.dot_general(
            dsb, qf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, d)
        dk_acc[:, sl] += dk

    @pl.when(i == n - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


# ------------------------------------------------------------------ wrappers
@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 5, 6, 7)
)
def fused_mha(q, k, v, num_heads, key_padding_mask=None, l_tile=512,
              interpret=False, dropout_rate=0.0, dropout_seed=None):
    """Multi-head softmax attention core on (B, L, E) tensors.

    q: (B, L, E) pre-scaled, post-rotary; k/v: (B, S, E);
    key_padding_mask: optional (B, S) bool, True = masked out.
    dropout_rate / dropout_seed: attention-weight dropout (reference
    multihead_custom_attention.py:407-415) applied INSIDE the kernel —
    the keep mask comes from the TPU PRNG seeded per (seed, batch,
    l_tile, head) and is regenerated identically in the backward pass;
    ``dropout_seed`` is an int32 (1,) array.
    Returns (B, L, E) — per-head attention with heads taken as contiguous
    E/num_heads lane slices (identical to the reshape-based jnp path).
    """
    out, _ = _fused_mha_fwd_impl(
        q, k, v, num_heads, key_padding_mask, l_tile, interpret,
        dropout_rate, dropout_seed,
    )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "l_tile", "interpret", "dropout_rate"),
)
def _fused_mha_fwd_impl(q, k, v, num_heads, mask, l_tile, interpret,
                        dropout_rate=0.0, dropout_seed=None):
    """Returns (out[B, L, E], stats[B, L_pad, 2H] f32 or None).

    stats packs the per-head softmax row max and exp-sum
    (m_h at lane 2h, l_h at lane 2h+1) consumed by the flash-style
    backward; None on the interpret-mode dropout emulation path (its
    backward recomputes from scratch).
    """
    b, l, e = q.shape
    s = k.shape[1]
    if dropout_rate > 0.0 and interpret:
        return _dropout_interpret_fwd(
            q, k, v, num_heads, mask, dropout_rate, dropout_seed
        ), None
    if dropout_rate > 0.0:
        # pin the row-block size so the backward's (batch, l_tile) PRNG
        # seeding addresses the same rows (see _dropout_keep)
        l_tile = _DROPOUT_L_TILE
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
    mask_spec = pl.BlockSpec(
        (1, 1, s), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    stats_spec = pl.BlockSpec(
        (1, lt, 2 * num_heads), lambda bi, i: (bi, i, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = (
        jax.ShapeDtypeStruct((b, l_pad, e), q.dtype),
        jax.ShapeDtypeStruct((b, l_pad, 2 * num_heads), jnp.float32),
    )
    out_specs = (q_spec, stats_spec)

    if dropout_rate > 0.0:
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
        if mask is None:
            kern = functools.partial(
                _mha_fwd_kernel_dropout, heads=num_heads, rate=dropout_rate
            )
            out, stats = pl.pallas_call(
                kern, out_shape=out_shape, grid=grid,
                in_specs=[seed_spec, q_spec, kv_spec, kv_spec],
                out_specs=out_specs, interpret=interpret,
            )(seed, q, k, v)
        else:
            kern = functools.partial(
                _mha_fwd_kernel_masked_dropout, heads=num_heads,
                rate=dropout_rate,
            )
            out, stats = pl.pallas_call(
                kern, out_shape=out_shape, grid=grid,
                in_specs=[seed_spec, mask_spec, q_spec, kv_spec, kv_spec],
                out_specs=out_specs, interpret=interpret,
            )(seed, mask[:, None, :], q, k, v)
    elif mask is None:
        out, stats = pl.pallas_call(
            functools.partial(_mha_fwd_kernel, heads=num_heads),
            out_shape=out_shape,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=out_specs,
            interpret=interpret,
        )(q, k, v)
    else:
        out, stats = pl.pallas_call(
            functools.partial(_mha_fwd_kernel_masked, heads=num_heads),
            out_shape=out_shape,
            grid=grid,
            in_specs=[mask_spec, q_spec, kv_spec, kv_spec],
            out_specs=out_specs,
            interpret=interpret,
        )(mask[:, None, :], q, k, v)
    return out[:, :l], stats


def _fused_mha_fwd(q, k, v, num_heads, mask, l_tile, interpret,
                   dropout_rate, dropout_seed):
    out, stats = _fused_mha_fwd_impl(
        q, k, v, num_heads, mask, l_tile, interpret, dropout_rate,
        dropout_seed,
    )
    return out, (q, k, v, out, stats, mask, dropout_seed)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "interpret", "dropout_rate",
                     "bwd_l_tile"),
)
def _fused_mha_bwd_impl(q, k, v, out, stats, mask, g, num_heads, interpret,
                        dropout_rate=0.0, dropout_seed=None,
                        bwd_l_tile=_BWD_L_TILE):
    b, l, e = q.shape
    s = k.shape[1]
    d = e // num_heads
    if dropout_rate > 0.0 and interpret:
        return _dropout_interpret_bwd(
            q, k, v, mask, g, num_heads, dropout_rate, dropout_seed
        )
    # delta_h = rowsum(dO_h ⊙ O_h) — the flash-bwd identity for
    # Σ_s dP·P, computed in XLA on the small (B, L, E) tensors
    delta = jnp.sum(
        (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
            b, l, num_heads, d
        ),
        axis=-1,
    )  # (B, L, H) f32
    lt = min(bwd_l_tile, _round_up(l, 128))
    if dropout_rate > 0.0 and lt < _DROPOUT_L_TILE:
        # the block-bits slice in _mha_bwd_body only reproduces the
        # forward's mask when every backward tile sits inside the single
        # 128-row seeding block — ignore the shrink for longer L
        if _round_up(l, lt) > _DROPOUT_L_TILE:
            lt = min(_DROPOUT_L_TILE, _round_up(l, 128))
    l_pad = _round_up(l, lt)
    if l_pad != l:
        q = jnp.pad(q, ((0, 0), (0, l_pad - l), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, l_pad - l), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, l_pad - l), (0, 0)))
    # the forward may have padded L to a larger tile multiple; its padded
    # stats rows are well-formed (l >= 1), so slicing is always safe
    stats = stats[:, :l_pad]

    grid = (b, l_pad // lt)
    q_spec = pl.BlockSpec(
        (1, lt, e), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, s, e), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec(
        (1, 1, s), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    stats_spec = pl.BlockSpec(
        (1, lt, 2 * num_heads), lambda bi, i: (bi, i, 0),
        memory_space=pltpu.VMEM,
    )
    delta_spec = pl.BlockSpec(
        (1, lt, num_heads), lambda bi, i: (bi, i, 0),
        memory_space=pltpu.VMEM,
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
    if dropout_rate > 0.0:
        assert lt == _DROPOUT_L_TILE or l_pad <= _DROPOUT_L_TILE
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
        if mask is None:
            kern = functools.partial(
                _mha_bwd_kernel_dropout, heads=num_heads, rate=dropout_rate
            )
            dq, dk, dv = pl.pallas_call(
                kern, out_shape=out_shapes, grid=grid,
                in_specs=[seed_spec, q_spec, kv_spec, kv_spec, q_spec,
                          stats_spec, delta_spec],
                out_specs=(q_spec, kv_spec, kv_spec),
                scratch_shapes=scratch, interpret=interpret,
            )(seed, q, k, v, g, stats, delta)
        else:
            kern = functools.partial(
                _mha_bwd_kernel_masked_dropout, heads=num_heads,
                rate=dropout_rate,
            )
            dq, dk, dv = pl.pallas_call(
                kern, out_shape=out_shapes, grid=grid,
                in_specs=[
                    seed_spec, mask_spec, q_spec, kv_spec, kv_spec, q_spec,
                    stats_spec, delta_spec,
                ],
                out_specs=(q_spec, kv_spec, kv_spec),
                scratch_shapes=scratch, interpret=interpret,
            )(seed, mask[:, None, :], q, k, v, g, stats, delta)
    elif mask is None:
        dq, dk, dv = pl.pallas_call(
            functools.partial(_mha_bwd_kernel, heads=num_heads),
            out_shape=out_shapes,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, stats_spec,
                      delta_spec],
            out_specs=(q_spec, kv_spec, kv_spec),
            scratch_shapes=scratch,
            interpret=interpret,
        )(q, k, v, g, stats, delta)
    else:
        dq, dk, dv = pl.pallas_call(
            functools.partial(_mha_bwd_kernel_masked, heads=num_heads),
            out_shape=out_shapes,
            grid=grid,
            in_specs=[mask_spec, q_spec, kv_spec, kv_spec, q_spec,
                      stats_spec, delta_spec],
            out_specs=(q_spec, kv_spec, kv_spec),
            scratch_shapes=scratch,
            interpret=interpret,
        )(mask[:, None, :], q, k, v, g, stats, delta)
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


def _fused_mha_bwd(num_heads, l_tile, interpret, dropout_rate, residuals, g):
    q, k, v, out, stats, mask, dropout_seed = residuals
    if k.shape[1] > _MAX_BWD_S:
        # dropout is never eligible above _MAX_FUSED_S == _MAX_BWD_S, so
        # the jnp fallback (which cannot reproduce the in-kernel PRNG)
        # only ever sees rate == 0
        assert dropout_rate == 0.0
        dq, dk, dv = _fused_mha_bwd_jnp(q, k, v, mask, g, num_heads)
    else:
        # the tile override is read OUTSIDE the jitted impl (whose trace
        # cache would not see an env change) and threaded as a static arg
        dq, dk, dv = _fused_mha_bwd_impl(
            q, k, v, out, stats, mask, g, num_heads, interpret,
            dropout_rate, dropout_seed,
            bwd_l_tile=_bwd_l_tile(q.shape[-1], k.shape[1]),
        )
    return dq, dk, dv, None, None


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


import os as _os


def _head_pad_enabled(d: int) -> bool:
    """Lane-pad odd head dims (act3d: emb 60 / 4 heads -> d=15) up to the
    8-sublane granularity inside the kernel.  At d=15 every per-head lane
    slice [15h:15(h+1)] straddles sublane boundaries and Mosaic inserts
    lane-rotate ops on each q/k/v/do read and dq/dk/dv/o write — pure VPU
    overhead in an already VPU-bound backward (r3 profile: ~11 ms/step).
    Zero-filled pad lanes are numerically exact: they add 0 to every
    qk dot, receive 0 output weight, and propagate 0 gradient.
    ACT3D_MHA_PAD_HEADS=0/1 forces; default pads iff d % 8 != 0."""
    env = _os.environ.get("ACT3D_MHA_PAD_HEADS")
    if env is not None:
        return env == "1"
    return d % 8 != 0


def fused_cross_attention(
    q: jax.Array,  # (B, L, E) — pre-scaled, post-rotary
    k: jax.Array,  # (B, S, E) — post-rotary
    v: jax.Array,  # (B, S, E)
    num_heads: int,
    key_padding_mask: Optional[jax.Array] = None,  # (B, S)
    l_tile: int = 512,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    keep_padded: bool = False,
) -> jax.Array:
    """Multi-head attention core — kernel entry used by ops.attention.

    keep_padded: when head-dim lane padding is active, return the raw
    (B, L, H*dp) kernel output (pad lanes are exactly zero) instead of
    slicing back to (B, L, E).  The per-head strided slice can't fuse
    into the output projection's matmul — callers that own the output
    projection fold the slice into the weight instead (zero rows at pad
    lanes, ops/attention.py) and skip one (B, L, E)-sized copy per site.
    """
    e = q.shape[-1]
    d = e // num_heads
    if _head_pad_enabled(d):
        dp = _round_up(d, 8)

        def padh(x):
            b, n, _ = x.shape
            x = x.reshape(b, n, num_heads, d)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
            return x.reshape(b, n, num_heads * dp)

        # pad/slice sit OUTSIDE the custom_vjp, so their gradients are
        # XLA-native (pad^T = slice) and the kernel sees aligned lanes
        out = fused_mha(
            padh(q), padh(k), padh(v), num_heads, key_padding_mask,
            l_tile, interpret, dropout_rate, dropout_seed,
        )
        if keep_padded:
            return out
        b, l, _ = out.shape
        return out.reshape(b, l, num_heads, dp)[..., :d].reshape(b, l, e)
    return fused_mha(
        q, k, v, num_heads, key_padding_mask, l_tile, interpret,
        dropout_rate, dropout_seed,
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
