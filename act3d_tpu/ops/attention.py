"""Multi-head attention with 3D rotary PE — functional core.

TPU-native replacement for the reference's fork of ``nn.MultiheadAttention``
(reference: model/utils/multihead_custom_attention.py:157-462).  Differences
by design:

  * batch-major ``(B, L, E)`` layout throughout (the reference is seq-major
    ``(L, N, E)`` and shuffles with transposes) — XLA keeps the lane dim last.
  * no weight materialisation unless asked; softmax in float32.
  * the rotary code is applied to the *full* embedding dim before the head
    split, matching the reference (multihead_custom_attention.py:348-353).
  * an optional fused Pallas path (``act3d_tpu.kernels``) is selected by the
    caller; this module is the always-correct jnp reference.

The unused memorizing-transformer gating branch of the reference
(multihead_custom_attention.py:419-449) is intentionally not ported: it is
dead code in every model config.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .rotary import embed_rotary, pair_rotation_matrix

__all__ = ["AttentionParams", "multi_head_attention", "use_fused_attention"]

_FUSED = {"enabled": None}  # None = auto: on for TPU, off for CPU/GPU
# Beyond this context length the fused kernel's VMEM budget is at risk;
# the XLA path takes over (no flagship config comes close).
_MAX_FUSED_S = 8192
# Below this many total query rows (B*L) the kernel's fixed costs beat
# its HBM savings and XLA wins: the r3 bisect of the r2 sampler
# regression measured the batch-1, L=50 reverse-diffusion loop at
# 69.7 ms fused vs 62.2 ms XLA (BENCH_NOTES round 3).  Training shapes
# (B>=16, L>=50) and Act3D eval (L=3333 ghost queries) stay fused.
_MIN_FUSED_ROWS = 1024
# Below this context length the kernel has little HBM traffic to save
# while its fixed costs stay (S lane-padded to 128, per-L-tile VPU
# softmax passes): the r3 act3d profile attributes 13.2 ms/step to the
# six fused S=53 instruction cross-attentions (6 x 1.49 bwd + 0.71 fwd,
# BENCH_NOTES), and the diffusion trainer's S<=53 sites already measured
# faster on XLA (547 vs 500).  Full-step A/B (BENCH_NOTES "Small-S
# routing floor"): act3d 375.8 -> 409.1 samples/s with the floor on.
# ACT3D_FUSED_MIN_S overrides (0 restores the pre-floor routing).
_MIN_FUSED_S = int(os.environ.get("ACT3D_FUSED_MIN_S", "128"))


def use_fused_attention(enabled: Optional[bool] = True):
    """Route eligible attention cores through the Pallas kernel
    (act3d_tpu.kernels.attention).  Eligible = no slot competition,
    context within the kernel's VMEM budget, and at least
    ``_MIN_FUSED_ROWS`` total query rows (small batch-1 eval shapes are
    faster on XLA — r3 sampler bisect).  Attention-weight dropout has an
    in-kernel implementation (TPU PRNG keep mask, regenerated in the
    backward), ON by default since r4 (+18% full-scale diffusion A/B,
    BENCH_NOTES round 4); ACT3D_FUSED_DROPOUT=0 opts out.
    Pass None to restore the automatic default (TPU on, others off);
    the ACT3D_FUSED_ATTENTION env var (0/1) overrides everything."""
    _FUSED["enabled"] = enabled


def _fused_enabled() -> bool:
    env = os.environ.get("ACT3D_FUSED_ATTENTION")
    if env is not None:
        return env == "1"
    if _FUSED["enabled"] is not None:
        return _FUSED["enabled"]
    # Strictly TPU: the kernel uses pltpu memory spaces and would crash
    # on GPU backends (docstring contract: 'TPU on, others off').
    return jax.default_backend() == "tpu"


class AttentionParams(NamedTuple):
    """Projection weights. Kernels are (in_dim, out_dim) as in flax."""

    wq: jax.Array  # (E, E)
    wk: jax.Array
    wv: jax.Array
    wo: jax.Array
    bq: Optional[jax.Array] = None  # (E,)
    bk: Optional[jax.Array] = None
    bv: Optional[jax.Array] = None
    bo: Optional[jax.Array] = None


def _proj(x: jax.Array, w: jax.Array, b: Optional[jax.Array]) -> jax.Array:
    y = jnp.einsum("...e,ef->...f", x, w)
    if b is not None:
        y = y + b
    return y


def multi_head_attention(
    params: AttentionParams,
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    num_heads: int,
    *,
    q_pe: Optional[jax.Array] = None,
    k_pe: Optional[jax.Array] = None,
    key_padding_mask: Optional[jax.Array] = None,
    slot_competition: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product multi-head attention.

    Args:
      query: (B, L, E); key/value: (B, S, E).
      q_pe / k_pe: optional rotary codes (B, L, E, 2) / (B, S, E, 2).
      key_padding_mask: optional (B, S) bool, True = masked out.
      slot_competition: softmax over queries then renormalise over keys
        (reference multihead_custom_attention.py:406-408).
      dropout_rate / dropout_rng: attention-weight dropout (train only).

    Returns:
      (B, L, E) attention output after the output projection.
    """
    B, L, E = query.shape
    S = key.shape[1]
    head_dim = E // num_heads
    scaling = head_dim**-0.5

    # In-kernel attention-weight dropout, ON by default since round 4:
    # the r3 blocker (a remote-compile-helper crash on the 50x3074
    # pyramid cross-attention inside the full model) is gone on the
    # current toolchain (scripts/repro_fused_dropout_crash.py — all four
    # isolation rungs compile and run), and the full-scale same-process
    # A/B (bench.py diffusion_ab_fused_dropout, b22 training step)
    # measures fused 666.5 vs XLA 564.0 samples/s (+18%).  The r3
    # negative (kernel 9% behind XLA) only ever covered the small
    # S<=53 sites, which the _MIN_FUSED_S=128 routing floor keeps on
    # XLA regardless — so this flag now only affects the big site.
    # ACT3D_FUSED_DROPOUT=0 opts out.
    dropout_kernel_ok = (
        dropout_rng is not None
        and os.environ.get("ACT3D_FUSED_DROPOUT", "1") == "1"
        and S <= int(os.environ.get("ACT3D_FUSED_DROPOUT_MAX_S",
                                    str(_MAX_FUSED_S)))
    )
    use_fused = (
        _fused_enabled()
        and not slot_competition
        and (dropout_rate == 0.0 or dropout_kernel_ok)
        and _MIN_FUSED_S <= S <= _MAX_FUSED_S
        and B * L >= _MIN_FUSED_ROWS
    )

    wq, wk, wv = params.wq, params.wk, params.wv
    bq, bk, bv = params.bq, params.bk, params.bv
    rot_spec = None
    if use_fused:
        from ..kernels.attention import _head_pad_enabled, _round_up

        # ACT3D_FOLD_HEADPAD (trace-time) folds the head-dim pad into
        # the q/k/v weights instead of padding around the kernel.  Ships
        # ON since r5: the r4 blocker (scoped-VMEM OOM at the 50x3074
        # site with pre-padded 128-lane operands) is solved by the
        # width-aware backward L-tile (kernels/attention.py::_bwd_l_tile
        # shrinks to 64 only for fold-padded e>=128).  Same-process chip
        # A/Bs: diffusion 612.1 -> 723.7 samples/s (+18.2%), act3d
        # 447.3 -> 455.0 (+1.7%) — BENCH_NOTES r5 "Projection-fold
        # re-attempt".  =0 reverts to padding around the kernel.
        from ..kernels.attention import fold_headpad_enabled

        fold_ok = fold_headpad_enabled()
        if fold_ok and _head_pad_enabled(head_dim):
            # Fold the kernel's head-dim lane padding (d -> dp, zeros in
            # the pad lanes — exact) into the q/k/v projections as zero
            # weight columns, and apply the rotary code in the padded
            # layout, so no (B, N, E)-sized pad copy (nor its backward
            # slice) survives around the kernel.  The rotary pair
            # rotation crosses head boundaries at odd d (it acts on the
            # full embedding, multihead_custom_attention.py:348-353) —
            # the dense pair_rotation_matrix re-indexed by lane_map
            # handles that permutation for free.  The padded code is the
            # same tensor at every layer of a stack, so XLA CSEs the code
            # pad to one op per stack (r4 diffusion profile: the per-site
            # q/k/v pads + backward slices cost ~1.8 ms/step).
            dp = _round_up(head_dim, 8)
            lane_map = (
                np.arange(E) // head_dim
            ) * dp + np.arange(E) % head_dim
            rot_spec = (lane_map, num_heads * dp)

            def _padw(w):
                w = w.reshape(w.shape[0], num_heads, head_dim)
                w = jnp.pad(w, ((0, 0), (0, 0), (0, dp - head_dim)))
                return w.reshape(w.shape[0], num_heads * dp)

            def _padb(b):
                if b is None:
                    return None
                b = jnp.pad(
                    b.reshape(num_heads, head_dim),
                    ((0, 0), (0, dp - head_dim)),
                )
                return b.reshape(num_heads * dp)

            def _pad_code(c):
                c = c.reshape(
                    c.shape[0], c.shape[1], num_heads, head_dim, 2
                )
                c = jnp.pad(
                    c,
                    ((0, 0), (0, 0), (0, 0), (0, dp - head_dim), (0, 0)),
                )
                return c.reshape(c.shape[0], c.shape[1], num_heads * dp, 2)

            wq, wk, wv = _padw(wq), _padw(wk), _padw(wv)
            bq, bk, bv = _padb(bq), _padb(bk), _padb(bv)
            if q_pe is not None:
                q_pe = _pad_code(q_pe)
            if k_pe is not None:
                k_pe = _pad_code(k_pe)

    q = _proj(query, wq, bq) * scaling
    k = _proj(key, wk, bk)
    v = _proj(value, wv, bv)

    rot = (
        pair_rotation_matrix(E, q.dtype, *rot_spec)
        if rot_spec is not None
        else None
    )
    if q_pe is not None:
        q = embed_rotary(q, q_pe, rot=rot)
    if k_pe is not None:
        k = embed_rotary(k, k_pe, rot=rot)

    if use_fused:
        from ..kernels.attention import fused_cross_attention

        seed = None
        if dropout_rate > 0.0:
            # fold the flax dropout key into the kernel's PRNG seed: the
            # keep mask is drawn in-kernel (threefry-in-VMEM would cost
            # ~22 ms/step at training scale, BENCH_NOTES round 1) with
            # reference semantics (weight dropout, scaled keep)
            seed = jax.random.randint(
                dropout_rng, (1,), 0, 2**31 - 1, dtype=jnp.int32
            )
        out = fused_cross_attention(
            q, k, v, num_heads, key_padding_mask=key_padding_mask,
            dropout_rate=float(dropout_rate), dropout_seed=seed,
            keep_padded=True,
        )
        if out.shape[-1] == E:
            return _proj(out, params.wo, params.bo)
        # Head-dim lane padding active (kernels/attention.py): fold the
        # per-head un-pad slice into the output projection instead of
        # copying — zero weight rows at the pad lanes are exact (the
        # kernel writes exact zeros there) and pad^T/slice^T stay
        # XLA-native through the VJP.
        dp = out.shape[-1] // num_heads
        wo = params.wo.reshape(num_heads, head_dim, E)
        wo = jnp.pad(wo, ((0, 0), (0, dp - head_dim), (0, 0)))
        return _proj(out, wo.reshape(num_heads * dp, E), params.bo)

    # (B, H, L, D)
    q = q.reshape(B, L, num_heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(B, -1, num_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, num_heads, head_dim).transpose(0, 2, 1, 3)

    scores = jnp.einsum(
        "bhld,bhsd->bhls", q, k, preferred_element_type=jnp.float32
    )
    if key_padding_mask is not None:
        scores = jnp.where(
            key_padding_mask[:, None, None, :], -jnp.inf, scores
        )

    if slot_competition:
        weights = jax.nn.softmax(scores, axis=-2) + 1e-8
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    else:
        weights = jax.nn.softmax(scores, axis=-1)

    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)

    weights = weights.astype(v.dtype)
    out = jnp.einsum("bhls,bhsd->bhld", weights, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
    return _proj(out, params.wo, params.bo)
