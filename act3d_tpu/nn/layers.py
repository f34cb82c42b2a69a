"""Transformer building blocks (flax.linen).

TPU-native re-designs of the reference attention stacks:

  * :class:`MultiheadAttention` — batch-major wrapper over
    ``ops.attention.multi_head_attention`` (reference fork of
    nn.MultiheadAttention: model/utils/multihead_custom_attention.py:14-155).
  * :class:`RelativeCrossAttentionLayer` / :class:`RelativeCrossAttentionModule`
    — rotary-3D cross-attention stacks used by Act3D
    (reference model/utils/layers.py:293-351).
  * :class:`ParallelAttentionLayer` / :class:`ParallelAttention` — two-sequence
    self/cross blocks with optional rotary PE + AdaLN used by the diffusion
    head (reference model/utils/layers.py:7-270).
  * :class:`AdaLN` (reference model/utils/layers.py:273-290).

LayerNorm epsilon is 1e-5 to match torch defaults.  All modules take a
``deterministic`` flag for dropout (the reference relies on module
train/eval mode).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import AttentionParams, multi_head_attention

LN_EPS = 1e-5


class MultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    slot_competition: bool = False

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        *,
        q_pe: Optional[jax.Array] = None,
        k_pe: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        e = self.embed_dim
        xavier = nn.initializers.xavier_uniform()
        zeros = nn.initializers.zeros_init()
        params = AttentionParams(
            wq=self.param("q_kernel", xavier, (e, e)),
            wk=self.param("k_kernel", xavier, (e, e)),
            wv=self.param("v_kernel", xavier, (e, e)),
            wo=self.param("out_kernel", xavier, (e, e)),
            bq=self.param("q_bias", zeros, (e,)),
            bk=self.param("k_bias", zeros, (e,)),
            bv=self.param("v_bias", zeros, (e,)),
            bo=self.param("out_bias", zeros, (e,)),
        )
        dropout_rng = None
        rate = self.dropout
        if not deterministic and rate > 0.0:
            dropout_rng = self.make_rng("dropout")
        else:
            rate = 0.0
        return multi_head_attention(
            params,
            query,
            key,
            value,
            self.num_heads,
            q_pe=q_pe,
            k_pe=k_pe,
            key_padding_mask=key_padding_mask,
            slot_competition=self.slot_competition,
            dropout_rate=rate,
            dropout_rng=dropout_rng,
        )


class RelativeCrossAttentionLayer(nn.Module):
    """Post-norm cross-attention with rotary relative PE (layers.py:293-310)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        value: jax.Array,
        query_pos: Optional[jax.Array] = None,
        value_pos: Optional[jax.Array] = None,
        pad_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        attn = MultiheadAttention(
            self.embed_dim, self.num_heads, dropout=self.dropout,
            name="multihead_attn",
        )(
            query,
            value,
            value,
            q_pe=query_pos,
            k_pe=value_pos,
            key_padding_mask=pad_mask,
            deterministic=deterministic,
        )
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm")(query + attn)


class FeedforwardLayer(nn.Module):
    """Residual MLP with post-norm (layers.py:313-332); hidden == embed dim."""

    embed_dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        xavier = nn.initializers.xavier_uniform()
        h = nn.Dense(self.hidden_dim, kernel_init=xavier, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.embed_dim, kernel_init=xavier, name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm")(x + h)


class RelativeCrossAttentionModule(nn.Module):
    """Stack of (cross-attn, FFW) pairs returning every intermediate output.

    Reference model/utils/layers.py:335-351.  Output is a tuple of
    (num_layers) arrays so Act3D can decode a mask per layer.
    """

    embed_dim: int
    num_heads: int
    num_layers: int

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        value: jax.Array,
        query_pos: Optional[jax.Array] = None,
        value_pos: Optional[jax.Array] = None,
        pad_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, ...]:
        outputs = []
        for i in range(self.num_layers):
            query = RelativeCrossAttentionLayer(
                self.embed_dim, self.num_heads, name=f"attn_{i}"
            )(query, value, query_pos, value_pos, pad_mask, deterministic)
            query = FeedforwardLayer(
                self.embed_dim, self.embed_dim, name=f"ffw_{i}"
            )(query, deterministic)
            outputs.append(query)
        return tuple(outputs)


class AdaLN(nn.Module):
    """Adaptive scale/shift modulation, zero-initialised (layers.py:273-290)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        """x: (B, N, C); t: (B, C)."""
        mod = nn.Dense(
            2 * self.embed_dim,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(),
            name="modulation",
        )(nn.silu(t.astype(x.dtype)))
        scale, shift = jnp.split(mod, 2, axis=-1)
        return x * (1.0 + scale[:, None]) + shift[:, None]


def _maybe_add(x: jax.Array, pos: Optional[jax.Array]) -> jax.Array:
    # positional embeddings are built in f32; follow the feature dtype so
    # mixed precision doesn't silently promote q/k to f32
    return x if pos is None else x + pos.astype(x.dtype)


class ParallelAttentionLayer(nn.Module):
    """Self-/cross-attention between two sequences (layers.py:7-218).

    Order of operations (post-norm default): cross 1←2, cross 2←1,
    self 1, self 2, FFN 1, FFN 2.  With ``rotary_pe`` the geometric code is
    applied inside attention; otherwise positional embeddings are added to
    q/k.  ``seq*_sem_pos`` are always added to q/k.  AdaLN modulates the
    attention inputs and FFN inputs when ``use_adaln``.
    """

    d_model: int = 256
    dropout: float = 0.1
    n_heads: int = 8
    pre_norm: bool = False
    self_attention1: bool = True
    self_attention2: bool = True
    cross_attention1: bool = True
    cross_attention2: bool = True
    apply_ffn: bool = True
    slot_attention12: bool = False
    slot_attention21: bool = False
    rotary_pe: bool = False
    use_adaln: bool = False

    @nn.compact
    def __call__(
        self,
        seq1: jax.Array,
        seq2: jax.Array,
        *,
        seq1_key_padding_mask: Optional[jax.Array] = None,
        seq2_key_padding_mask: Optional[jax.Array] = None,
        seq1_pos: Optional[jax.Array] = None,
        seq2_pos: Optional[jax.Array] = None,
        seq1_sem_pos: Optional[jax.Array] = None,
        seq2_sem_pos: Optional[jax.Array] = None,
        ada_sgnl: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        rot = self.rotary_pe

        def adaln(x, layer: Optional[AdaLN]):
            if layer is not None and ada_sgnl is not None:
                return layer(x, ada_sgnl)
            return x

        def drop(x):
            return nn.Dropout(self.dropout, deterministic=deterministic)(x)

        # q/k/v construction mirrors layers.py:123-132 (pre_norm=False path:
        # no norm applied before attention).
        q1 = k1 = v1 = seq1
        q2 = k2 = v2 = seq2
        if not rot:
            q1 = k1 = _maybe_add(seq1, seq1_pos)
            q2 = k2 = _maybe_add(seq2, seq2_pos)
        q1 = _maybe_add(q1, seq1_sem_pos)
        k1 = _maybe_add(k1, seq1_sem_pos)
        q2 = _maybe_add(q2, seq2_sem_pos)
        k2 = _maybe_add(k2, seq2_sem_pos)

        if self.cross_attention1:
            ada_12 = AdaLN(self.d_model, name="adaln_12") if self.use_adaln else None
            out = MultiheadAttention(
                self.d_model, self.n_heads, dropout=self.dropout,
                slot_competition=self.slot_attention12, name="cross_12",
            )(
                adaln(q1, ada_12), k2, v2,
                q_pe=seq1_pos if rot else None,
                k_pe=seq2_pos if rot else None,
                key_padding_mask=seq2_key_padding_mask,
                deterministic=deterministic,
            )
            seq1 = nn.LayerNorm(epsilon=LN_EPS, name="norm_12")(seq1 + drop(out))

        if self.cross_attention2:
            ada_21 = AdaLN(self.d_model, name="adaln_21") if self.use_adaln else None
            out = MultiheadAttention(
                self.d_model, self.n_heads, dropout=self.dropout,
                slot_competition=self.slot_attention21, name="cross_21",
            )(
                adaln(q2, ada_21), k1, v1,
                q_pe=seq2_pos if rot else None,
                k_pe=seq1_pos if rot else None,
                key_padding_mask=seq1_key_padding_mask,
                deterministic=deterministic,
            )
            seq2 = nn.LayerNorm(epsilon=LN_EPS, name="norm_21")(seq2 + drop(out))

        if self.self_attention1:
            ada_1 = AdaLN(self.d_model, name="adaln_1") if self.use_adaln else None
            q1 = k1 = v1 = seq1
            if not rot:
                q1 = k1 = _maybe_add(seq1, seq1_pos)
            q1 = _maybe_add(q1, seq1_sem_pos)
            k1 = _maybe_add(k1, seq1_sem_pos)
            out = MultiheadAttention(
                self.d_model, self.n_heads, dropout=self.dropout, name="sa1",
            )(
                adaln(q1, ada_1), adaln(k1, ada_1), adaln(v1, ada_1),
                q_pe=seq1_pos if rot else None,
                k_pe=seq1_pos if rot else None,
                key_padding_mask=seq1_key_padding_mask,
                deterministic=deterministic,
            )
            seq1 = nn.LayerNorm(epsilon=LN_EPS, name="norm_1")(seq1 + drop(out))

        if self.self_attention2:
            ada_2 = AdaLN(self.d_model, name="adaln_2") if self.use_adaln else None
            q2 = k2 = v2 = seq2
            if not rot:
                q2 = k2 = _maybe_add(seq2, seq2_pos)
            q2 = _maybe_add(q2, seq2_sem_pos)
            k2 = _maybe_add(k2, seq2_sem_pos)
            out = MultiheadAttention(
                self.d_model, self.n_heads, dropout=self.dropout, name="sa2",
            )(
                adaln(q2, ada_2), adaln(k2, ada_2), adaln(v2, ada_2),
                q_pe=seq2_pos if rot else None,
                k_pe=seq2_pos if rot else None,
                key_padding_mask=seq2_key_padding_mask,
                deterministic=deterministic,
            )
            seq2 = nn.LayerNorm(epsilon=LN_EPS, name="norm_2")(seq2 + drop(out))

        if (self.self_attention1 or self.cross_attention1) and self.apply_ffn:
            ada_ff1 = AdaLN(self.d_model, name="adaln_ff1") if self.use_adaln else None
            seq1 = adaln(seq1, ada_ff1)
            xavier = nn.initializers.xavier_uniform()
            h = nn.Dense(4 * self.d_model, kernel_init=xavier, name="ffn_12_fc1")(seq1)
            h = drop(nn.relu(h))
            h = drop(nn.Dense(self.d_model, kernel_init=xavier, name="ffn_12_fc2")(h))
            seq1 = nn.LayerNorm(epsilon=LN_EPS, name="norm_122")(seq1 + h)

        if (self.self_attention2 or self.cross_attention2) and self.apply_ffn:
            ada_ff2 = AdaLN(self.d_model, name="adaln_ff2") if self.use_adaln else None
            seq2 = adaln(seq2, ada_ff2)
            xavier = nn.initializers.xavier_uniform()
            h = nn.Dense(4 * self.d_model, kernel_init=xavier, name="ffn_21_fc1")(seq2)
            h = drop(nn.relu(h))
            h = drop(nn.Dense(self.d_model, kernel_init=xavier, name="ffn_21_fc2")(h))
            seq2 = nn.LayerNorm(epsilon=LN_EPS, name="norm_212")(seq2 + h)

        return seq1, seq2


class ParallelAttention(nn.Module):
    """Stack of :class:`ParallelAttentionLayer` (layers.py:221-270)."""

    num_layers: int = 1
    d_model: int = 256
    dropout: float = 0.1
    n_heads: int = 8
    pre_norm: bool = False
    self_attention1: bool = True
    self_attention2: bool = True
    cross_attention1: bool = True
    cross_attention2: bool = True
    apply_ffn: bool = True
    slot_attention12: bool = False
    slot_attention21: bool = False
    rotary_pe: bool = False
    use_adaln: bool = False

    @nn.compact
    def __call__(
        self,
        seq1: jax.Array,
        seq2: jax.Array,
        *,
        seq1_key_padding_mask: Optional[jax.Array] = None,
        seq2_key_padding_mask: Optional[jax.Array] = None,
        seq1_pos: Optional[jax.Array] = None,
        seq2_pos: Optional[jax.Array] = None,
        seq1_sem_pos: Optional[jax.Array] = None,
        seq2_sem_pos: Optional[jax.Array] = None,
        ada_sgnl: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        update_seq1 = self.self_attention1 or self.cross_attention1
        update_seq2 = self.self_attention2 or self.cross_attention2
        for i in range(self.num_layers):
            s1, s2 = ParallelAttentionLayer(
                d_model=self.d_model,
                dropout=self.dropout,
                n_heads=self.n_heads,
                pre_norm=self.pre_norm,
                self_attention1=self.self_attention1,
                self_attention2=self.self_attention2,
                cross_attention1=self.cross_attention1,
                cross_attention2=self.cross_attention2,
                apply_ffn=self.apply_ffn,
                slot_attention12=self.slot_attention12,
                slot_attention21=self.slot_attention21,
                rotary_pe=self.rotary_pe,
                use_adaln=self.use_adaln,
                name=f"layer_{i}",
            )(
                seq1,
                seq2,
                seq1_key_padding_mask=seq1_key_padding_mask,
                seq2_key_padding_mask=seq2_key_padding_mask,
                seq1_pos=seq1_pos,
                seq2_pos=seq2_pos,
                seq1_sem_pos=seq1_sem_pos,
                seq2_sem_pos=seq2_sem_pos,
                ada_sgnl=ada_sgnl,
                deterministic=deterministic,
            )
            if update_seq1:
                seq1 = s1
            if update_seq2:
                seq2 = s2
        return seq1, seq2
