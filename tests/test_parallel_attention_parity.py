"""Golden parity: flax ParallelAttentionLayer vs a torch double.

The torch double reimplements the reference layer's exact op order
(reference model/utils/layers.py:7-218: cross12 → self1 → FFN with
post-norm, AdaLN on attention inputs and FFN input, rotary PE applied to
q/k inside attention) using public torch modules, then weights are
converted with act3d_tpu.convert and outputs compared.

This pins the riskiest wiring in the diffusion head: rotary + AdaLN +
residual/norm placement.
"""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from act3d_tpu.convert.torch_to_jax import _Mapper
from act3d_tpu.nn.layers import ParallelAttentionLayer
from act3d_tpu.ops.rotary import rotary_pe_3d


def torch_embed_rotary(x, code):
    """x: (B, N, E); code: (B, N, E, 2) -> same math as ops.rotary."""
    cos, sin = code[..., 0], code[..., 1]
    x2 = torch.stack([-x[..., 1::2], x[..., ::2]], dim=-1).reshape(x.shape)
    return x * cos + x2 * sin


class TorchRotaryMHA(nn.Module):
    """Matches the reference MultiheadCustomAttention semantics: scale q,
    apply rotary to full-dim q/k, multi-head softmax attention."""

    def __init__(self, embed_dim, num_heads):
        super().__init__()
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.in_proj_weight = nn.Parameter(torch.randn(3 * embed_dim, embed_dim) * 0.2)
        self.in_proj_bias = nn.Parameter(torch.randn(3 * embed_dim) * 0.1)
        self.out_proj = nn.Linear(embed_dim, embed_dim)

    def forward(self, q_in, k_in, v_in, q_pe=None, k_pe=None):
        e, h = self.embed_dim, self.num_heads
        d = e // h
        q = torch.nn.functional.linear(
            q_in, self.in_proj_weight[:e], self.in_proj_bias[:e]
        ) * (d ** -0.5)
        k = torch.nn.functional.linear(
            k_in, self.in_proj_weight[e:2 * e], self.in_proj_bias[e:2 * e]
        )
        v = torch.nn.functional.linear(
            v_in, self.in_proj_weight[2 * e:], self.in_proj_bias[2 * e:]
        )
        if q_pe is not None:
            q = torch_embed_rotary(q, q_pe)
        if k_pe is not None:
            k = torch_embed_rotary(k, k_pe)
        b, l, _ = q.shape
        s = k.shape[1]
        q = q.view(b, l, h, d).transpose(1, 2)
        k = k.view(b, s, h, d).transpose(1, 2)
        v = v.view(b, s, h, d).transpose(1, 2)
        w = torch.softmax(q @ k.transpose(-1, -2), dim=-1)
        out = (w @ v).transpose(1, 2).reshape(b, l, e)
        return self.out_proj(out)


class TorchAdaLN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.modulation = nn.Sequential(nn.SiLU(), nn.Linear(dim, 2 * dim))

    def forward(self, x, t):
        scale, shift = self.modulation(t).chunk(2, dim=-1)
        return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class TorchParallelLayer(nn.Module):
    """cross12 + self1 + FFN1 with rotary + AdaLN (post-norm), matching
    layers.py:115-218 with self_attention2/cross_attention2 off."""

    def __init__(self, dim, heads):
        super().__init__()
        self.cross_12 = TorchRotaryMHA(dim, heads)
        self.norm_12 = nn.LayerNorm(dim)
        self.adaln_12 = TorchAdaLN(dim)
        self.sa1 = TorchRotaryMHA(dim, heads)
        self.norm_1 = nn.LayerNorm(dim)
        self.adaln_1 = TorchAdaLN(dim)
        self.ffn_fc1 = nn.Linear(dim, 4 * dim)
        self.ffn_fc2 = nn.Linear(4 * dim, dim)
        self.norm_122 = nn.LayerNorm(dim)
        self.adaln_ff1 = TorchAdaLN(dim)

    def forward(self, seq1, seq2, seq1_pos, seq2_pos, sem_pos, t):
        q1 = seq1 + sem_pos
        out = self.cross_12(self.adaln_12(q1, t), seq2, seq2, seq1_pos, seq2_pos)
        seq1 = self.norm_12(seq1 + out)

        q1 = k1 = seq1 + sem_pos
        v1 = seq1
        out = self.sa1(
            self.adaln_1(q1, t), self.adaln_1(k1, t), self.adaln_1(v1, t),
            seq1_pos, seq1_pos,
        )
        seq1 = self.norm_1(seq1 + out)

        seq1 = self.adaln_ff1(seq1, t)
        h = self.ffn_fc2(torch.relu(self.ffn_fc1(seq1)))
        return self.norm_122(seq1 + h)


def test_parallel_attention_layer_parity(rng):
    # dim must be divisible by 6 for the 3-axis rotary code (reference
    # dims 60/120 are); heads=4 gives an odd head_dim like the reference
    dim, heads, B, L, S = 36, 4, 2, 6, 10
    t_layer = TorchParallelLayer(dim, heads)
    t_layer.eval()

    seq1 = rng.normal(size=(B, L, dim)).astype(np.float32)
    seq2 = rng.normal(size=(B, S, dim)).astype(np.float32)
    xyz1 = rng.normal(size=(B, L, 3)).astype(np.float32)
    xyz2 = rng.normal(size=(B, S, 3)).astype(np.float32)
    tsig = rng.normal(size=(B, dim)).astype(np.float32)
    sem = rng.normal(size=(B, L, dim)).astype(np.float32)

    pe1 = np.asarray(rotary_pe_3d(xyz1, dim))
    pe2 = np.asarray(rotary_pe_3d(xyz2, dim))

    with torch.no_grad():
        want = t_layer(
            torch.tensor(seq1), torch.tensor(seq2),
            torch.tensor(pe1), torch.tensor(pe2),
            torch.tensor(sem), torch.tensor(tsig),
        ).numpy()

    f_layer = ParallelAttentionLayer(
        d_model=dim, n_heads=heads, dropout=0.0,
        self_attention1=True, self_attention2=False,
        cross_attention1=True, cross_attention2=False,
        rotary_pe=True, use_adaln=True,
    )
    variables = f_layer.init(
        jax.random.PRNGKey(0),
        jnp.asarray(seq1), jnp.asarray(seq2),
        seq1_pos=jnp.asarray(pe1), seq2_pos=jnp.asarray(pe2),
        seq1_sem_pos=jnp.asarray(sem), ada_sgnl=jnp.asarray(tsig),
    )

    # convert torch weights via the production mapper
    sd = {f"l.{k}": v.detach().numpy() for k, v in t_layer.state_dict().items()}
    # rename the ffn to the reference Sequential indices the mapper expects
    sd["l.ffn_12.0.weight"] = sd.pop("l.ffn_fc1.weight")
    sd["l.ffn_12.0.bias"] = sd.pop("l.ffn_fc1.bias")
    sd["l.ffn_12.3.weight"] = sd.pop("l.ffn_fc2.weight")
    sd["l.ffn_12.3.bias"] = sd.pop("l.ffn_fc2.bias")
    m = _Mapper(sd, {"l": variables["params"]})
    m.parallel_attention_layer("l", "l")
    converted = m.finish()

    got = f_layer.apply(
        {"params": converted["l"]},
        jnp.asarray(seq1), jnp.asarray(seq2),
        seq1_pos=jnp.asarray(pe1), seq2_pos=jnp.asarray(pe2),
        seq1_sem_pos=jnp.asarray(sem), ada_sgnl=jnp.asarray(tsig),
    )[0]
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-3)
