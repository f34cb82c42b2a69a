"""Shared torch building blocks for the fake reference models.

Torch-only (no jax / no act3d_tpu imports — the golden_runner subprocess
must run on a bare torch machine).  Module attribute names are chosen so
``state_dict()`` keys match the reference checkpoint layout consumed by
``act3d_tpu/convert/torch_to_jax.py``; forward math mirrors the repo's
golden-tested doubles (see tests/fake_reference/README.md).
"""

from __future__ import annotations

import math
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


# ---------------------------------------------------------------------------
# positional encodings (reference model/utils/position_encodings.py:7-97)
# ---------------------------------------------------------------------------


def _duplicate_interleave(x):
    return torch.stack([x, x], dim=-1).reshape(x.shape[:-1] + (2 * x.shape[-1],))


def rotary_pe_3d(xyz, feature_dim):
    """(..., N, 3) -> (..., N, F, 2) stacked (cos, sin) code."""
    d_axis = feature_dim // 3
    div_term = torch.exp(
        torch.arange(0, d_axis, 2, dtype=torch.float32)
        * (-math.log(10000.0) / d_axis)
    )
    pos = xyz.float()[..., None]
    angles = pos * div_term
    sin = _duplicate_interleave(torch.sin(angles))
    cos = _duplicate_interleave(torch.cos(angles))
    cos_pos = cos.reshape(cos.shape[:-2] + (3 * d_axis,))
    sin_pos = sin.reshape(sin.shape[:-2] + (3 * d_axis,))
    return torch.stack([cos_pos, sin_pos], dim=-1)


def embed_rotary(x, code):
    cos, sin = code[..., 0], code[..., 1]
    x2 = torch.stack([-x[..., 1::2], x[..., ::2]], dim=-1).reshape(x.shape)
    return x * cos + x2 * sin


def sinusoidal_pos_emb(x, dim):
    half = dim // 2
    scale = math.log(10000.0) / (half - 1)
    freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -scale)
    ang = x.float()[..., None] * freqs
    return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)


# ---------------------------------------------------------------------------
# rotation math (reference model/utils/utils.py:51-139)
# ---------------------------------------------------------------------------


def normalise_quat(q):
    return q / q.norm(dim=-1, keepdim=True).clamp(min=1e-10)


def quaternion_to_matrix(q):
    r, i, j, k = torch.unbind(q, -1)
    two_s = 2.0 / (q * q).sum(-1)
    o = torch.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        dim=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def ortho6d_from_rotation_matrix(m):
    return torch.cat([m[..., :, 0], m[..., :, 1]], dim=-1)


# ---------------------------------------------------------------------------
# attention primitives
# ---------------------------------------------------------------------------


class RotaryMHA(nn.Module):
    """nn.MultiheadAttention state-dict layout + reference rotary semantics
    (multihead_custom_attention.py:348-415): scale q, rotary on full-dim
    q/k, per-head softmax attention."""

    def __init__(self, embed_dim, num_heads):
        super().__init__()
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.in_proj_weight = nn.Parameter(
            torch.randn(3 * embed_dim, embed_dim) * 0.2
        )
        self.in_proj_bias = nn.Parameter(torch.randn(3 * embed_dim) * 0.1)
        self.out_proj = nn.Linear(embed_dim, embed_dim)

    def forward(self, q_in, k_in, v_in, q_pe=None, k_pe=None):
        e, h = self.embed_dim, self.num_heads
        d = e // h
        q = F.linear(q_in, self.in_proj_weight[:e], self.in_proj_bias[:e]) * (
            d**-0.5
        )
        k = F.linear(k_in, self.in_proj_weight[e : 2 * e], self.in_proj_bias[e : 2 * e])
        v = F.linear(v_in, self.in_proj_weight[2 * e :], self.in_proj_bias[2 * e :])
        if q_pe is not None:
            q = embed_rotary(q, q_pe)
        if k_pe is not None:
            k = embed_rotary(k, k_pe)
        b, l, _ = q.shape
        s = k.shape[1]
        q = q.view(b, l, h, d).transpose(1, 2)
        k = k.view(b, s, h, d).transpose(1, 2)
        v = v.view(b, s, h, d).transpose(1, 2)
        w = torch.softmax(q @ k.transpose(-1, -2), dim=-1)
        out = (w @ v).transpose(1, 2).reshape(b, l, e)
        return self.out_proj(out)


class AdaLN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.modulation = nn.Sequential(nn.SiLU(), nn.Linear(dim, 2 * dim))

    def forward(self, x, t):
        scale, shift = self.modulation(t).chunk(2, dim=-1)
        return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class ParallelAttentionLayer(nn.Module):
    """Reference-named ParallelAttentionLayer (layers.py:7-218) with the
    blocks this project's configs use (seq2 updates off)."""

    def __init__(self, dim, heads, self1, cross1, ffn, rotary, adaln):
        super().__init__()
        self.has_self1, self.has_cross1, self.has_ffn = self1, cross1, ffn
        self.rotary, self.use_adaln = rotary, adaln
        if cross1:
            self.cross_12 = RotaryMHA(dim, heads)
            self.norm_12 = nn.LayerNorm(dim)
            if adaln:
                self.adaln_12 = AdaLN(dim)
        if self1:
            self.sa1 = RotaryMHA(dim, heads)
            self.norm_1 = nn.LayerNorm(dim)
            if adaln:
                self.adaln_1 = AdaLN(dim)
        if ffn and (self1 or cross1):
            self.ffn_12 = nn.Sequential(
                nn.Linear(dim, 4 * dim), nn.ReLU(), nn.Dropout(0.0),
                nn.Linear(4 * dim, dim),
            )
            self.norm_122 = nn.LayerNorm(dim)
            if adaln:
                self.adaln_ff1 = AdaLN(dim)

    def _ada(self, name, x, t):
        if self.use_adaln and t is not None and hasattr(self, name):
            return getattr(self, name)(x, t)
        return x

    def forward(self, seq1, seq2, seq1_pos=None, seq2_pos=None,
                sem_pos=None, t=None):
        def add(x, p):
            return x if p is None else x + p

        if self.has_cross1:
            q1 = seq1 if self.rotary else add(seq1, seq1_pos)
            k2 = seq2 if self.rotary else add(seq2, seq2_pos)
            q1 = add(q1, sem_pos)
            out = self.cross_12(
                self._ada("adaln_12", q1, t), k2, seq2,
                seq1_pos if self.rotary else None,
                seq2_pos if self.rotary else None,
            )
            seq1 = self.norm_12(seq1 + out)
        if self.has_self1:
            q1 = k1 = seq1 if self.rotary else add(seq1, seq1_pos)
            v1 = seq1
            q1, k1 = add(q1, sem_pos), add(k1, sem_pos)
            out = self.sa1(
                self._ada("adaln_1", q1, t), self._ada("adaln_1", k1, t),
                self._ada("adaln_1", v1, t),
                seq1_pos if self.rotary else None,
                seq1_pos if self.rotary else None,
            )
            seq1 = self.norm_1(seq1 + out)
        if self.has_ffn and (self.has_self1 or self.has_cross1):
            seq1 = self._ada("adaln_ff1", seq1, t)
            seq1 = self.norm_122(seq1 + self.ffn_12(seq1))
        return seq1


class ParallelAttention(nn.Module):
    """Stack of ParallelAttentionLayers under `.layers` (reference naming)."""

    def __init__(self, num_layers, dim, heads, self1, cross1, ffn, rotary, adaln):
        super().__init__()
        self.layers = nn.ModuleList(
            [
                ParallelAttentionLayer(dim, heads, self1, cross1, ffn, rotary, adaln)
                for _ in range(num_layers)
            ]
        )

    def forward(self, seq1, seq2, seq1_pos=None, seq2_pos=None,
                sem_pos=None, t=None):
        for layer in self.layers:
            seq1 = layer(seq1, seq2, seq1_pos, seq2_pos, sem_pos, t)
        return seq1


class _RCAAttnLayer(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.multihead_attn = RotaryMHA(dim, heads)
        self.norm = nn.LayerNorm(dim)

    def forward(self, q, v, q_pe, v_pe):
        return self.norm(q + self.multihead_attn(q, v, v, q_pe, v_pe))


class _RCAFFWLayer(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear1 = nn.Linear(dim, dim)
        self.linear2 = nn.Linear(dim, dim)
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        return self.norm(x + self.linear2(torch.relu(self.linear1(x))))


class RelativeCrossAttentionModule(nn.Module):
    """attn_layers / ffw_layers naming of the reference (layers.py:335-351);
    returns all per-layer outputs."""

    def __init__(self, dim, heads, num_layers):
        super().__init__()
        self.attn_layers = nn.ModuleList(
            [_RCAAttnLayer(dim, heads) for _ in range(num_layers)]
        )
        self.ffw_layers = nn.ModuleList(
            [_RCAFFWLayer(dim) for _ in range(num_layers)]
        )

    def forward(self, q, v, q_pe=None, v_pe=None):
        outs = []
        for attn, ffw in zip(self.attn_layers, self.ffw_layers):
            q = ffw(attn(q, v, q_pe, v_pe))
            outs.append(q)
        return outs


# ---------------------------------------------------------------------------
# visual trunk: CLIP ModifiedResNet + FPN (reference clip.py:9-43 + torchvision)
# ---------------------------------------------------------------------------


class ClipBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                OrderedDict(
                    [
                        ("-1", nn.AvgPool2d(stride) if stride > 1 else nn.Identity()),
                        ("0", nn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                        ("1", nn.BatchNorm2d(planes * 4)),
                    ]
                )
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ClipResNet(nn.Module):
    """CLIP RN50 trunk emitting the res1..res5 feature dict."""

    def __init__(self, layers=(3, 4, 6, 3), width=64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU(inplace=True)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0], 1)
        self.layer2 = self._make_layer(width * 2, layers[1], 2)
        self.layer3 = self._make_layer(width * 4, layers[2], 2)
        self.layer4 = self._make_layer(width * 8, layers[3], 2)

    def _make_layer(self, planes, blocks, stride):
        mods = [ClipBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            mods.append(ClipBottleneck(self._inplanes, planes))
        return nn.Sequential(*mods)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x0 = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x0)
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        return {"res1": x0, "res2": x1, "res3": x2, "res4": x3, "res5": x4}


class FeaturePyramidNetwork(nn.Module):
    """torchvision FPN layout: inner_blocks.N / layer_blocks.N ModuleLists."""

    NAMES = ["res1", "res2", "res3", "res4", "res5"]
    CHANS = [64, 256, 512, 1024, 2048]

    def __init__(self, out_channels):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Conv2d(c, out_channels, 1) for c in self.CHANS]
        )
        self.layer_blocks = nn.ModuleList(
            [nn.Conv2d(out_channels, out_channels, 3, padding=1) for _ in self.CHANS]
        )

    def forward(self, feats):
        last = self.inner_blocks[-1](feats[self.NAMES[-1]])
        out = {self.NAMES[-1]: self.layer_blocks[-1](last)}
        for i in range(len(self.NAMES) - 2, -1, -1):
            lat = self.inner_blocks[i](feats[self.NAMES[i]])
            last = lat + F.interpolate(last, size=lat.shape[-2:], mode="nearest")
            out[self.NAMES[i]] = self.layer_blocks[i](last)
        return out


def pyramid_layout(image_size):
    """(feature_map_pyramid, downscale_pyramid) — reference encoder.py:40-53."""
    if tuple(image_size) == (128, 128):
        return ["res2", "res1", "res1", "res1"], [4, 2, 2, 2]
    if tuple(image_size) == (256, 256):
        return ["res3", "res1", "res1", "res1"], [8, 2, 2, 2]
    raise ValueError(f"unsupported image size {image_size}")


def clip_normalize(rgb_flat):
    """(B*, 3, H, W) in [0,1] -> CLIP-normalised."""
    mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
    return (rgb_flat - mean) / std
