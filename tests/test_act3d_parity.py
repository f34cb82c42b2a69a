"""Golden parity: full Act3D forward vs an independent torch double.

End-to-end: CLIP-RN50 backbone → FPN → pyramid tokens → ghost/query
relative cross-attention (rotary) → mask decode → argmax position →
rotation/gripper head — with ghost points injected on both sides
(``ghost_points_override``) so the stochastic sampler drops out of the
comparison (the same protocol convert/parity.py uses for real checkpoints).

Config: production RN50 trunk, image 128², 2 pyramid levels, emb 24,
instruction conditioning, weight tying — reference semantics per
model/keypose_optimization/act3d.py:176-535.
"""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from act3d_tpu.convert.torch_to_jax import _Mapper
from act3d_tpu.models.act3d import Act3D
from act3d_tpu.nn.resnet import CLIP_MEAN, CLIP_STD
from act3d_tpu.ops.rotary import rotary_pe_3d

from tests.test_backbone_parity import TorchClipResNet, _randomize_bn_stats
from tests.test_parallel_attention_parity import TorchRotaryMHA, torch_embed_rotary

DIM = 24
HEADS = 4
LEVELS = 2
N_GHOST = 24  # per level
BOUNDS = np.array([[-0.5, -0.5, 0.5], [0.5, 0.5, 1.5]], np.float32)


def rotary3d_torch(xyz):
    return torch.tensor(np.asarray(rotary_pe_3d(xyz.numpy(), DIM)))


class TorchRCALayer(nn.Module):
    """RelativeCrossAttentionLayer + FeedforwardLayer (layers.py:293-351)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.attn = TorchRotaryMHA(dim, heads)
        self.norm_attn = nn.LayerNorm(dim)
        self.linear1 = nn.Linear(dim, dim)
        self.linear2 = nn.Linear(dim, dim)
        self.norm_ffw = nn.LayerNorm(dim)

    def forward(self, q, v, q_pe=None, v_pe=None):
        out = self.attn(q, v, v, q_pe, v_pe)
        q = self.norm_attn(q + out)
        h = self.linear2(torch.relu(self.linear1(q)))
        return self.norm_ffw(q + h)


class TorchRCAModule(nn.Module):
    def __init__(self, dim, heads, n_layers):
        super().__init__()
        self.layers = nn.ModuleList(
            [TorchRCALayer(dim, heads) for _ in range(n_layers)]
        )

    def forward(self, q, v, q_pe=None, v_pe=None):
        outs = []
        for layer in self.layers:
            q = layer(q, v, q_pe, v_pe)
            outs.append(q)
        return outs


class TorchFPN(nn.Module):
    def __init__(self, chans, out_ch):
        super().__init__()
        self.names = list(chans)
        self.inner = nn.ModuleDict(
            {k: nn.Conv2d(c, out_ch, 1) for k, c in chans.items()}
        )
        self.layer = nn.ModuleDict(
            {k: nn.Conv2d(out_ch, out_ch, 3, padding=1) for k in chans}
        )

    def forward(self, feats):
        last = self.inner[self.names[-1]](feats[self.names[-1]])
        out = {self.names[-1]: self.layer[self.names[-1]](last)}
        for k in reversed(self.names[:-1]):
            lat = self.inner[k](feats[k])
            last = lat + torch.nn.functional.interpolate(
                last, size=lat.shape[-2:], mode="nearest"
            )
            out[k] = self.layer[k](last)
        return out


class TorchAct3D(nn.Module):
    """Act3D double (128² image: pyramid res2/res1, downscale 4/2)."""

    def __init__(self):
        super().__init__()
        self.backbone = TorchClipResNet(layers=(3, 4, 6, 3), width=64)
        self.fpn = TorchFPN(
            {"res1": 64, "res2": 256, "res3": 512, "res4": 1024, "res5": 2048},
            DIM,
        )
        self.instruction_encoder = nn.Linear(512, DIM)
        self.ghost_embed = nn.Parameter(torch.randn(1, DIM))
        self.gripper_embed = nn.Parameter(torch.randn(1, DIM))
        self.query_embed = nn.Parameter(torch.randn(1, DIM))
        self.ghost_attn = TorchRCAModule(DIM, HEADS, 2)  # weight-tied
        self.query_attn = TorchRCAModule(DIM, HEADS, 2)
        self.vis_ins_attn = TorchRCAModule(DIM, HEADS, 2)
        self.head_fc1 = nn.Linear(DIM, DIM)
        self.head_fc2 = nn.Linear(DIM, 5)  # quat 4 + gripper 1

    def forward(self, rgb, pcd, instr, gripper, ghost_levels):
        B, ncam, _, H, W = rgb.shape
        mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
        x = (rgb.reshape(B * ncam, 3, H, W) - mean) / std
        feats = self.fpn(self.backbone(x))

        def tokens(level_key, downscale):
            f = feats[level_key]  # (B*ncam, DIM, h, w)
            h, w = f.shape[-2:]
            f = f.reshape(B, ncam, DIM, h, w).permute(0, 1, 3, 4, 2)
            f = f.reshape(B, ncam * h * w, DIM)
            p = torch.nn.functional.interpolate(
                pcd.reshape(B * ncam, 3, H, W),
                scale_factor=1.0 / downscale, mode="bilinear",
            )
            p = p.reshape(B, ncam, 3, h, w).permute(0, 1, 3, 4, 2)
            return f, p.reshape(B, ncam * h * w, 3)

        level_feats = [tokens("res2", 4), tokens("res1", 2)]
        instr_feats = self.instruction_encoder(instr)
        instr_pe = rotary3d_torch(torch.zeros(B, instr.shape[1], 3))
        grip_pe = rotary3d_torch(gripper[:, None, :3])
        grip_feats = self.gripper_embed.expand(B, -1).unsqueeze(1)

        query = self.query_embed.expand(B, -1).unsqueeze(1)
        positions = []
        for i in range(LEVELS):
            ghost = ghost_levels[i]
            feats_i, xyz_i = level_feats[i]
            if i > 0:
                d2 = ((positions[-1][:, None] - xyz_i) ** 2).sum(-1)
                k = 32 * 32 * ncam
                idx = torch.topk(d2, k, largest=False).indices
                feats_i = torch.stack([f[j] for f, j in zip(feats_i, idx)])
                xyz_i = torch.stack([p[j] for p, j in zip(xyz_i, idx)])
            ctx = torch.cat([feats_i, grip_feats], dim=1)
            ctx_pe = torch.cat(
                [rotary3d_torch(xyz_i), grip_pe], dim=1
            )
            ctx = self.vis_ins_attn(ctx, instr_feats)[-1]
            ctx = torch.cat([ctx, instr_feats], dim=1)
            ctx_pe = torch.cat([ctx_pe, instr_pe], dim=1)

            ghost_pe = rotary3d_torch(ghost)
            gfeats = self.ghost_embed.expand(B * N_GHOST, -1).reshape(
                B, N_GHOST, DIM
            )
            gfeats = self.ghost_attn(gfeats, ctx, ghost_pe, ctx_pe)[-1]

            if i == 0:
                q_outs = self.query_attn(query, ctx, None, None)
            else:
                q_pe = rotary3d_torch(positions[-1][:, None])
                q_outs = self.query_attn(query, ctx, q_pe, ctx_pe)
            query = q_outs[-1]

            mask = torch.einsum("bc,bnc->bn", q_outs[-1][:, 0], gfeats)
            top = mask.argmax(-1)
            positions.append(
                torch.stack([g[t] for g, t in zip(ghost, top)])
            )

        pred = self.head_fc2(torch.relu(self.head_fc1(query[:, 0])))
        quat = pred[:, :4] / pred[:, :4].norm(dim=-1, keepdim=True).clamp(1e-10)
        grip_open = torch.sigmoid(pred[:, 4:])
        return positions[-1], quat, grip_open, positions


def _convert(t_model, flax_params):
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}

    def rename_rcam(src, dst):
        for k in list(sd):
            if k.startswith(src + "."):
                parts = k[len(src) + 1 :].split(".")
                j, module, rest = parts[0], parts[1], ".".join(parts[2:])
                if module == "attn":
                    new = f"{dst}.attn_layers.{j}.multihead_attn.{rest}"
                elif module == "norm_attn":
                    new = f"{dst}.attn_layers.{j}.norm.{rest}"
                elif module in ("linear1", "linear2"):
                    new = f"{dst}.ffw_layers.{j}.{module}.{rest}"
                elif module == "norm_ffw":
                    new = f"{dst}.ffw_layers.{j}.norm.{rest}"
                else:
                    raise KeyError(module)
                sd[new] = sd.pop(k)

    rename_rcam("ghost_attn.layers", "ghost_point_cross_attn_pyramid.0")
    rename_rcam("query_attn.layers", "query_cross_attn_pyramid.0")
    rename_rcam("vis_ins_attn.layers", "vis_ins_attn_pyramid.0")
    # fpn naming: inner.res1.weight -> inner_blocks.0.weight etc
    names = ["res1", "res2", "res3", "res4", "res5"]
    for i, n in enumerate(names):
        for which, dst in (("inner", "inner_blocks"), ("layer", "layer_blocks")):
            for suffix in ("weight", "bias"):
                sd[f"feature_pyramid.{dst}.{i}.{suffix}"] = sd.pop(
                    f"fpn.{which}.{n}.{suffix}"
                )
    sd["ghost_points_embed_pyramid.0.weight"] = sd.pop("ghost_embed")
    sd["ghost_points_embed_pyramid.1.weight"] = sd["ghost_points_embed_pyramid.0.weight"]
    sd["curr_gripper_embed.weight"] = sd.pop("gripper_embed")
    sd["query_embed.weight"] = sd.pop("query_embed")
    sd["gripper_state_predictor.0.weight"] = sd.pop("head_fc1.weight")
    sd["gripper_state_predictor.0.bias"] = sd.pop("head_fc1.bias")
    sd["gripper_state_predictor.2.weight"] = sd.pop("head_fc2.weight")
    sd["gripper_state_predictor.2.bias"] = sd.pop("head_fc2.bias")

    from act3d_tpu.convert.torch_to_jax import convert_act3d

    return convert_act3d(
        sd, flax_params,
        num_sampling_level=LEVELS, weight_tying=True, gp_emb_tying=True,
        use_instruction=True,
    )


def test_act3d_full_parity(rng):
    torch.manual_seed(1)
    t_model = TorchAct3D()
    _randomize_bn_stats(t_model.backbone, rng)
    t_model.eval()

    B, ncam, H = 1, 1, 128
    rgb = rng.uniform(0, 1, (B, ncam, 3, H, H)).astype(np.float32)
    pcd = rng.uniform(-0.4, 1.4, (B, ncam, 3, H, H)).astype(np.float32)
    instr = rng.normal(size=(B, 53, 512)).astype(np.float32)
    gripper = rng.uniform(0, 1, (B, 8)).astype(np.float32)
    ghost_levels = [
        (BOUNDS[0] + rng.uniform(0, 1, (B, N_GHOST, 3)) * (BOUNDS[1] - BOUNDS[0])).astype(np.float32)
        for _ in range(LEVELS)
    ]

    with torch.no_grad():
        t_pos, t_quat, t_grip, _ = t_model(
            torch.tensor(rgb), torch.tensor(pcd), torch.tensor(instr),
            torch.tensor(gripper), [torch.tensor(g) for g in ghost_levels],
        )

    model = Act3D(
        image_size=(H, H), embedding_dim=DIM, num_attn_heads=HEADS,
        gripper_loc_bounds=tuple(map(tuple, BOUNDS)),
        num_ghost_points=N_GHOST * LEVELS, num_ghost_points_val=N_GHOST * LEVELS,
        num_sampling_level=LEVELS, use_instruction=True,
    )
    variables = model.init(
        jax.random.PRNGKey(0), rgb, pcd, instr, gripper,
        sample_rng=jax.random.PRNGKey(1),
        ghost_points_override=[jnp.asarray(g) for g in ghost_levels],
    )
    converted = _convert(t_model, variables["params"])

    out = model.apply(
        {"params": converted}, rgb, pcd, instr, gripper,
        sample_rng=jax.random.PRNGKey(2),
        ghost_points_override=[jnp.asarray(g) for g in ghost_levels],
    )
    np.testing.assert_allclose(
        np.asarray(out["position"]), t_pos.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["rotation"]), t_quat.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["gripper"]), t_grip.numpy(), atol=1e-3
    )
