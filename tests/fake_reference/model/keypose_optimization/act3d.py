"""Fake-reference Act3D: reference constructor / state-dict layout /
forward semantics, torch only (see tests/fake_reference/README.md).

State-dict keys match what ``convert_act3d`` consumes (the reference
checkpoint layout): backbone.*, feature_pyramid.{inner,layer}_blocks.N,
ghost_points_embed_pyramid.N.weight, curr_gripper_embed.weight,
query_embed.weight, {ghost_point,query}_cross_attn_pyramid.N.attn_layers/
ffw_layers, vis_ins_attn_pyramid.N, instruction_encoder,
gripper_state_predictor.0/2.

``_sample_ghost_points(total_timesteps, device, level, anchor=None)`` is
the patch point the golden-request runner overrides with the packet's
fixed probe points.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from model._torch_blocks import (
    ClipResNet,
    FeaturePyramidNetwork,
    RelativeCrossAttentionModule,
    clip_normalize,
    normalise_quat,
    pyramid_layout,
    rotary_pe_3d,
)


class Act3D(nn.Module):
    def __init__(
        self,
        backbone="clip",
        image_size=(256, 256),
        embedding_dim=60,
        num_attn_heads=4,
        num_ghost_point_cross_attn_layers=2,
        num_query_cross_attn_layers=2,
        num_vis_ins_attn_layers=2,
        rotation_parametrization="quat_from_query",
        gripper_loc_bounds=None,
        num_ghost_points=1000,
        num_ghost_points_val=10000,
        weight_tying=True,
        gp_emb_tying=True,
        num_sampling_level=3,
        fine_sampling_ball_diameter=0.16,
        regress_position_offset=False,
        use_instruction=False,
    ):
        super().__init__()
        assert backbone == "clip"
        assert rotation_parametrization == "quat_from_query"
        assert not regress_position_offset
        dim, levels = embedding_dim, num_sampling_level
        self.image_size = tuple(image_size)
        self.embedding_dim = dim
        self.num_sampling_level = levels
        self.num_ghost_points = num_ghost_points // levels
        self.num_ghost_points_val = num_ghost_points_val // levels
        self.fine_sampling_ball_diameter = fine_sampling_ball_diameter
        self.use_instruction = use_instruction
        self.gripper_loc_bounds = np.asarray(gripper_loc_bounds, np.float64)

        self.backbone = ClipResNet(layers=(3, 4, 6, 3), width=64)
        self.feature_pyramid = FeaturePyramidNetwork(dim)

        def tied_list(make):
            if weight_tying:
                mod = make()
                return nn.ModuleList([mod] * levels)
            return nn.ModuleList([make() for _ in range(levels)])

        if gp_emb_tying:
            emb = nn.Embedding(1, dim)
            self.ghost_points_embed_pyramid = nn.ModuleList([emb] * levels)
        else:
            self.ghost_points_embed_pyramid = nn.ModuleList(
                [nn.Embedding(1, dim) for _ in range(levels)]
            )
        self.curr_gripper_embed = nn.Embedding(1, dim)
        self.query_embed = nn.Embedding(1, dim)

        self.ghost_point_cross_attn_pyramid = tied_list(
            lambda: RelativeCrossAttentionModule(
                dim, num_attn_heads, num_ghost_point_cross_attn_layers
            )
        )
        self.query_cross_attn_pyramid = tied_list(
            lambda: RelativeCrossAttentionModule(
                dim, num_attn_heads, num_query_cross_attn_layers
            )
        )
        if use_instruction:
            self.vis_ins_attn_pyramid = tied_list(
                lambda: RelativeCrossAttentionModule(
                    dim, num_attn_heads, num_vis_ins_attn_layers
                )
            )
            self.instruction_encoder = nn.Linear(512, dim)

        self.gripper_state_predictor = nn.Sequential(
            nn.Linear(dim, dim), nn.ReLU(), nn.Linear(dim, 4 + 1)
        )

    # patch point for the golden-request runner (fixed probe points)
    def _sample_ghost_points(self, total_timesteps, device, level, anchor=None):
        n = self.num_ghost_points_val
        lo, hi = self.gripper_loc_bounds
        pts = np.random.uniform(lo, hi, (total_timesteps, n, 3))
        return torch.tensor(pts, dtype=torch.float32, device=device)

    def forward(self, visible_rgb, visible_pcd, instruction, curr_gripper):
        dim = self.embedding_dim
        B, ncam, _, H, W = visible_rgb.shape
        feature_maps, downscale = pyramid_layout(self.image_size)
        fine_k = 32 * 32 * ncam

        feats = self.feature_pyramid(
            self.backbone(clip_normalize(visible_rgb.reshape(B * ncam, 3, H, W)))
        )

        def tokens(level):
            f = feats[feature_maps[level]]
            h, w = f.shape[-2:]
            f = f.reshape(B, ncam, dim, h, w).permute(0, 1, 3, 4, 2)
            f = f.reshape(B, ncam * h * w, dim)
            p = F.interpolate(
                visible_pcd.reshape(B * ncam, 3, H, W),
                size=(h, w), mode="bilinear", align_corners=False,
            )
            p = p.reshape(B, ncam, 3, h, w).permute(0, 1, 3, 4, 2)
            return f, p.reshape(B, ncam * h * w, 3)

        instr_feats = instr_pe = None
        if self.use_instruction:
            instr_feats = self.instruction_encoder(instruction)
            instr_pe = rotary_pe_3d(
                torch.zeros(B, instr_feats.shape[1], 3), dim
            )
        grip_pe = rotary_pe_3d(curr_gripper[:, None, :3], dim)
        grip_feats = self.curr_gripper_embed.weight.expand(B, -1).unsqueeze(1)

        query = self.query_embed.weight.expand(B, -1).unsqueeze(1)
        ghost_pcd_pyramid = []
        ghost_feats_pyramid = []
        masks_pyramid = []
        positions = []
        query_outputs = None

        for i in range(self.num_sampling_level):
            anchor = positions[-1] if i > 0 else None
            ghost = self._sample_ghost_points(B, visible_rgb.device, i, anchor)
            n_ghost = ghost.shape[1]

            feats_i, xyz_i = tokens(i)
            if i > 0:
                d2 = ((positions[-1][:, None] - xyz_i) ** 2).sum(-1)
                idx = torch.topk(d2, fine_k, largest=False).indices
                feats_i = torch.stack([f[j] for f, j in zip(feats_i, idx)])
                xyz_i = torch.stack([p[j] for p, j in zip(xyz_i, idx)])

            ctx = torch.cat([feats_i, grip_feats], dim=1)
            ctx_pe = torch.cat([rotary_pe_3d(xyz_i, dim), grip_pe], dim=1)
            if self.use_instruction:
                ctx = self.vis_ins_attn_pyramid[i](ctx, instr_feats)[-1]
                ctx = torch.cat([ctx, instr_feats], dim=1)
                ctx_pe = torch.cat([ctx_pe, instr_pe], dim=1)

            ghost_pe = rotary_pe_3d(ghost, dim)
            gfeats = self.ghost_points_embed_pyramid[i].weight.expand(
                B * n_ghost, -1
            ).reshape(B, n_ghost, dim)
            gfeats = self.ghost_point_cross_attn_pyramid[i](
                gfeats, ctx, ghost_pe, ctx_pe
            )[-1]

            if i == 0:
                query_outputs = self.query_cross_attn_pyramid[i](
                    query, ctx, None, None
                )
            else:
                q_pe = rotary_pe_3d(positions[-1][:, None], dim)
                query_outputs = self.query_cross_attn_pyramid[i](
                    query, ctx, q_pe, ctx_pe
                )
            query = query_outputs[-1]

            masks = [
                torch.einsum("bc,bnc->bn", qf[:, 0], gfeats)
                for qf in query_outputs
            ]
            top = masks[-1].argmax(-1)
            positions.append(torch.stack([g[t] for g, t in zip(ghost, top)]))
            ghost_pcd_pyramid.append(ghost)
            ghost_feats_pyramid.append(gfeats)
            masks_pyramid.append(masks)

        pred = self.gripper_state_predictor(query[:, 0])
        quat = normalise_quat(pred[:, :4])
        grip_open = torch.sigmoid(pred[:, 4:])
        return {
            "position": positions[-1],
            "rotation": quat,
            "gripper": grip_open,
            "position_pyramid": positions,
            "ghost_pcd_pyramid": ghost_pcd_pyramid,
            "ghost_pcd_masks_pyramid": masks_pyramid,
        }
