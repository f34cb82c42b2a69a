"""Fake-reference DiffusionPlanner: reference constructor / state-dict
layout / ``policy_forward_pass`` semantics, torch only
(see tests/fake_reference/README.md).

Everything lives under ``prediction_head.`` exactly as the reference
DiffusionPlanner state dict names it (the layout
``convert_diffusion_planner`` consumes): backbone, feature_pyramid,
traj_encoder.0/.3, curr/goal_gripper_encoder, instruction_encoder,
curr/goal_gripper_embed, vl_attention.N.layers.M, traj_lang_attention,
traj_attention, pos/rot_attention, pos/rot_regressor.N.0/.3.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from model._torch_blocks import (
    ClipResNet,
    FeaturePyramidNetwork,
    ParallelAttention,
    clip_normalize,
    normalise_quat,
    ortho6d_from_rotation_matrix,
    pyramid_layout,
    quaternion_to_matrix,
    rotary_pe_3d,
    sinusoidal_pos_emb,
)


class DiffusionHead(nn.Module):
    def __init__(self, dim, heads, num_query_cross_attn_layers,
                 use_instruction, use_goal):
        super().__init__()
        self.dim = dim
        self.use_instruction = use_instruction
        self.use_goal = use_goal

        self.backbone = ClipResNet(layers=(3, 4, 6, 3), width=64)
        self.feature_pyramid = FeaturePyramidNetwork(dim)

        self.traj_encoder = nn.Sequential(
            nn.Linear(9, dim), nn.ReLU(), nn.Dropout(0.0), nn.Linear(dim, dim)
        )
        self.curr_gripper_encoder = nn.Linear(9, dim)
        if use_goal:
            self.goal_gripper_encoder = nn.Linear(9, dim)
        self.instruction_encoder = nn.Linear(512, dim)
        self.curr_gripper_embed = nn.Embedding(1, dim)
        self.goal_gripper_embed = nn.Embedding(1, dim)

        if use_instruction:
            self.vl_attention = nn.ModuleList(
                [ParallelAttention(2, dim, heads, False, True, True, False, False)]
            )
            self.traj_lang_attention = nn.ModuleList(
                [ParallelAttention(1, dim, heads, False, True, False, False, False)]
            )
        self.traj_attention = nn.ModuleList(
            [
                ParallelAttention(
                    num_query_cross_attn_layers - 2, dim, heads,
                    True, True, True, True, True,
                )
            ]
        )
        self.pos_attention = nn.ModuleList(
            [ParallelAttention(2, dim, heads, True, True, True, True, True)]
        )
        self.rot_attention = nn.ModuleList(
            [ParallelAttention(2, dim, heads, True, True, True, True, True)]
        )
        self.pos_regressor = nn.ModuleList(
            [
                nn.Sequential(
                    nn.Linear(dim, dim), nn.ReLU(), nn.Dropout(0.0),
                    nn.Linear(dim, 3),
                )
            ]
        )
        self.rot_regressor = nn.ModuleList(
            [
                nn.Sequential(
                    nn.Linear(dim, dim), nn.ReLU(), nn.Dropout(0.0),
                    nn.Linear(dim, 6),
                )
            ]
        )

    def encode_images(self, rgb, pcd, image_size):
        """Frozen trunk + FPN; single (coarsest) scale tokens.  rgb/pcd:
        (B, ncam, 3, H, W); pcd already workspace-normalised."""
        dim = self.dim
        B, ncam, _, H, W = rgb.shape
        feature_maps, downscale = pyramid_layout(image_size)
        feats = self.feature_pyramid(
            self.backbone(clip_normalize(rgb.reshape(B * ncam, 3, H, W)))
        )
        f = feats[feature_maps[0]]
        h, w = f.shape[-2:]
        f = f.reshape(B, ncam, dim, h, w).permute(0, 1, 3, 4, 2)
        context_feats = f.reshape(B, ncam * h * w, dim)
        p = F.interpolate(
            pcd.reshape(B * ncam, 3, H, W), size=(h, w),
            mode="bilinear", align_corners=False,
        )
        p = p.reshape(B, ncam, 3, h, w).permute(0, 1, 3, 4, 2)
        return context_feats, p.reshape(B, ncam * h * w, 3)

    def forward(self, trajectory, timestep, fixed_inputs, image_size):
        dim = self.dim
        (mask, rgb, pcd_n, instr, curr9, goal9) = fixed_inputs
        B, L, _ = trajectory.shape

        context_feats, context_xyz = self.encode_images(rgb, pcd_n, image_size)

        instr_feats = None
        if self.use_instruction:
            instr_feats = self.instruction_encoder(instr)

        curr_feats = (
            self.curr_gripper_encoder(curr9)[:, None]
            + self.curr_gripper_embed.weight[None].expand(B, -1, -1)
        )
        curr_xyz = curr9[:, None, :3]
        goal_feats = goal_xyz = None
        if self.use_goal:
            goal_feats = (
                self.goal_gripper_encoder(goal9)[:, None]
                + self.goal_gripper_embed.weight[None].expand(B, -1, -1)
            )
            goal_xyz = goal9[:, None, :3]

        traj_feats = self.traj_encoder(trajectory)
        traj_pos = rotary_pe_3d(trajectory[..., :3], dim)
        time_feats = sinusoidal_pos_emb(timestep, dim)
        sem = sinusoidal_pos_emb(torch.arange(L), dim)[None].expand(B, -1, -1)

        if self.use_instruction:
            context_feats = self.vl_attention[0](context_feats, instr_feats)
        ctx = torch.cat([context_feats, curr_feats], dim=1)
        ctx_xyz = torch.cat([context_xyz, curr_xyz], dim=1)
        if self.use_goal:
            ctx = torch.cat([ctx, goal_feats], dim=1)
            ctx_xyz = torch.cat([ctx_xyz, goal_xyz], dim=1)
        # rotary per token group, matching the jax side (context tokens,
        # then gripper tokens, concatenated AFTER encoding)
        ctx_pos = rotary_pe_3d(ctx_xyz, dim)

        if self.use_instruction:
            traj_feats = self.traj_lang_attention[0](
                traj_feats, instr_feats, sem_pos=sem
            )
        traj_feats = self.traj_attention[0](
            traj_feats, ctx, traj_pos, ctx_pos, sem, time_feats
        )
        pos_feats = self.pos_attention[0](
            traj_feats, ctx, traj_pos, ctx_pos, sem, time_feats
        )
        rot_feats = self.rot_attention[0](
            traj_feats, ctx, traj_pos, ctx_pos, sem, time_feats
        )
        pos = self.pos_regressor[0](pos_feats)
        rot = self.rot_regressor[0](rot_feats)
        update = torch.cat([pos, rot], -1)
        out = torch.cat(
            [trajectory[..., :3] + update[..., :3], update[..., 3:]], -1
        )
        return [out]


class DiffusionPlanner(nn.Module):
    def __init__(
        self,
        backbone="clip",
        image_size=(256, 256),
        embedding_dim=120,
        output_dim=7,
        num_vis_ins_attn_layers=2,
        num_query_cross_attn_layers=6,
        use_instruction=True,
        use_goal=True,
        use_goal_at_test=False,
        feat_scales_to_use=1,
        attn_rounds=1,
        rotation_parametrization="6D",
        diffusion_timesteps=100,
        gripper_loc_bounds=None,
    ):
        super().__init__()
        assert backbone == "clip"
        assert rotation_parametrization == "6D"
        assert feat_scales_to_use == 1 and attn_rounds == 1
        self.image_size = tuple(image_size)
        self.gripper_loc_bounds = torch.tensor(
            np.asarray(gripper_loc_bounds, np.float32)
        )
        self.prediction_head = DiffusionHead(
            embedding_dim, 8, num_query_cross_attn_layers,
            use_instruction, use_goal,
        )

    def normalize_pos(self, pos):
        lo = self.gripper_loc_bounds[0]
        hi = self.gripper_loc_bounds[1]
        return (pos - lo) / (hi - lo) * 2.0 - 1.0

    def convert_rot(self, signal):
        """(…, 3+4[+k]) quat layout -> (…, 3+6[+k]) ortho-6D layout."""
        quat = normalise_quat(signal[..., 3:7])
        rot6d = ortho6d_from_rotation_matrix(quaternion_to_matrix(quat))
        return torch.cat([signal[..., :3], rot6d, signal[..., 7:]], dim=-1)

    def policy_forward_pass(self, trajectory, timestep, fixed_inputs):
        """One denoiser evaluation; returns per-round predictions
        (reference diffusion_model.py:226-230)."""
        return self.prediction_head(
            trajectory, timestep, fixed_inputs, self.image_size
        )
