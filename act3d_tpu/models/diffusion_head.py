"""ChainedDiffuser denoiser network (flax.linen).

TPU-native re-design of the reference ``DiffusionHead``
(reference: model/trajectory_optimization/diffusion_head.py:10-363) plus the
token encoders it inherits from the shared ``Encoder``
(reference: model/utils/encoder.py:78-203).

Key design deltas from the reference (all TPU-motivated, none semantic):
  * batch-major (B, L, F) everywhere; no seq-major transposes.
  * the visual encoding (frozen CLIP + FPN) is *separated* from the
    denoising trunk so the 100-step reverse-diffusion loop can run under
    ``lax.scan`` with the image features hoisted out (the reference re-runs
    the frozen encoder every step — diffusion_model.py:99-117).
  * the k-NN local-attention context pruning at fine scales uses
    ``lax.top_k`` gathers with static k (reference uses per-sample python
    stacking, diffusion_head.py:296-302).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.encoder import VisualEncoder
from ..nn.layers import ParallelAttention
from ..ops.geometry import find_traj_nn
from ..ops.rotary import rotary_pe_3d, sinusoidal_pos_emb


class DiffusionHead(nn.Module):
    """Predicts the clean trajectory from a noisy one + scene context.

    Inputs/outputs mirror the reference forward
    (diffusion_head.py:200-277); returns one predicted trajectory per
    (attn_round, feat_scale) pair.
    """

    backbone: str = "clip"
    image_size: Tuple[int, int] = (256, 256)
    embedding_dim: int = 120
    output_dim: int = 9  # 3 pos + 6D rotation ('6D' parametrization)
    num_attn_heads: int = 8
    num_vis_ins_attn_layers: int = 2
    num_query_cross_attn_layers: int = 6
    use_instruction: bool = False
    use_goal: bool = False
    feat_scales_to_use: int = 1
    attn_rounds: int = 1
    dropout: float = 0.1

    def setup(self):
        dim = self.embedding_dim
        if dim % 3 != 0 or dim % self.num_attn_heads != 0:
            raise ValueError(
                f"embedding_dim {dim} must divide by 3 (rotary-3D splits "
                f"one band per spatial axis, ops/rotary.py) and by "
                f"num_attn_heads {self.num_attn_heads}"
            )
        self.visual_encoder = VisualEncoder(
            backbone=self.backbone,
            image_size=self.image_size,
            embedding_dim=dim,
            num_sampling_level=self.feat_scales_to_use,
            name="visual",
        )

        xavier = nn.initializers.xavier_uniform()
        self.drop = nn.Dropout(self.dropout)
        # traj encoder MLP: 9 -> F -> F (diffusion_head.py:43-48)
        self.traj_enc_fc1 = nn.Dense(dim, name="traj_enc_fc1")
        self.traj_enc_fc2 = nn.Dense(dim, name="traj_enc_fc2")
        self.curr_gripper_encoder = nn.Dense(dim, name="curr_gripper_encoder")
        if self.use_goal:
            self.goal_gripper_encoder = nn.Dense(dim, name="goal_gripper_encoder")
        self.instruction_encoder = nn.Dense(dim, name="instruction_encoder")

        self.curr_gripper_embed = self.param(
            "curr_gripper_embed", nn.initializers.normal(1.0), (1, dim)
        )
        self.goal_gripper_embed = self.param(
            "goal_gripper_embed", nn.initializers.normal(1.0), (1, dim)
        )

        n_blocks = self.attn_rounds * self.feat_scales_to_use
        if self.use_instruction:
            self.vl_attention = [
                ParallelAttention(
                    num_layers=self.num_vis_ins_attn_layers,
                    d_model=dim, n_heads=self.num_attn_heads,
                    dropout=self.dropout,
                    self_attention1=False, self_attention2=False,
                    cross_attention1=True, cross_attention2=False,
                    name=f"vl_attention_{i}",
                )
                for i in range(n_blocks)
            ]
            self.traj_lang_attention = [
                ParallelAttention(
                    num_layers=1,
                    d_model=dim, n_heads=self.num_attn_heads,
                    dropout=self.dropout,
                    self_attention1=False, self_attention2=False,
                    cross_attention1=True, cross_attention2=False,
                    rotary_pe=False, apply_ffn=False,
                    name=f"traj_lang_attention_{i}",
                )
                for i in range(n_blocks)
            ]
        self.traj_attention = [
            ParallelAttention(
                num_layers=self.num_query_cross_attn_layers - 2,
                d_model=dim, n_heads=self.num_attn_heads,
                dropout=self.dropout,
                self_attention1=True, self_attention2=False,
                cross_attention1=True, cross_attention2=False,
                rotary_pe=True, use_adaln=True,
                name=f"traj_attention_{i}",
            )
            for i in range(n_blocks)
        ]
        self.pos_attention = [
            ParallelAttention(
                num_layers=2,
                d_model=dim, n_heads=self.num_attn_heads,
                dropout=self.dropout,
                self_attention1=True, self_attention2=False,
                cross_attention1=True, cross_attention2=False,
                rotary_pe=True, use_adaln=True,
                name=f"pos_attention_{i}",
            )
            for i in range(n_blocks)
        ]
        self.rot_attention = [
            ParallelAttention(
                num_layers=2,
                d_model=dim, n_heads=self.num_attn_heads,
                dropout=self.dropout,
                self_attention1=True, self_attention2=False,
                cross_attention1=True, cross_attention2=False,
                rotary_pe=True, use_adaln=True,
                name=f"rot_attention_{i}",
            )
            for i in range(n_blocks)
        ]
        self.pos_regressor_fc1 = [
            nn.Dense(dim, kernel_init=xavier, name=f"pos_regressor_{i}_fc1")
            for i in range(n_blocks)
        ]
        self.pos_regressor_fc2 = [
            nn.Dense(3, kernel_init=xavier, name=f"pos_regressor_{i}_fc2")
            for i in range(n_blocks)
        ]
        self.rot_regressor_fc1 = [
            nn.Dense(dim, kernel_init=xavier, name=f"rot_regressor_{i}_fc1")
            for i in range(n_blocks)
        ]
        self.rot_regressor_fc2 = [
            nn.Dense(
                self.output_dim - 3, kernel_init=xavier,
                name=f"rot_regressor_{i}_fc2",
            )
            for i in range(n_blocks)
        ]

    # ------------------------------------------------------------------
    # Context encoding (run ONCE per observation, hoisted out of the
    # denoising scan)
    # ------------------------------------------------------------------
    def encode_context(
        self,
        visible_rgb: jax.Array,  # (B, ncam, 3, H, W) in [0, 1]
        visible_pcd: jax.Array,  # (B, ncam, 3, H, W), normalised coords
        curr_gripper: jax.Array,  # (B, output_dim)
        goal_gripper: Optional[jax.Array],  # (B, output_dim) or None
        instruction: Optional[jax.Array],  # (B, 53, 512) or None
    ):
        """Returns the fixed (trajectory-independent) conditioning tensors."""
        dim = self.embedding_dim
        b = visible_rgb.shape[0]

        rgb_feats_pyramid, pcd_pyramid = self.visual_encoder(
            visible_rgb, visible_pcd
        )

        # gripper poses arrive f32 (normalisation happens against f32
        # bounds); cast the *feature* inputs to the visual dtype so one f32
        # token doesn't promote every context concat under mixed precision
        dtype = visible_rgb.dtype
        curr_gripper_in = curr_gripper.astype(dtype)
        goal_gripper_in = (
            goal_gripper.astype(dtype) if goal_gripper is not None else None
        )

        instr_feats = None
        if self.use_instruction:
            instr_feats = self.instruction_encoder(instruction.astype(dtype))

        # current gripper token: learned embed + linear(gripper pose)
        curr_gripper_feats = (
            self.curr_gripper_encoder(curr_gripper_in)[:, None]
            + jnp.broadcast_to(self.curr_gripper_embed[None], (b, 1, dim))
        )
        curr_gripper_pos = rotary_pe_3d(curr_gripper[:, None, :3], dim)

        goal_gripper_feats = goal_gripper_pos = None
        if self.use_goal:
            goal_gripper_feats = (
                self.goal_gripper_encoder(goal_gripper_in)[:, None]
                + jnp.broadcast_to(self.goal_gripper_embed[None], (b, 1, dim))
            )
            goal_gripper_pos = rotary_pe_3d(goal_gripper[:, None, :3], dim)

        return dict(
            rgb_feats_pyramid=rgb_feats_pyramid,
            pcd_pyramid=pcd_pyramid,
            instr_feats=instr_feats,
            curr_gripper_feats=curr_gripper_feats,
            curr_gripper_pos=curr_gripper_pos,
            goal_gripper_feats=goal_gripper_feats,
            goal_gripper_pos=goal_gripper_pos,
        )

    # ------------------------------------------------------------------
    # Denoising trunk (runs every diffusion step)
    # ------------------------------------------------------------------
    def denoise(
        self,
        trajectory: jax.Array,  # (B, L, 9)
        trajectory_mask: jax.Array,  # (B, L) bool, True = padding
        timestep: jax.Array,  # (B,)
        context,  # output of encode_context
        deterministic: bool = True,
    ) -> List[jax.Array]:
        dim = self.embedding_dim
        # mixed precision: the trunk follows the visual-feature dtype; the
        # trajectory itself (positions/rotations) stays in its own dtype for
        # the residual updates and rotary phases
        dtype = context["rgb_feats_pyramid"][0].dtype

        traj_feats = self.traj_enc_fc2(
            self.drop(
                nn.relu(self.traj_enc_fc1(trajectory.astype(dtype))),
                deterministic=deterministic,
            )
        )
        traj_pos = rotary_pe_3d(trajectory[..., :3], dim)

        time_feats = sinusoidal_pos_emb(timestep, dim).astype(dtype)  # (B, F)

        traj_time_pos = sinusoidal_pos_emb(
            jnp.arange(trajectory.shape[1]), dim
        )[None]
        traj_time_pos = jnp.broadcast_to(
            traj_time_pos, (trajectory.shape[0],) + traj_time_pos.shape[1:]
        )

        outputs: List[jax.Array] = []
        for attn_round in range(self.attn_rounds):
            for scale in range(self.feat_scales_to_use):
                p_inds = None
                if self.use_goal and scale > 0:
                    prev = outputs[-1] if outputs else trajectory
                    p_inds = find_traj_nn(
                        prev[..., :3],
                        context["pcd_pyramid"][scale],
                        nn_per_step=64 if scale == 1 else 16,
                    )
                update = self._one_attention_round(
                    context, time_feats,
                    traj_feats, traj_pos, traj_time_pos, trajectory_mask,
                    attn_round, scale, p_inds, deterministic,
                )
                trajectory = jnp.concatenate(
                    [trajectory[..., :3] + update[..., :3], update[..., 3:]],
                    axis=-1,
                )
                outputs.append(trajectory)
        return outputs

    def _one_attention_round(
        self,
        context,
        time_feats,
        traj_feats,
        traj_pos,
        traj_time_pos,
        trajectory_mask,
        attn_round: int,
        scale: int,
        p_inds: Optional[jax.Array],
        deterministic: bool,
    ) -> jax.Array:
        dim = self.embedding_dim
        context_feats = context["rgb_feats_pyramid"][scale]  # (B, N, F)
        context_pos_xyz = context["pcd_pyramid"][scale]
        if p_inds is not None:
            context_feats = jnp.take_along_axis(
                context_feats, p_inds[..., None], axis=1
            )
            context_pos_xyz = jnp.take_along_axis(
                context_pos_xyz, p_inds[..., None], axis=1
            )
        context_pos = rotary_pe_3d(context_pos_xyz, dim)

        l_offset = attn_round * self.feat_scales_to_use + scale
        if self.use_instruction:
            context_feats, _ = self.vl_attention[l_offset](
                context_feats, context["instr_feats"],
                deterministic=deterministic,
            )

        context_feats = jnp.concatenate(
            [context_feats, context["curr_gripper_feats"]], axis=1
        )
        context_pos = jnp.concatenate(
            [context_pos, context["curr_gripper_pos"]], axis=1
        )
        if self.use_goal:
            context_feats = jnp.concatenate(
                [context_feats, context["goal_gripper_feats"]], axis=1
            )
            context_pos = jnp.concatenate(
                [context_pos, context["goal_gripper_pos"]], axis=1
            )

        if self.use_instruction:
            traj_feats, _ = self.traj_lang_attention[l_offset](
                traj_feats, context["instr_feats"],
                seq1_key_padding_mask=trajectory_mask,
                seq1_sem_pos=traj_time_pos,
                deterministic=deterministic,
            )
        traj_feats, _ = self.traj_attention[l_offset](
            traj_feats, context_feats,
            seq1_key_padding_mask=trajectory_mask,
            seq1_pos=traj_pos, seq2_pos=context_pos,
            seq1_sem_pos=traj_time_pos,
            ada_sgnl=time_feats,
            deterministic=deterministic,
        )
        pos_feats, _ = self.pos_attention[l_offset](
            traj_feats, context_feats,
            seq1_key_padding_mask=trajectory_mask,
            seq1_pos=traj_pos, seq2_pos=context_pos,
            seq1_sem_pos=traj_time_pos,
            ada_sgnl=time_feats,
            deterministic=deterministic,
        )
        rot_feats, _ = self.rot_attention[l_offset](
            traj_feats, context_feats,
            seq1_key_padding_mask=trajectory_mask,
            seq1_pos=traj_pos, seq2_pos=context_pos,
            seq1_sem_pos=traj_time_pos,
            ada_sgnl=time_feats,
            deterministic=deterministic,
        )

        pos = self.pos_regressor_fc2[l_offset](
            self.drop(
                nn.relu(self.pos_regressor_fc1[l_offset](pos_feats)),
                deterministic=deterministic,
            )
        )
        rot = self.rot_regressor_fc2[l_offset](
            self.drop(
                nn.relu(self.rot_regressor_fc1[l_offset](rot_feats)),
                deterministic=deterministic,
            )
        )
        return jnp.concatenate([pos, rot], axis=-1)

    def __call__(
        self,
        trajectory: jax.Array,
        trajectory_mask: jax.Array,
        timestep: jax.Array,
        visible_rgb: jax.Array,
        visible_pcd: jax.Array,
        curr_gripper: jax.Array,
        goal_gripper: Optional[jax.Array] = None,
        instruction: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> List[jax.Array]:
        """Full forward = encode_context + denoise (reference parity path)."""
        context = self.encode_context(
            visible_rgb, visible_pcd, curr_gripper, goal_gripper, instruction
        )
        return self.denoise(
            trajectory, trajectory_mask, timestep, context, deterministic
        )
