"""Act3D keypose predictor (flax.linen).

TPU-native re-design of the reference ``Act3D``
(reference: model/keypose_optimization/act3d.py:20-535).

Semantics preserved:
  * frozen backbone + FPN multi-scale features; coarse level = 32x32 tokens
    per camera, fine levels = top-k(32·32·ncam) tokens nearest the previous
    position estimate (act3d.py:228-254).
  * coarse-to-fine ghost point pyramid: level 0 uniform in the workspace
    cube, level i ≥ 1 uniform in a shrinking ball around the anchor
    (gt position while training, previous estimate otherwise)
    (act3d.py:394-440).
  * ghost points cross-attend to [visual ⊕ gripper (⊕ instruction)] context
    with rotary-3D relative PE; a single learned query cross-attends to the
    same context and decodes a dot-product mask over ghost points; the
    argmax ghost point is the position prediction (act3d.py:442-535).

TPU-native re-design (no semantic change):
  * ghost sampling runs on-device with jax.random and static shapes — the
    reference samples with NumPy on the host inside the forward, forcing a
    device→host sync per pyramid level (act3d.py:418).  The sphere sampler
    is a fixed-shape rejection equivalent (ops.sampling).
  * fine-context selection uses lax.top_k + gathers.
  * the level loop is unrolled at trace time (2-4 levels, static).
  * batch-major token layout everywhere.

Weight tying (weight_tying / gp_emb_tying, act3d.py:93-147) is expressed by
calling the same linen submodule instance at every level.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.encoder import VisualEncoder, pyramid_layout
from ..nn.layers import RelativeCrossAttentionModule
from ..ops import rotations as R
from ..ops.geometry import gather_tokens, topk_nearest_context
from ..ops.rotary import rotary_pe_3d
from ..ops.sampling import (
    ghost_point_bounds,
    sample_uniform_ball,
    sample_uniform_cube,
)

_BALL_DIAMETER_DIVISORS = [None, 1.0, 4.0, 16.0]  # act3d.py:55-60


class Act3D(nn.Module):
    backbone: str = "clip"
    image_size: Tuple[int, int] = (256, 256)
    embedding_dim: int = 60
    num_attn_heads: int = 4
    num_ghost_point_cross_attn_layers: int = 2
    num_query_cross_attn_layers: int = 2
    num_vis_ins_attn_layers: int = 2
    rotation_parametrization: str = "quat_from_query"
    gripper_loc_bounds: Tuple[Tuple[float, float, float], Tuple[float, float, float]] = (
        (-2.0, -2.0, -2.0),
        (2.0, 2.0, 2.0),
    )
    num_ghost_points: int = 1000
    num_ghost_points_val: int = 10000
    weight_tying: bool = True
    gp_emb_tying: bool = True
    num_sampling_level: int = 3
    fine_sampling_ball_diameter: float = 0.16
    regress_position_offset: bool = False
    use_instruction: bool = False
    approx_topk: bool = False  # TPU approx_max_k for fine-context selection

    @property
    def rotation_dim(self) -> int:
        return 4 if "quat" in self.rotation_parametrization else 6

    def setup(self):
        dim = self.embedding_dim
        if dim % 3 != 0 or dim % self.num_attn_heads != 0:
            raise ValueError(
                f"embedding_dim {dim} must divide by 3 (rotary-3D splits "
                f"one band per spatial axis, ops/rotary.py) and by "
                f"num_attn_heads {self.num_attn_heads}"
            )
        levels = self.num_sampling_level
        self.visual_encoder = VisualEncoder(
            backbone=self.backbone,
            image_size=self.image_size,
            embedding_dim=dim,
            num_sampling_level=levels,
            name="visual",
        )

        normal = nn.initializers.normal(1.0)
        if self.gp_emb_tying:
            gp = self.param("ghost_points_embed", normal, (1, dim))
            self.ghost_points_embed_pyramid = [gp] * levels
        else:
            self.ghost_points_embed_pyramid = [
                self.param(f"ghost_points_embed_{i}", normal, (1, dim))
                for i in range(levels)
            ]
        self.curr_gripper_embed = self.param("curr_gripper_embed", normal, (1, dim))
        self.query_embed = self.param("query_embed", normal, (1, dim))

        def make_stack(name, n_layers):
            if self.weight_tying:
                mod = RelativeCrossAttentionModule(
                    dim, self.num_attn_heads, n_layers, name=name
                )
                return [mod] * levels
            return [
                RelativeCrossAttentionModule(
                    dim, self.num_attn_heads, n_layers, name=f"{name}_{i}"
                )
                for i in range(levels)
            ]

        self.ghost_point_cross_attn_pyramid = make_stack(
            "ghost_point_cross_attn", self.num_ghost_point_cross_attn_layers
        )
        self.query_cross_attn_pyramid = make_stack(
            "query_cross_attn", self.num_query_cross_attn_layers
        )
        if self.use_instruction:
            self.vis_ins_attn_pyramid = make_stack(
                "vis_ins_attn", self.num_vis_ins_attn_layers
            )
            self.instruction_encoder = nn.Dense(dim, name="instruction_encoder")

        if self.regress_position_offset:
            self.ghost_point_offset_fc1 = nn.Dense(dim, name="ghost_point_offset_fc1")
            self.ghost_point_offset_fc2 = nn.Dense(3, name="ghost_point_offset_fc2")

        self.gripper_state_fc1 = nn.Dense(dim, name="gripper_state_fc1")
        self.gripper_state_fc2 = nn.Dense(
            self.rotation_dim + 1, name="gripper_state_fc2"
        )

    def __call__(
        self,
        visible_rgb: jax.Array,  # (B, ncam, 3, H, W) in [0, 1]
        visible_pcd: jax.Array,  # (B, ncam, 3, H, W) world coords
        instruction: Optional[jax.Array],  # (B, 53, 512)
        curr_gripper: jax.Array,  # (B, 8) or (B, 3+)
        *,
        sample_rng: jax.Array,
        gt_action: Optional[jax.Array] = None,  # (B, 8): biases sampling
        train_mode: bool = True,
        deterministic: bool = True,
        ghost_points_override: Optional[list] = None,  # per-level (B, N, 3):
        # bypasses on-device sampling — used by the checkpoint-parity
        # harness to compare against the reference with identical points
    ) -> Dict[str, jax.Array]:
        dim = self.embedding_dim
        levels = self.num_sampling_level
        b, ncam, _, h, w = visible_rgb.shape
        bounds = jnp.asarray(self.gripper_loc_bounds, dtype=jnp.float32)
        n_ghost = (
            self.num_ghost_points if train_mode else self.num_ghost_points_val
        ) // levels
        _, downscale = pyramid_layout(self.image_size)
        fine_k = 32 * 32 * ncam

        gt_position = None
        if gt_action is not None:
            gt_position = jax.lax.stop_gradient(gt_action[:, :3])

        rgb_feats_pyramid, pcd_pyramid = self.visual_encoder(
            visible_rgb, visible_pcd
        )

        instr_feats = None
        instr_dummy_pos = None
        if self.use_instruction:
            instr_feats = self.instruction_encoder(instruction)  # (B, 53, F)
            instr_dummy_pos = rotary_pe_3d(
                jnp.zeros((b, instr_feats.shape[1], 3)), dim
            )

        curr_gripper_pos = rotary_pe_3d(curr_gripper[:, None, :3], dim)
        curr_gripper_feats = jnp.broadcast_to(
            self.curr_gripper_embed[None], (b, 1, dim)
        )

        ghost_pcd_pyramid = []
        ghost_pcd_features_pyramid = []
        ghost_pcd_masks_pyramid = []
        position_pyramid = []
        query_features_out = None

        rngs = jax.random.split(sample_rng, levels)
        for i in range(levels):
            # ---- ghost point sampling (on-device, static shapes)
            if ghost_points_override is not None:
                ghost_pcd_i = ghost_points_override[i]
                n_ghost = ghost_pcd_i.shape[1]
            elif i == 0:
                ghost_pcd_i = sample_uniform_cube(
                    rngs[i], jnp.broadcast_to(bounds, (b, 2, 3)), n_ghost
                )
            else:
                anchor = (
                    gt_position
                    if gt_position is not None
                    else position_pyramid[-1]
                )
                diameter = (
                    self.fine_sampling_ball_diameter / _BALL_DIAMETER_DIVISORS[i]
                )
                ball_bounds = ghost_point_bounds(anchor, diameter, bounds)
                ghost_pcd_i = sample_uniform_ball(
                    rngs[i], anchor, diameter / 2.0, ball_bounds, n_ghost
                )

            # ---- context tokens for this level
            if i == 0:
                context_feats_i = rgb_feats_pyramid[0]  # (B, N0, F) tokens
                context_xyz_i = pcd_pyramid[0]
            else:
                idx = topk_nearest_context(
                    position_pyramid[-1], pcd_pyramid[i], fine_k,
                    approx=self.approx_topk,
                )
                # sort: context order is attention-invariant, and sorted
                # unique indices let XLA vectorise the gather's backward
                # scatter-add (the fine-level hotspot — see gather_tokens)
                idx = jnp.sort(idx, axis=-1)
                context_feats_i = gather_tokens(
                    rgb_feats_pyramid[i], idx, sorted_indices=True
                )
                context_xyz_i = gather_tokens(
                    pcd_pyramid[i], idx, sorted_indices=True
                )
            context_pos_i = rotary_pe_3d(context_xyz_i, dim)

            context_feats_i = jnp.concatenate(
                [context_feats_i, curr_gripper_feats], axis=1
            )
            context_pos_i = jnp.concatenate(
                [context_pos_i, curr_gripper_pos], axis=1
            )
            if self.use_instruction:
                context_feats_i = self.vis_ins_attn_pyramid[i](
                    context_feats_i, instr_feats,
                    deterministic=deterministic,
                )[-1]
                context_feats_i = jnp.concatenate(
                    [context_feats_i, instr_feats], axis=1
                )
                context_pos_i = jnp.concatenate(
                    [context_pos_i, instr_dummy_pos], axis=1
                )

            # ---- ghost point features (act3d.py:442-465)
            ghost_pos_i = rotary_pe_3d(ghost_pcd_i, dim)
            ghost_feats_i = jnp.broadcast_to(
                self.ghost_points_embed_pyramid[i][None], (b, n_ghost, dim)
            )
            ghost_feats_i = self.ghost_point_cross_attn_pyramid[i](
                ghost_feats_i, context_feats_i,
                query_pos=ghost_pos_i, value_pos=context_pos_i,
                deterministic=deterministic,
            )[-1]

            # ---- query features (act3d.py:467-480)
            if i == 0:
                query_features = jnp.broadcast_to(
                    self.query_embed[None], (b, 1, dim)
                )
                query_pos_i = None
                context_pos_for_query = None
            else:
                query_pos_i = rotary_pe_3d(position_pyramid[-1][:, None], dim)
                context_pos_for_query = context_pos_i
            query_outputs = self.query_cross_attn_pyramid[i](
                query_features, context_feats_i,
                query_pos=query_pos_i, value_pos=context_pos_for_query,
                deterministic=deterministic,
            )
            query_features = query_outputs[-1]

            # ---- decode per-layer masks over ghost points (act3d.py:482-505)
            masks_i = [
                jnp.einsum("bc,bnc->bn", qf[:, 0], ghost_feats_i)
                for qf in query_outputs
            ]

            top_idx = jnp.argmax(masks_i[-1], axis=-1)
            position_i = jnp.take_along_axis(
                ghost_pcd_i, top_idx[:, None, None], axis=1
            )[:, 0]

            ghost_pcd_pyramid.append(ghost_pcd_i)
            ghost_pcd_features_pyramid.append(ghost_feats_i)
            ghost_pcd_masks_pyramid.append(masks_i)
            position_pyramid.append(position_i)
            query_features_out = query_features

        # ---- optional offset regression (act3d.py:322-327)
        fine_ghost_pcd_offsets = None
        if self.regress_position_offset:
            fine_ghost_pcd_offsets = self.ghost_point_offset_fc2(
                nn.relu(self.ghost_point_offset_fc1(ghost_pcd_features_pyramid[-1]))
            )

        # ---- final action (act3d.py:507-535)
        final_masks = ghost_pcd_masks_pyramid[-1][-1]
        top_idx = jnp.argmax(final_masks, axis=-1)
        position = jnp.take_along_axis(
            ghost_pcd_pyramid[-1], top_idx[:, None, None], axis=1
        )[:, 0]
        if fine_ghost_pcd_offsets is not None:
            position = position + jnp.take_along_axis(
                fine_ghost_pcd_offsets, top_idx[:, None, None], axis=1
            )[:, 0]

        if self.rotation_parametrization.endswith("from_top_ghost"):
            features = jnp.take_along_axis(
                ghost_pcd_features_pyramid[-1], top_idx[:, None, None], axis=1
            )[:, 0]
        else:  # *_from_query
            features = query_features_out[:, 0]

        pred = self.gripper_state_fc2(nn.relu(self.gripper_state_fc1(features)))
        if "quat" in self.rotation_parametrization:
            rotation = R.normalise_quat(pred[:, : self.rotation_dim])
        else:
            rotation = R.rotation_matrix_from_ortho6d(
                pred[:, : self.rotation_dim]
            )
        gripper = jax.nn.sigmoid(pred[:, self.rotation_dim :])

        return {
            "position": position,
            "rotation": rotation,
            "gripper": gripper,
            "position_pyramid": position_pyramid,
            # ghost points stored (B, N, 3) — the reference stores (B, 3, N)
            # (act3d.py:313); the loss in train.losses matches this layout.
            "ghost_pcd_pyramid": ghost_pcd_pyramid,
            "ghost_pcd_masks_pyramid": ghost_pcd_masks_pyramid,
            "fine_ghost_pcd_offsets": fine_ghost_pcd_offsets,
        }
