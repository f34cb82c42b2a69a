"""ChainedDiffuser trajectory DDPM (flax.linen).

TPU-native re-design of the reference ``DiffusionPlanner``
(reference: model/trajectory_optimization/diffusion_model.py:15-324).

Semantics preserved exactly (for checkpoint parity):
  * two DDPM schedulers — position: scaled_linear; rotation:
    squaredcos_cap_v2 — both predicting the clean sample
    (diffusion_model.py:51-60).
  * positions are normalised to [-1, 1] via gripper workspace bounds
    (diffusion_model.py:187-195).
  * the dataset-layout quaternion (xyzw) is fed to wxyz-convention
    quaternion maths *unchanged*, exactly as the reference does
    (diffusion_model.py:197-230): the 6D parametrization is self-consistent
    under this relabelling, so outputs land back in dataset layout.
  * training adds noise at a uniform random timestep; loss is
    100·L1(pos) + 10·L1(rot6d) summed over the head's per-round outputs
    (diffusion_model.py:286-324).

TPU-native improvements:
  * ``sample()`` runs the 100-step reverse process as a single
    ``lax.scan`` with the frozen visual encoding hoisted out of the loop
    (the reference re-encodes the images every step,
    diffusion_model.py:99-117).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import rotations as R
from ..ops.schedulers import make_ddpm_schedule
from .diffusion_head import DiffusionHead


class DiffusionPlanner(nn.Module):
    backbone: str = "clip"
    image_size: Tuple[int, int] = (256, 256)
    embedding_dim: int = 120
    output_dim: int = 7  # becomes 9 internally with '6D'
    num_vis_ins_attn_layers: int = 2
    num_query_cross_attn_layers: int = 6
    use_instruction: bool = False
    use_goal: bool = False
    use_goal_at_test: bool = True
    feat_scales_to_use: int = 1
    attn_rounds: int = 1
    rotation_parametrization: str = "6D"
    diffusion_timesteps: int = 100
    gripper_loc_bounds: Tuple[Tuple[float, float, float], Tuple[float, float, float]] = (
        (-2.0, -2.0, -2.0),
        (2.0, 2.0, 2.0),
    )

    @property
    def internal_dim(self) -> int:
        return self.output_dim + (2 if self.rotation_parametrization == "6D" else 0)

    def setup(self):
        self.head = DiffusionHead(
            backbone=self.backbone,
            image_size=self.image_size,
            embedding_dim=self.embedding_dim,
            output_dim=self.internal_dim,
            num_vis_ins_attn_layers=self.num_vis_ins_attn_layers,
            num_query_cross_attn_layers=self.num_query_cross_attn_layers,
            use_instruction=self.use_instruction,
            use_goal=self.use_goal,
            feat_scales_to_use=self.feat_scales_to_use,
            attn_rounds=self.attn_rounds,
            name="prediction_head",
        )
        self.pos_schedule = make_ddpm_schedule(
            "scaled_linear", self.diffusion_timesteps
        )
        self.rot_schedule = make_ddpm_schedule(
            "squaredcos_cap_v2", self.diffusion_timesteps
        )

    # ------------------------------------------------------------ helpers
    def _bounds(self):
        b = jnp.asarray(self.gripper_loc_bounds, dtype=jnp.float32)
        return b[0], b[1]

    def normalize_pos(self, pos: jax.Array) -> jax.Array:
        lo, hi = self._bounds()
        return (pos - lo) / (hi - lo) * 2.0 - 1.0

    def unnormalize_pos(self, pos: jax.Array) -> jax.Array:
        lo, hi = self._bounds()
        return (pos + 1.0) / 2.0 * (hi - lo) + lo

    def convert_rot(self, signal: jax.Array) -> jax.Array:
        """(…, 3+4[+k]) pose with quat -> (…, 3+6[+k]) with ortho-6D."""
        quat = R.normalise_quat(signal[..., 3:7])
        if self.rotation_parametrization != "6D":
            return jnp.concatenate(
                [signal[..., :3], quat, signal[..., 7:]], axis=-1
            )
        # NOTE: dataset layout is xyzw but this feeds the wxyz-convention
        # function unchanged, exactly like the reference (see module doc).
        rot = R.quaternion_to_matrix(quat)
        rot6d = R.ortho6d_from_rotation_matrix(rot)
        return jnp.concatenate(
            [signal[..., :3], rot6d, signal[..., 7:]], axis=-1
        )

    def unconvert_rot(self, signal: jax.Array) -> jax.Array:
        """(…, 3+6[+k]) -> (…, 3+4[+k])."""
        if self.rotation_parametrization != "6D":
            return signal
        mat = R.rotation_matrix_from_ortho6d(signal[..., 3:9])
        quat = R.matrix_to_quaternion(mat)
        return jnp.concatenate(
            [signal[..., :3], quat, signal[..., 9:]], axis=-1
        )

    # ----------------------------------------------------------- training
    def __call__(
        self,
        gt_trajectory: jax.Array,  # (B, L, 7) quaternion layout
        trajectory_mask: jax.Array,  # (B, L) bool, True = padding
        rgb_obs: jax.Array,  # (B, ncam, 3, H, W)
        pcd_obs: jax.Array,  # (B, ncam, 3, H, W)
        instruction: Optional[jax.Array],
        curr_gripper: jax.Array,  # (B, 7)
        goal_gripper: jax.Array,  # (B, 7)
        *,
        noise_rng: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """Training forward pass; returns the scalar diffusion loss.

        Padded trajectory rows are zero-filled by the dataset (parity with
        reference dataset_engine.py:216-224); a zero quaternion is singular
        under the 6D conversion, and the reference's unmasked loss
        (diffusion_model.py:314-324) would produce nan on this path — it
        is only ever exercised with dense_interpolation=1 (all-valid
        masks) there.  We define the sane semantics: identity-quaternion
        substitution on padded rows plus a validity-masked loss, which is
        bit-identical to the reference whenever the mask is all-valid.
        """
        ident = jnp.zeros_like(gt_trajectory[..., 3:7]).at[..., 3].set(1.0)
        quat = jnp.where(
            trajectory_mask[..., None], ident, gt_trajectory[..., 3:7]
        )
        gt_trajectory = jnp.concatenate(
            [gt_trajectory[..., :3], quat, gt_trajectory[..., 7:]], axis=-1
        )
        gt = jnp.concatenate(
            [self.normalize_pos(gt_trajectory[..., :3]), gt_trajectory[..., 3:]],
            axis=-1,
        )
        pcd = self._normalize_pcd(pcd_obs)
        curr = self._prep_gripper(curr_gripper)
        goal = self._prep_gripper(goal_gripper)
        gt = self.convert_rot(gt)

        b = gt.shape[0]
        k_noise, k_time = jax.random.split(noise_rng)
        noise = jax.random.normal(k_noise, gt.shape, dtype=gt.dtype)
        timesteps = jax.random.randint(
            k_time, (b,), 0, self.diffusion_timesteps
        )

        pos = self.pos_schedule.add_noise(gt[..., :3], noise[..., :3], timesteps)
        rot = self.rot_schedule.add_noise(gt[..., 3:9], noise[..., 3:9], timesteps)
        noisy = jnp.concatenate([pos, rot], axis=-1)

        context = self.head.encode_context(
            rgb_obs, pcd, curr,
            goal if self.use_goal else None,
            instruction if self.use_instruction else None,
        )
        preds = self.head.denoise(
            noisy, trajectory_mask, timesteps, context,
            deterministic=deterministic,
        )

        # validity-masked L1 means — identical to the reference's plain
        # means (diffusion_model.py:314-324) when the mask is all-valid
        valid = (~trajectory_mask)[..., None].astype(gt.dtype)
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        total = 0.0
        for layer_pred in preds:
            pos_l1 = jnp.sum(
                jnp.abs(layer_pred[..., :3] - gt[..., :3]) * valid
            ) / (n_valid * 3.0)
            rot_l1 = jnp.sum(
                jnp.abs(layer_pred[..., 3:9] - gt[..., 3:9]) * valid
            ) / (n_valid * 6.0)
            total = total + 100.0 * pos_l1 + 10.0 * rot_l1
        return total

    def _normalize_pcd(self, pcd_obs: jax.Array) -> jax.Array:
        # (B, ncam, 3, H, W): normalise the channel dim
        x = jnp.moveaxis(pcd_obs, 2, -1)
        x = self.normalize_pos(x)
        return jnp.moveaxis(x, -1, 2)

    def _prep_gripper(self, gripper: jax.Array) -> jax.Array:
        g = jnp.concatenate(
            [self.normalize_pos(gripper[..., :3]), gripper[..., 3:]], axis=-1
        )
        return self.convert_rot(g)

    # ---------------------------------------------------------- inference
    # The reverse-diffusion loop lives OUTSIDE the module (a plain lax.scan
    # over bound apply calls — see compute_trajectory below) so the frozen
    # visual context is encoded once and the scan carries only the evolving
    # trajectory.  The module exposes the two pieces it needs:

    def encode(
        self,
        rgb_obs: jax.Array,
        pcd_obs: jax.Array,
        instruction: Optional[jax.Array],
        curr_gripper: jax.Array,  # (B, 7) raw (unnormalised) pose
        goal_gripper: jax.Array,
    ):
        """Observation encoding for sampling; grippers are normalised and
        rotation-converted internally."""
        pcd = self._normalize_pcd(pcd_obs)
        curr = self._prep_gripper(curr_gripper)
        goal = self._prep_gripper(goal_gripper)
        context = self.head.encode_context(
            rgb_obs, pcd, curr,
            goal if self.use_goal else None,
            instruction if self.use_instruction else None,
        )
        return context, curr, goal

    def denoise_step(
        self,
        trajectory: jax.Array,
        trajectory_mask: jax.Array,
        timestep: jax.Array,  # (B,)
        context,
    ) -> jax.Array:
        """Last-layer clean-sample prediction (one denoiser evaluation)."""
        return self.head.denoise(
            trajectory, trajectory_mask, timestep, context,
            deterministic=True,
        )[-1]


def compute_trajectory(
    model: DiffusionPlanner,
    variables,
    trajectory_mask: jax.Array,  # (B, L) bool, True = padding
    rgb_obs: jax.Array,
    pcd_obs: jax.Array,
    instruction: Optional[jax.Array],
    curr_gripper: jax.Array,  # (B, 7)
    goal_gripper: jax.Array,  # (B, 7)
    sample_rng: jax.Array,
) -> jax.Array:
    """Full reverse diffusion; returns (B, L, 7) trajectories.

    Mirrors ``compute_trajectory`` + ``conditional_sample``
    (diffusion_model.py:86-185) as a single jit-able lax.scan with the
    visual context hoisted out of the loop.
    """
    b, length = trajectory_mask.shape
    d = model.internal_dim
    n_steps = model.diffusion_timesteps

    context, curr, goal = model.apply(
        variables, rgb_obs, pcd_obs, instruction, curr_gripper, goal_gripper,
        method=DiffusionPlanner.encode,
    )

    # Conditioning: start pose at index 0; goal pose at the last non-padded
    # index, padding forced to zero, when use_goal_at_test
    # (diffusion_model.py:152-168).
    positions = jnp.arange(length)[None, :]  # (1, L)
    last_valid = (length - jnp.sum(trajectory_mask, axis=1) - 1)[:, None]
    cond_data = jnp.zeros((b, length, d), dtype=jnp.float32)
    cond_mask = positions == 0
    cond_data = jnp.where(
        (positions == 0)[..., None], curr[:, None, :], cond_data
    )
    if model.use_goal_at_test:
        cond_data = jnp.where(
            (positions == last_valid)[..., None], goal[:, None, :], cond_data
        )
        cond_mask = cond_mask | (positions >= last_valid)
    cond_mask = jnp.broadcast_to(cond_mask[..., None], (b, length, d))

    pos_schedule = make_ddpm_schedule("scaled_linear", n_steps)
    rot_schedule = make_ddpm_schedule("squaredcos_cap_v2", n_steps)

    k_init, k_steps = jax.random.split(sample_rng)
    trajectory = (
        jax.random.normal(k_init, (b, length, d), dtype=jnp.float32) + cond_data
    )

    timesteps = jnp.arange(n_steps - 1, -1, -1)
    step_keys = jax.random.split(k_steps, n_steps)

    def body(traj, inputs):
        t, key = inputs
        out = model.apply(
            variables, traj, trajectory_mask, jnp.full((b,), t), context,
            method=DiffusionPlanner.denoise_step,
        )
        out = jnp.where(cond_mask, cond_data, out)
        noise = jax.random.normal(key, traj.shape, dtype=traj.dtype)
        pos = pos_schedule.step(out[..., :3], t, traj[..., :3], noise[..., :3])
        rot = rot_schedule.step(out[..., 3:9], t, traj[..., 3:9], noise[..., 3:9])
        stepped = jnp.concatenate([pos, rot], axis=-1)
        # reference keeps the raw prediction at the final (t == 0) step
        return jnp.where(t == 0, out, stepped), None

    trajectory, _ = jax.lax.scan(body, trajectory, (timesteps, step_keys))

    if model.rotation_parametrization != "6D":
        quat = R.normalise_quat(trajectory[..., 3:7])
        trajectory = jnp.concatenate(
            [trajectory[..., :3], quat, trajectory[..., 7:]], axis=-1
        )
    trajectory = model.unconvert_rot(trajectory)
    return jnp.concatenate(
        [model.unnormalize_pos(trajectory[..., :3]), trajectory[..., 3:]],
        axis=-1,
    )
