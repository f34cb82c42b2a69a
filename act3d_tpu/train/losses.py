"""Losses and metrics for keypose and trajectory training.

TPU-native equivalents of the reference criteria:
  * :class:`KeyposeLossAndMetrics` — soft-CE ghost-point pyramid loss +
    quaternion MSE + gripper MSE (reference: main_keypose.py:295-482).
  * :class:`TrajectoryCriterion` — trajectory/keypose MSE, pos L2, symmetric
    quaternion L1 (reference: main_trajectory.py:295-343).

All functions are pure and jit-friendly; per-task metric breakdowns are
computed host-side from returned per-sample arrays (the reference does this
with numpy string matching inside the step, main_keypose.py:449-452, which
cannot live in a compiled graph).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp


def soft_cross_entropy(
    logits: jax.Array, soft_labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """torch F.cross_entropy with probability targets: mean over batch of
    -sum(labels * log_softmax(logits))."""
    if label_smoothing > 0.0:
        n = logits.shape[-1]
        soft_labels = soft_labels * (1.0 - label_smoothing) + label_smoothing / n
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(soft_labels * logp, axis=-1))


@dataclasses.dataclass(frozen=True)
class KeyposeLossAndMetrics:
    """position CE over ghost pyramid + rotation MSE + gripper MSE."""

    position_loss: str = "ce"  # "ce" | "mse" | "ce+mse"
    rotation_parametrization: str = "quat_from_query"
    compute_loss_at_all_layers: bool = False
    ground_truth_gaussian_spread: float = 0.01
    label_smoothing: float = 0.0
    position_loss_coeff: float = 1.0
    position_offset_loss_coeff: float = 10000.0
    rotation_loss_coeff: float = 10.0
    gripper_loss_coeff: float = 1.0
    symmetric_rotation_loss: bool = False

    def compute_loss(
        self, pred: Dict, gt_action: jax.Array
    ) -> Dict[str, jax.Array]:
        """gt_action: (B, 8) = pos(3) + quat xyzw(4) + gripper(1)."""
        losses: Dict[str, jax.Array] = {}
        gt_position = gt_action[:, :3]

        if self.position_loss in ("ce", "ce+mse"):
            num_levels = len(pred["ghost_pcd_masks_pyramid"])
            for i, masks_i in enumerate(pred["ghost_pcd_masks_pyramid"]):
                ghost_pcd_i = pred["ghost_pcd_pyramid"][i]  # (B, N, 3)
                l2_i = jnp.sqrt(
                    jnp.sum(
                        jnp.square(ghost_pcd_i - gt_position[:, None, :]),
                        axis=-1,
                    )
                )
                label_i = jax.lax.stop_gradient(
                    jax.nn.softmax(
                        -l2_i / self.ground_truth_gaussian_spread, axis=-1
                    )
                )
                # default: supervise only the last attention layer's mask;
                # compute_loss_at_all_layers supervises every layer
                # (main_keypose.py:398-405)
                layers = (
                    list(range(len(masks_i)))
                    if self.compute_loss_at_all_layers
                    else [-1]
                )
                ce = sum(
                    soft_cross_entropy(
                        masks_i[j], label_i, self.label_smoothing
                    )
                    for j in layers
                )
                losses[f"position_ce_level{i}"] = (
                    ce * self.position_loss_coeff / num_levels
                )
            if pred.get("fine_ghost_pcd_offsets") is not None:
                pred_with_offset = (
                    pred["ghost_pcd_pyramid"][-1] + pred["fine_ghost_pcd_offsets"]
                )
                losses["position_offset"] = (
                    jnp.mean(
                        jnp.square(pred_with_offset - gt_position[:, None, :])
                    )
                    * self.position_offset_loss_coeff
                    * self.position_loss_coeff
                )
        if self.position_loss in ("mse", "ce+mse"):
            losses["position_mse"] = (
                jnp.mean(jnp.square(pred["position"] - gt_position))
                * self.position_loss_coeff
            )

        gt_quat = gt_action[:, 3:7]
        if "quat" in self.rotation_parametrization:
            if self.symmetric_rotation_loss:
                l_pos = jnp.mean(
                    jnp.square(pred["rotation"] - gt_quat), axis=1
                )
                l_neg = jnp.mean(
                    jnp.square(pred["rotation"] + gt_quat), axis=1
                )
                losses["rotation"] = jnp.mean(jnp.minimum(l_pos, l_neg))
            else:
                losses["rotation"] = jnp.mean(
                    jnp.square(pred["rotation"] - gt_quat)
                )
            losses["rotation"] = losses["rotation"] * self.rotation_loss_coeff

        losses["gripper"] = (
            jnp.mean(jnp.square(pred["gripper"] - gt_action[:, 7:8]))
            * self.gripper_loss_coeff
        )
        return losses

    def compute_metrics(
        self, pred: Dict, gt_action: jax.Array
    ) -> Dict[str, jax.Array]:
        """Returns per-sample arrays; aggregate/split by task host-side."""
        metrics: Dict[str, jax.Array] = {}
        gt_position = gt_action[:, :3]
        final_pos_l2 = jnp.sqrt(
            jnp.sum(jnp.square(pred["position"] - gt_position), axis=1)
        )
        metrics["pos_l2_final"] = final_pos_l2
        metrics["pos_l2_final<0.01"] = (final_pos_l2 < 0.01).astype(jnp.float32)
        for i, pos_i in enumerate(pred["position_pyramid"]):
            metrics[f"pos_l2_level{i}"] = jnp.sqrt(
                jnp.sum(jnp.square(pos_i - gt_position), axis=1)
            )

        pred_gripper = (pred["gripper"][:, 0] > 0.5)
        true_gripper = gt_action[:, 7] > 0.5
        metrics["gripper"] = (pred_gripper == true_gripper).astype(jnp.float32)

        gt_quat = gt_action[:, 3:7]
        if "quat" in self.rotation_parametrization:
            l1 = jnp.sum(jnp.abs(pred["rotation"] - gt_quat), axis=1)
            if self.symmetric_rotation_loss:
                l1_neg = jnp.sum(jnp.abs(pred["rotation"] + gt_quat), axis=1)
                l1 = jnp.minimum(l1, l1_neg)
            metrics["rot_l1"] = l1
            metrics["rot_l1<0.05"] = (l1 < 0.05).astype(jnp.float32)
            metrics["rot_l1<0.025"] = (l1 < 0.025).astype(jnp.float32)
        return metrics


def split_metrics_by_task(
    metrics: Dict[str, jax.Array], tasks: List[str]
) -> Dict[str, float]:
    """Host-side per-task breakdown of per-sample metric arrays
    (reference main_keypose.py:449-452, 476-480: '{task}/metric' keys).

    Per-sample arrays are shape (B,) matching `tasks`; scalars pass
    through under 'mean/' keys."""
    import numpy as np

    out: Dict[str, float] = {}
    task_arr = np.asarray(tasks)
    for name, values in metrics.items():
        v = np.asarray(values)
        if v.ndim == 0 or v.shape[0] != len(tasks):
            out[f"mean/{name}"] = float(np.mean(v))
            continue
        out[f"mean/{name}"] = float(v.mean())
        for task in np.unique(task_arr):
            out[f"{task}/{name}"] = float(v[task_arr == task].mean())
    return out


class TrajectoryCriterion:
    """Trajectory metrics (reference main_trajectory.py:295-343).

    The training loss itself is returned by DiffusionPlanner.__call__.
    """

    @staticmethod
    def compute_metrics(
        pred: jax.Array, gt: jax.Array
    ) -> Dict[str, jax.Array]:
        """pred/gt: (B, L, 7).  Returns scalar metrics and per-sample (B,)
        metrics under keys '<name>' and 'per_sample/<name>'."""
        pos_l2 = jnp.sqrt(jnp.sum(jnp.square(pred[..., :3] - gt[..., :3]), -1))
        quat_l1 = jnp.sum(jnp.abs(pred[..., 3:7] - gt[..., 3:7]), -1)
        quat_l1_neg = jnp.sum(jnp.abs(pred[..., 3:7] + gt[..., 3:7]), -1)
        quat_l1 = jnp.minimum(quat_l1, quat_l1_neg)

        out = {
            "traj_action_mse": jnp.mean(jnp.square(pred - gt)),
            "traj_pos_l2": jnp.mean(pos_l2),
            "traj_pos_acc_001": jnp.mean((pos_l2 < 0.01).astype(jnp.float32)),
            "traj_rot_l1": jnp.mean(quat_l1),
            "traj_rot_acc_0025": jnp.mean((quat_l1 < 0.025).astype(jnp.float32)),
            "per_sample/traj_pos_l2": jnp.mean(pos_l2, axis=-1),
            "per_sample/traj_rot_l1": jnp.mean(quat_l1, axis=-1),
        }

        # final-keypose metrics (useful when not goal-conditioned)
        kp_pos_l2 = jnp.sqrt(
            jnp.sum(jnp.square(pred[:, -1, :3] - gt[:, -1, :3]), -1)
        )
        kp_l1 = jnp.sum(jnp.abs(pred[:, -1, 3:7] - gt[:, -1, 3:7]), -1)
        kp_l1_neg = jnp.sum(jnp.abs(pred[:, -1, 3:7] + gt[:, -1, 3:7]), -1)
        kp_l1 = jnp.minimum(kp_l1, kp_l1_neg)
        out.update(
            {
                "pos_l2": jnp.mean(kp_pos_l2),
                "pos_acc_001": jnp.mean((kp_pos_l2 < 0.01).astype(jnp.float32)),
                "rot_l1": jnp.mean(kp_l1),
                "rot_acc_0025": jnp.mean((kp_l1 < 0.025).astype(jnp.float32)),
            }
        )
        return out
