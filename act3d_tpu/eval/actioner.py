"""Actioner: chained keypose → trajectory inference for closed-loop eval.

TPU-native port of the reference ``Actioner``
(reference: online_evaluation/utils_with_rlbench.py:120-236).  The torch
models are replaced by jit-compiled apply functions; observation tensors
arrive as numpy from the simulator and leave as numpy actions — the device
round-trip happens once per keystep.

The "chained" behaviour (the essence of ChainedDiffuser): Act3D's predicted
keypose becomes the goal conditioning of the trajectory DDPM
(reference utils_with_rlbench.py:236-247).

Serving design: when both models are present the whole keystep — keypose
forward, goal assembly, and the 100-step reverse diffusion — runs as ONE
jitted XLA program (``fused_dispatch``, default on).  The reference pays a
host round-trip between the two models (utils_with_rlbench.py:236-247
reads the keypose back to Python to build ``goal_gripper``); here the
predicted keypose never leaves the device, the observation tensors are
transferred once instead of twice, and the policy costs a single dispatch
+ a single readback per keystep.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import Act3D, DiffusionPlanner, compute_trajectory

__all__ = ["Actioner"]


class Actioner:
    def __init__(
        self,
        keypose_model: Optional[Act3D] = None,
        keypose_params=None,
        traj_model: Optional[DiffusionPlanner] = None,
        traj_params=None,
        instructions: Optional[Dict] = None,
        action_dim: int = 7,
        predict_keypose: bool = True,
        predict_trajectory: bool = True,
        seed: int = 0,
        fused_dispatch: bool = True,
    ):
        self._keypose_model = keypose_model
        self._keypose_params = keypose_params
        self._traj_model = traj_model
        self._traj_params = traj_params
        self._instructions = instructions
        self._action_dim = action_dim
        self._predict_keypose = predict_keypose
        self._predict_trajectory = predict_trajectory
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self._instr = None
        self._task_str = None

        if predict_keypose:
            assert keypose_model is not None and keypose_params is not None
            self._keypose_fn = jax.jit(
                lambda rgbs, pcds, instr, gripper, key: keypose_model.apply(
                    {"params": keypose_params},
                    rgbs, pcds, instr, gripper,
                    sample_rng=key, gt_action=None, train_mode=False,
                )
            )
        if predict_trajectory:
            assert traj_model is not None and traj_params is not None
            self._traj_fn = jax.jit(
                lambda mask, rgbs, pcds, instr, gripper, goal, key: (
                    compute_trajectory(
                        traj_model, {"params": traj_params},
                        mask, rgbs, pcds, instr, gripper, goal, key,
                    )
                )
            )

        self._fused = bool(
            fused_dispatch and predict_keypose and predict_trajectory
        )
        if self._fused:
            action_slice = self._action_dim

            def chained(rgbs, pcds, instr, gripper, mask, kkey, tkey):
                pred = keypose_model.apply(
                    {"params": keypose_params},
                    rgbs, pcds, instr, gripper,
                    sample_rng=kkey, gt_action=None, train_mode=False,
                )
                action = jnp.concatenate(
                    [pred["position"], pred["rotation"], pred["gripper"]],
                    axis=1,
                )
                traj = compute_trajectory(
                    traj_model, {"params": traj_params},
                    mask, rgbs, pcds, instr,
                    gripper[:, :action_slice], action[:, :action_slice],
                    tkey,
                )
                return pred, action, traj

            self._chained_fn = jax.jit(chained)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    @staticmethod
    def _overlay_positions(output, pred):
        # coarse/fine positions for the video overlays (the recorder
        # reads output.get("coarse_position") — utils_with_rlbench.py:
        # 634-635; the reference actioner never populated them)
        pyramid = pred.get("position_pyramid")
        if pyramid:
            output["coarse_position"] = (
                np.asarray(pyramid[0]).reshape(-1, 3)[-1]
            )
            output["fine_position"] = (
                np.asarray(pred["position"]).reshape(-1, 3)[-1]
            )

    def load_episode(self, task_str: str, variation: int):
        self._task_str = task_str
        options = list(self._instructions[task_str][variation])
        choice = options[self._rng.integers(len(options))]
        self._instr = np.asarray(choice, np.float32)[None]  # (1, 53, 512)

    def predict(
        self,
        rgbs: np.ndarray,  # (1, ncam, 3, H, W) in [-1, 1] (sim convention)
        pcds: np.ndarray,  # (1, ncam, 3, H, W)
        gripper: np.ndarray,  # (1, 8)
        gt_action: Optional[np.ndarray] = None,
        trajectory_mask: Optional[np.ndarray] = None,
    ) -> Dict[str, Optional[np.ndarray]]:
        if self._instr is None:
            raise ValueError("call load_episode first")
        rgbs = np.asarray(rgbs, np.float32) / 2 + 0.5  # to [0, 1]
        pcds = np.asarray(pcds, np.float32)
        instr = self._instr

        output: Dict[str, Optional[np.ndarray]] = {"action": None}
        if self._fused and trajectory_mask is not None:
            # single XLA program: keypose -> goal -> 100-step sampler; the
            # keys are drawn in the same order as the two-dispatch path so
            # both produce identical actions for a given seed
            kkey, tkey = self._next_key(), self._next_key()
            pred, action, traj = self._chained_fn(
                rgbs, pcds, instr, jnp.asarray(gripper),
                jnp.asarray(trajectory_mask), kkey, tkey,
            )
            output["action"] = np.asarray(action)
            output["trajectory"] = np.asarray(traj)
            self._overlay_positions(output, pred)
            return output
        if self._predict_keypose:
            pred = self._keypose_fn(
                rgbs, pcds, instr, jnp.asarray(gripper), self._next_key()
            )
            output["action"] = np.concatenate(
                [
                    np.asarray(pred["position"]),
                    np.asarray(pred["rotation"]),
                    np.asarray(pred["gripper"]),
                ],
                axis=1,
            )
            self._overlay_positions(output, pred)
        else:
            output["action"] = np.asarray(gt_action)[:, -1]

        if self._predict_trajectory:
            traj = self._traj_fn(
                jnp.asarray(trajectory_mask),
                rgbs,
                pcds,
                instr,
                jnp.asarray(gripper[:, : self._action_dim]),
                jnp.asarray(output["action"][..., : self._action_dim]),
                self._next_key(),
            )
            output["trajectory"] = np.asarray(traj)
        else:
            output["trajectory"] = None
        return output
