"""Eval-loop semantics tests (no simulator, no real models).

Covers the round-2 VERDICT items on the evaluation wrapper:
- per-pose exception scoping: unreachable-pose sim errors (IKError etc.)
  are skipped, any other exception propagates (the reference's inner loop
  swallowed everything, utils_with_rlbench.py:687-691);
- video recording wiring: an mp4 (and the point-cloud overlay twin) lands
  in log_dir/videos during evaluation (reference utils_with_rlbench.py:
  512-543, 696-701).
"""

import numpy as np
import pytest

from act3d_tpu.eval.rlbench_env import RLBenchEnv, IKError
from act3d_tpu.eval.video import StaticCameraMotion, TaskRecorder

IMAGE = (32, 32)
GOAL = np.array([0.2, 0.1, 1.0])


class FakeObs:
    def __init__(self, pose, gripper_open, rng):
        self.gripper_pose = np.asarray(pose, np.float64)
        self.gripper_open = gripper_open
        self.joint_velocities = rng.normal(size=7)
        h, w = IMAGE
        self.left_shoulder_rgb = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        self.left_shoulder_point_cloud = rng.uniform(
            -0.4, 1.4, (h, w, 3)
        ).astype(np.float32)
        self.misc = {}


class FakeDemo:
    def __init__(self, rng):
        poses = np.linspace(
            np.array([0.0, 0.0, 0.8, 0, 0, 0, 1]),
            np.concatenate([GOAL, [0, 0, 0, 1]]),
            8,
        )
        self._obs = []
        for i, p in enumerate(poses):
            obs = FakeObs(p, 1.0 if i < 7 else 0.0, rng)
            if i >= 6:
                obs.joint_velocities = np.zeros(7)
            self._obs.append(obs)

    def __len__(self):
        return len(self._obs)

    def __getitem__(self, i):
        return self._obs[i]

    def __iter__(self):
        return iter(self._obs)


class FakeTask:
    """step() raises `raises` (a list of exception factories) in order,
    then succeeds."""

    def __init__(self, rng, raises=()):
        self._rng = rng
        self._raises = list(raises)
        self.steps = 0

    def variation_count(self):
        return 1

    def set_variation(self, v):
        pass

    def reset_to_demo(self, demo):
        return ["stub goal"], FakeObs(demo[0].gripper_pose, 1.0, self._rng)

    def step(self, action, collision_checking=False):
        self.steps += 1
        if self._raises:
            raise self._raises.pop(0)()
        pose = np.asarray(action[:7], np.float64)
        obs = FakeObs(pose, float(action[7] > 0.5), self._rng)
        reward = float(np.linalg.norm(pose[:3] - GOAL) < 0.2)
        return obs, reward, False, []


class FakeSimEnv:
    def __init__(self, rng, raises=()):
        self._rng = rng
        self._raises = raises
        self.task = None

    def launch(self):
        pass

    def shutdown(self):
        pass

    def get_task(self, task_type):
        self.task = FakeTask(self._rng, self._raises)
        return self.task

    def get_demos(self, task_name, variation_number, amount,
                  from_episode_number, random_selection):
        return [FakeDemo(self._rng)]


class StubActioner:
    """Returns a straight-line trajectory to GOAL — no models involved."""

    def __init__(self, traj_len=4):
        self._traj_len = traj_len

    def load_episode(self, task_str, variation):
        pass

    def predict(self, rgb, pcd, gripper, gt_action=None, trajectory_mask=None):
        start = np.asarray(gripper)[0, :3]
        pos = np.linspace(start, GOAL, self._traj_len)
        quat = np.tile([0, 0, 0, 1.0], (self._traj_len, 1))
        grip = np.ones((self._traj_len, 1))
        traj = np.concatenate([pos, quat, grip], axis=-1).astype(np.float32)
        action = traj[-1:].copy()
        return {"action": action, "trajectory": traj[None]}


def make_env(rng, raises=()):
    return RLBenchEnv(
        data_path="/nonexistent",
        image_size=IMAGE,
        apply_cameras=("left_shoulder",),
        env=FakeSimEnv(rng, raises),
    )


def run_eval(env, **kw):
    return env.evaluate_task_on_multiple_variations(
        "stub_task", max_steps=2, num_variations=1, num_demos=1,
        actioner=StubActioner(), max_tries=1,
        dense_interpolation=True, interpolation_length=4, **kw,
    )


def test_eval_succeeds_without_models(rng):
    # num_demos//variations + 1 = 2 demos run; the per-variation value is a
    # compensated success count (reference utils_with_rlbench.py:736-742)
    rates = run_eval(make_env(rng))
    assert rates["mean"] == 2.0


def test_ik_error_on_one_pose_is_skipped(rng):
    # the first sim step raises IKError; the loop must continue down the
    # trajectory and still reach the goal
    env = make_env(rng, raises=[IKError])
    rates = run_eval(env)
    assert rates["mean"] == 2.0
    assert env.env.task.steps > 1


def test_non_sim_exception_propagates(rng):
    # a genuine bug (here: ValueError) must NOT be swallowed as a failed demo
    env = make_env(rng, raises=[ValueError])
    with pytest.raises(ValueError):
        run_eval(env)


class FakeCam:
    def __init__(self, rng):
        self._rng = rng

    def capture_rgb(self):
        return self._rng.uniform(0, 1, (48, 64, 3))

    def get_pose(self):
        return np.zeros(7)

    def set_pose(self, p):
        pass


def test_video_recording_writes_mp4(rng, tmp_path):
    recorder = TaskRecorder(
        cameras=("left_shoulder",),
        cam_motion=StaticCameraMotion(FakeCam(rng)),
        fps=5,
        pcd_overlay=True,
    )
    env = make_env(rng)
    rates = run_eval(
        env, record_videos=True, num_videos=1, log_dir=tmp_path,
        recorder=recorder,
    )
    assert rates["mean"] == 2.0
    videos = sorted((tmp_path / "videos").glob("*.mp4"))
    names = [v.name for v in videos]
    assert any("stub_task_ep0" in n and "_pcd" not in n for n in names)
    assert any(n.endswith("_pcd.mp4") for n in names)
    # non-trivial files
    assert all(v.stat().st_size > 1000 for v in videos)
