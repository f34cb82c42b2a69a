"""End-to-end closed-loop evaluation test with a fake simulator.

Drives RLBenchEnv._evaluate_task_on_one_variation with tiny real models
(Act3D + DiffusionPlanner through the jitted Actioner) against a faked
task environment — the full chained pipeline without CoppeliaSim.
"""

import numpy as np
import pytest

import jax

IMAGE = (128, 128)
NCAM = 1
BOUNDS = ((-0.5, -0.5, 0.5), (0.5, 0.5, 1.5))
GOAL = np.array([0.2, 0.1, 1.0])


class FakeObs:
    def __init__(self, pose, gripper_open, rng):
        self.gripper_pose = np.asarray(pose, np.float64)
        self.gripper_open = gripper_open
        self.joint_velocities = rng.normal(size=7)
        h, w = IMAGE
        self.left_shoulder_rgb = (
            rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        )
        self.left_shoulder_point_cloud = rng.uniform(
            -0.4, 1.4, (h, w, 3)
        ).astype(np.float32)
        self.misc = {}


class FakeDemo:
    """A two-keyframe demo: move to GOAL, close the gripper at the end."""

    def __init__(self, rng):
        poses = np.linspace(
            np.array([0.0, 0.0, 0.8, 0, 0, 0, 1]),
            np.concatenate([GOAL, [0, 0, 0, 1]]),
            12,
        )
        self._observations = []
        for i, p in enumerate(poses):
            obs = FakeObs(p, 1.0 if i < 11 else 0.0, rng)
            # arm "stops" at the final pose
            if i >= 10:
                obs.joint_velocities = np.zeros(7)
            self._observations.append(obs)

    def __len__(self):
        return len(self._observations)

    def __getitem__(self, i):
        return self._observations[i]

    def __iter__(self):
        return iter(self._observations)


class FakeTask:
    def __init__(self, rng):
        self._rng = rng
        self.pose = np.array([0.0, 0.0, 0.8, 0, 0, 0, 1.0])
        self.steps = 0

    def variation_count(self):
        return 1

    def set_variation(self, v):
        pass

    def reset_to_demo(self, demo):
        self.pose = demo[0].gripper_pose.copy()
        return ["pick the red cup"], FakeObs(self.pose, 1.0, self._rng)

    def step(self, action, collision_checking=False):
        self.steps += 1
        self.pose = np.asarray(action[:7], np.float64)
        obs = FakeObs(self.pose, float(action[7] > 0.5), self._rng)
        reward = float(np.linalg.norm(self.pose[:3] - GOAL) < 0.2)
        return obs, reward, False, []


class FakeSimEnv:
    def __init__(self, rng):
        self._rng = rng
        self.launched = False

    def launch(self):
        self.launched = True

    def shutdown(self):
        pass

    def get_task(self, task_type):
        return FakeTask(self._rng)

    def get_demos(self, task_name, variation_number, amount,
                  from_episode_number, random_selection):
        return [FakeDemo(self._rng)]


@pytest.mark.slow
def test_closed_loop_chained_eval(rng):
    from act3d_tpu.eval.actioner import Actioner
    from act3d_tpu.eval.rlbench_env import RLBenchEnv
    from act3d_tpu.models import Act3D, DiffusionPlanner

    keypose = Act3D(
        image_size=IMAGE, embedding_dim=24, num_ghost_points=24,
        num_ghost_points_val=48, num_sampling_level=2,
        gripper_loc_bounds=BOUNDS, use_instruction=True,
    )
    traj = DiffusionPlanner(
        image_size=IMAGE, embedding_dim=24, num_query_cross_attn_layers=3,
        use_goal=True, use_goal_at_test=False, use_instruction=True,
        diffusion_timesteps=3, gripper_loc_bounds=BOUNDS,
    )
    import jax.numpy as jnp

    rgb = rng.uniform(0, 1, (1, NCAM, 3, *IMAGE)).astype(np.float32)
    pcd = rng.uniform(-0.4, 1.4, (1, NCAM, 3, *IMAGE)).astype(np.float32)
    grip = rng.uniform(0, 1, (1, 8)).astype(np.float32)
    instr = rng.normal(size=(1, 53, 512)).astype(np.float32)
    kp_vars = keypose.init(
        jax.random.PRNGKey(0), rgb, pcd, instr, grip,
        sample_rng=jax.random.PRNGKey(1), train_mode=False,
    )
    L = 6
    tj_vars = traj.init(
        jax.random.PRNGKey(0), jnp.zeros((1, L, 7)), jnp.zeros((1, L), bool),
        rgb, pcd, instr, grip[:, :7], grip[:, :7],
        noise_rng=jax.random.PRNGKey(1),
    )
    actioner = Actioner(
        keypose_model=keypose, keypose_params=kp_vars["params"],
        traj_model=traj, traj_params=tj_vars["params"],
        instructions={"pick_and_lift": {0: instr}},
    )

    env = RLBenchEnv(
        data_path="/nonexistent",
        image_size=IMAGE,
        apply_cameras=("left_shoulder",),
        env=FakeSimEnv(rng),
    )
    rates = env.evaluate_task_on_multiple_variations(
        "pick_and_lift",
        max_steps=2,
        num_variations=1,
        num_demos=1,
        actioner=actioner,
        max_tries=1,
        dense_interpolation=True,
        interpolation_length=L,
    )
    assert "mean" in rates
    assert 0.0 <= rates["mean"] <= 1.0
    # the pipeline actually stepped the fake simulator
    assert env.env.launched
