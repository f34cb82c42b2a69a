"""Eval-layer tests: keypoint discovery, Mover, Actioner (tiny models),
obs projection, video writer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ------------------------------------------------------- keypoint discovery


def test_keypoint_discovery_gripper_change_and_end():
    from act3d_tpu.eval.keypoint import keypoint_discovery_arrays

    n = 20
    gripper = np.ones(n)
    gripper[10:] = 0.0  # toggle at frame 10
    vel = np.ones((n, 7))  # never stopped
    kps = keypoint_discovery_arrays(gripper, vel)
    assert kps == [10, n - 1]


def test_keypoint_discovery_stopped_frames():
    from act3d_tpu.eval.keypoint import keypoint_discovery_arrays

    n = 30
    gripper = np.ones(n)
    vel = np.ones((n, 7))
    vel[15] = 0.0  # momentarily stopped mid-episode
    kps = keypoint_discovery_arrays(gripper, vel)
    assert 15 in kps and (n - 1) in kps


def test_keypoint_discovery_dedups_adjacent_final():
    from act3d_tpu.eval.keypoint import keypoint_discovery_arrays

    n = 10
    gripper = np.ones(n)
    gripper[n - 1] = 0.0  # toggle right at the end -> keypoint n-2? no:
    vel = np.ones((n, 7))
    kps = keypoint_discovery_arrays(gripper, vel)
    assert kps[-1] == n - 1


def test_keypoint_discovery_duck_typed_demo():
    from act3d_tpu.eval.keypoint import keypoint_discovery

    class Obs:
        def __init__(self, g, v):
            self.gripper_open = g
            self.joint_velocities = np.full(7, v)

    demo = [Obs(1.0, 1.0) for _ in range(8)] + [Obs(0.0, 1.0) for _ in range(4)]
    kps = keypoint_discovery(demo)
    assert kps == [8, 11]


# ------------------------------------------------------------------- Mover


class FakeObs:
    def __init__(self, pose):
        self.gripper_pose = np.asarray(pose, np.float64)
        self.gripper_open = 1.0


class FakeTask:
    """Task env whose gripper converges to the commanded pose after 2 steps."""

    def __init__(self):
        self.pose = np.zeros(7)
        self.calls = 0

    def step(self, action, collision_checking=False):
        self.calls += 1
        target = np.asarray(action[:7], np.float64)
        # move 60% of the way each call
        self.pose = self.pose + 0.6 * (target - self.pose)
        return FakeObs(self.pose), 0.0, False, []


def test_mover_retries_until_close():
    from act3d_tpu.eval.mover import Mover

    task = FakeTask()
    move = Mover(task, max_tries=10)
    action = np.concatenate([np.ones(3) * 0.1, [0, 0, 0, 1], [1.0]])
    obs, reward, terminate, images = move(action)
    # |0.1 * 0.4^k| < 5e-3 -> k >= 4 steps
    assert task.calls >= 3
    assert np.linalg.norm(obs.gripper_pose[:3] - 0.1) < 5e-3


def test_mover_defers_gripper_toggle():
    from act3d_tpu.eval.mover import Mover

    task = FakeTask()
    move = Mover(task, max_tries=3)
    a_open = np.concatenate([np.zeros(3), [0, 0, 0, 1], [1.0]])
    move(a_open.copy())
    calls_before = task.calls
    a_close = np.concatenate([np.ones(3) * 0.05, [0, 0, 0, 1], [0.0]])
    move(a_close.copy())
    # extra final step executes the deferred gripper toggle
    assert task.calls > calls_before + 1


# ------------------------------------------------------------------ Actioner


def test_actioner_chained_prediction(rng):
    from act3d_tpu.eval.actioner import Actioner
    from act3d_tpu.models import Act3D, DiffusionPlanner

    bounds = ((-0.5, -0.5, 0.5), (0.5, 0.5, 1.5))
    image = (128, 128)
    keypose = Act3D(
        image_size=image, embedding_dim=24, num_ghost_points=24,
        num_ghost_points_val=48, num_sampling_level=2,
        gripper_loc_bounds=bounds, use_instruction=True,
    )
    traj = DiffusionPlanner(
        image_size=image, embedding_dim=24, num_query_cross_attn_layers=3,
        use_goal=True, use_goal_at_test=False, use_instruction=True,
        diffusion_timesteps=3, gripper_loc_bounds=bounds,
    )
    rgb = rng.uniform(0, 1, (1, 1, 3, *image)).astype(np.float32)
    pcd = rng.uniform(-0.4, 1.4, (1, 1, 3, *image)).astype(np.float32)
    grip = rng.uniform(0, 1, (1, 8)).astype(np.float32)
    instr = rng.normal(size=(1, 53, 512)).astype(np.float32)
    kp_vars = keypose.init(
        jax.random.PRNGKey(0), rgb, pcd, instr, grip,
        sample_rng=jax.random.PRNGKey(1), train_mode=False,
    )
    t = np.zeros((1, 6, 7), np.float32)
    mask = np.zeros((1, 6), bool)
    tj_vars = traj.init(
        jax.random.PRNGKey(0), jnp.asarray(t), jnp.asarray(mask),
        rgb, pcd, instr, grip[:, :7], grip[:, :7],
        noise_rng=jax.random.PRNGKey(1),
    )

    actioner = Actioner(
        keypose_model=keypose, keypose_params=kp_vars["params"],
        traj_model=traj, traj_params=tj_vars["params"],
        instructions={"pick_and_lift": {0: instr}},
    )
    actioner.load_episode("pick_and_lift", 0)
    out = actioner.predict(
        rgb * 2 - 1, pcd, grip, trajectory_mask=mask
    )
    assert out["action"].shape == (1, 8)  # pos3 + quat4 + gripper1
    assert out["trajectory"].shape == (1, 6, 7)
    assert np.isfinite(out["action"]).all()
    assert np.isfinite(out["trajectory"]).all()
    # chained conditioning: trajectory starts at the current gripper pose
    np.testing.assert_allclose(
        out["trajectory"][0, 0, :3], grip[0, :3], atol=1e-4
    )


def test_actioner_fused_dispatch_matches_two_dispatch(rng):
    """The single-XLA-program serving path (fused_dispatch=True, default)
    must produce the same actions/trajectories as the two-dispatch path for
    the same seed — the fusion saves a host round-trip, not semantics."""
    from act3d_tpu.eval.actioner import Actioner
    from act3d_tpu.models import Act3D, DiffusionPlanner

    bounds = ((-0.5, -0.5, 0.5), (0.5, 0.5, 1.5))
    image = (128, 128)
    keypose = Act3D(
        image_size=image, embedding_dim=24, num_ghost_points=24,
        num_ghost_points_val=48, num_sampling_level=2,
        gripper_loc_bounds=bounds, use_instruction=True,
    )
    traj = DiffusionPlanner(
        image_size=image, embedding_dim=24, num_query_cross_attn_layers=3,
        use_goal=True, use_goal_at_test=False, use_instruction=True,
        diffusion_timesteps=3, gripper_loc_bounds=bounds,
    )
    rgb = rng.uniform(0, 1, (1, 1, 3, *image)).astype(np.float32)
    pcd = rng.uniform(-0.4, 1.4, (1, 1, 3, *image)).astype(np.float32)
    grip = rng.uniform(0, 1, (1, 8)).astype(np.float32)
    instr = rng.normal(size=(1, 53, 512)).astype(np.float32)
    kp_vars = keypose.init(
        jax.random.PRNGKey(0), rgb, pcd, instr, grip,
        sample_rng=jax.random.PRNGKey(1), train_mode=False,
    )
    t = np.zeros((1, 6, 7), np.float32)
    mask = np.zeros((1, 6), bool)
    tj_vars = traj.init(
        jax.random.PRNGKey(0), jnp.asarray(t), jnp.asarray(mask),
        rgb, pcd, instr, grip[:, :7], grip[:, :7],
        noise_rng=jax.random.PRNGKey(1),
    )

    outs = []
    for fused in (True, False):
        actioner = Actioner(
            keypose_model=keypose, keypose_params=kp_vars["params"],
            traj_model=traj, traj_params=tj_vars["params"],
            instructions={"pick_and_lift": {0: instr}},
            seed=7, fused_dispatch=fused,
        )
        actioner._rng = np.random.default_rng(7)  # same instruction pick
        actioner.load_episode("pick_and_lift", 0)
        outs.append(
            actioner.predict(rgb * 2 - 1, pcd, grip, trajectory_mask=mask)
        )
    np.testing.assert_allclose(
        outs[0]["action"], outs[1]["action"], atol=1e-5
    )
    np.testing.assert_allclose(
        outs[0]["trajectory"], outs[1]["trajectory"], atol=1e-5
    )


# ------------------------------------------------------------------- video


def test_video_recorder_writes_mp4(tmp_path, rng):
    from act3d_tpu.eval.video import StaticCameraMotion, TaskRecorder

    class FakeCam:
        def capture_rgb(self):
            return rng.uniform(0, 1, (32, 48, 3))

        def get_pose(self):
            return np.zeros(7)

        def set_pose(self, p):
            pass

    rec = TaskRecorder(cam_motion=StaticCameraMotion(FakeCam()), fps=5)
    for _ in range(4):
        rec.take_snap()
    out = rec.save(tmp_path / "demo", lang_goal="pick the cup")
    import os

    assert out is not None and os.path.getsize(out) > 0


# -------------------------------------------------------------- collectives


def test_synchronize_single_process():
    from act3d_tpu.parallel.collectives import synchronize_between_processes

    out = synchronize_between_processes({"a": np.array([1.0, 2.0])})
    np.testing.assert_allclose(out["a"], [1.0, 2.0])


def test_obs_to_attn_projection():
    from act3d_tpu.eval.rlbench_env import obs_to_attn

    class Obs:
        gripper_pose = np.array([0.0, 0.0, 2.0, 0, 0, 0, 1])
        misc = {
            "cam_camera_extrinsics": np.eye(4),
            "cam_camera_intrinsics": np.array(
                [[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1.0]]
            ),
        }

    u, v = obs_to_attn(Obs(), "cam")
    assert (u, v) == (64, 64)  # on-axis point projects to principal point
