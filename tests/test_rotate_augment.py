"""Rotate augmentation correctness (quaternion xyzw layout handling).

The reference ships with yaw augmentation disabled (dataset_engine.py:80
asserts yaw == 0) but the implementation exists (datasets/utils.py:103-181)
and the xyzw→wxyz quirk it guards is called out in SURVEY §7 hard parts —
so pin the geometry here.
"""

import numpy as np

from act3d_tpu.data.augment import Rotate, _quat_xyzw_to_matrix


def _apply_quat_xyzw(q, p):
    m = _quat_xyzw_to_matrix(q[None])[0]
    return m @ p


def test_rotate_consistency(rng):
    bounds = np.array([[-10.0, -10.0, -10.0], [10.0, 10.0, 10.0]])
    rot = Rotate(bounds, yaw_range=45.0, rng=np.random.default_rng(3))

    T, ncam, H = 2, 1, 4
    pcds = rng.normal(size=(T, ncam, 3, H, H)).astype(np.float64)
    q = rng.normal(size=(T, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    gripper = np.concatenate(
        [rng.normal(size=(T, 3)), q, np.ones((T, 1))], axis=-1
    )
    action = gripper.copy()
    traj = np.tile(gripper[:, None, :], (1, 5, 1))

    p2, g2, a2, t2 = rot(pcds.copy(), gripper.copy(), action.copy(), traj.copy())

    # something rotated
    assert not np.allclose(g2[:, :3], gripper[:, :3])

    # the point cloud and the gripper position rotated by the same matrix:
    # distances between any pcd point and the gripper are preserved
    d_before = np.linalg.norm(
        pcds[0, 0, :, 0, 0] - gripper[0, :3]
    )
    d_after = np.linalg.norm(p2[0, 0, :, 0, 0] - g2[0, :3])
    np.testing.assert_allclose(d_before, d_after, rtol=1e-6)

    # orientation consistency: the rotated quaternion applied to e_x equals
    # the yaw matrix applied to (original quaternion applied to e_x)
    ex = np.array([1.0, 0.0, 0.0])
    before_dir = _apply_quat_xyzw(gripper[0, 3:7], ex)
    after_dir = _apply_quat_xyzw(g2[0, 3:7], ex)
    # recover the applied yaw from positions
    # (positions are nonzero with overwhelming probability)
    def yaw_of(v, w):
        return np.arctan2(w[1], w[0]) - np.arctan2(v[1], v[0])

    yaw = yaw_of(gripper[0, :3], g2[0, :3])
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    np.testing.assert_allclose(after_dir, m @ before_dir, atol=1e-6)

    # z components unchanged by yaw
    np.testing.assert_allclose(g2[:, 2], gripper[:, 2], atol=1e-9)
    # trajectory transformed the same way as the gripper (same pose here)
    np.testing.assert_allclose(t2[0, 0], g2[0], atol=1e-9)


def test_rotate_disabled_is_identity(rng):
    bounds = np.array([[-1.0] * 3, [1.0] * 3])
    rot = Rotate(bounds, yaw_range=0.0)
    pcds = rng.normal(size=(1, 1, 3, 2, 2))
    gripper = rng.normal(size=(1, 8))
    action = rng.normal(size=(1, 8))
    p2, g2, a2, t2 = rot(pcds, gripper, action, None)
    assert p2 is pcds and g2 is gripper and a2 is action and t2 is None
