"""Property and round-trip tests for act3d_tpu.ops.rotations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from act3d_tpu.ops import rotations as R


def random_quats(rng, n=64):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quaternion_matrix_round_trip(rng):
    q = random_quats(rng)
    m = R.quaternion_to_matrix(q)
    q2 = R.matrix_to_quaternion(m)
    # q and -q are the same rotation
    q_std = R.standardize_quaternion(jnp.asarray(q))
    q2_std = R.standardize_quaternion(q2)
    np.testing.assert_allclose(q_std, q2_std, atol=1e-5)


def test_matrix_is_rotation(rng):
    q = random_quats(rng)
    m = np.asarray(R.quaternion_to_matrix(q))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_quaternion_apply_matches_matrix(rng):
    q = random_quats(rng, 16)
    p = rng.normal(size=(16, 3)).astype(np.float32)
    via_q = R.quaternion_apply(q, p)
    via_m = np.einsum("bij,bj->bi", np.asarray(R.quaternion_to_matrix(q)), p)
    np.testing.assert_allclose(via_q, via_m, atol=1e-5)


def test_quaternion_multiply_compose(rng):
    qa = random_quats(rng, 16)
    qb = random_quats(rng, 16)
    p = rng.normal(size=(16, 3)).astype(np.float32)
    lhs = R.quaternion_apply(R.quaternion_raw_multiply(qa, qb), p)
    rhs = R.quaternion_apply(qa, R.quaternion_apply(qb, p))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_euler_round_trip(rng):
    for convention in ["XYZ", "ZYX", "XZX"]:
        angles = rng.uniform(-1.0, 1.0, size=(32, 3)).astype(np.float32)
        m = R.euler_angles_to_matrix(angles, convention)
        angles2 = R.matrix_to_euler_angles(m, convention)
        m2 = R.euler_angles_to_matrix(angles2, convention)
        np.testing.assert_allclose(m, m2, atol=1e-4)


def test_axis_angle_round_trip(rng):
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    q = R.axis_angle_to_quaternion(aa)
    aa2 = R.quaternion_to_axis_angle(q)
    np.testing.assert_allclose(aa, aa2, atol=1e-4)


def test_ortho6d_round_trip(rng):
    q = random_quats(rng)
    m = R.quaternion_to_matrix(q)
    six = R.ortho6d_from_rotation_matrix(m)
    m2 = R.rotation_matrix_from_ortho6d(six)
    np.testing.assert_allclose(m, m2, atol=1e-5)


def test_ortho6d_column_convention():
    # Identity rotation -> 6d is the first two basis vectors e1, e2.
    six = R.ortho6d_from_rotation_matrix(jnp.eye(3))
    np.testing.assert_allclose(six, np.array([1, 0, 0, 0, 1, 0], np.float32))
    m = R.rotation_matrix_from_ortho6d(jnp.asarray([2.0, 0, 0, 0, 3.0, 0]))
    np.testing.assert_allclose(m, np.eye(3), atol=1e-6)


def test_gram_schmidt_orthonormal(rng):
    m = rng.normal(size=(16, 3, 3)).astype(np.float32)
    o = np.asarray(R.orthonormalize_by_gram_schmidt(m))
    eye = np.einsum("bji,bjk->bik", o, o)  # columns orthonormal
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)


def test_quat_layout_conversion():
    q_xyzw = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    q_wxyz = R.quat_xyzw_to_wxyz(q_xyzw)
    np.testing.assert_allclose(q_wxyz, [[4.0, 1.0, 2.0, 3.0]])
    np.testing.assert_allclose(R.quat_wxyz_to_xyzw(q_wxyz), q_xyzw)


def test_normalise_quat_zero_safe():
    q = jnp.zeros((2, 4))
    out = R.normalise_quat(q)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("fn", [R.matrix_to_quaternion, R.quaternion_to_matrix])
def test_jittable(fn, rng):
    q = random_quats(rng, 8)
    arg = q if fn is R.quaternion_to_matrix else np.asarray(
        R.quaternion_to_matrix(q)
    )
    jitted = jax.jit(fn)
    np.testing.assert_allclose(jitted(arg), fn(arg), atol=1e-6)
