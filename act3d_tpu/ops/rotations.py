"""Rotation math in pure JAX.

TPU-native re-implementation of the rotation utilities the reference framework
vendors from PyTorch3D (reference: utils/pytorch3d_transforms.py:44-618) plus the
continuous-6D helpers (reference: model/utils/utils.py:95-199).

Conventions (identical to the reference):
  * quaternions are real-first ``(w, x, y, z)`` unless a function name says
    otherwise.  RLBench stores ``(x, y, z, w)``; see :func:`quat_xyzw_to_wxyz`.
  * rotation matrices act on column vectors: ``p' = R @ p``.
  * the 6D representation used by the diffusion models is the *column*
    convention of Zhou et al. (reference model/utils/utils.py:117-139): the 6
    numbers are the first two columns of R, flattened column-major.

Everything is shape-polymorphic over leading batch dimensions and safe to use
under ``jit`` / ``vmap`` / ``grad``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "normalise_quat",
    "standardize_quaternion",
    "quat_xyzw_to_wxyz",
    "quat_wxyz_to_xyzw",
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "quaternion_multiply",
    "quaternion_invert",
    "quaternion_apply",
    "axis_angle_to_quaternion",
    "quaternion_to_axis_angle",
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "euler_angles_to_matrix",
    "matrix_to_euler_angles",
    "rotation_matrix_from_ortho6d",
    "ortho6d_from_rotation_matrix",
    "orthonormalize_by_gram_schmidt",
]


def normalise_quat(q: jax.Array) -> jax.Array:
    """Unit-normalise, clamping the norm away from zero.

    Mirrors reference model/utils/utils.py:51-52 (clamp min 1e-10).
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(q), axis=-1, keepdims=True))
    return q / jnp.maximum(norm, 1e-10)


def standardize_quaternion(q: jax.Array) -> jax.Array:
    """Force a non-negative real part (q and -q encode the same rotation)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_xyzw_to_wxyz(q: jax.Array) -> jax.Array:
    """RLBench/action layout (x, y, z, w) -> math layout (w, x, y, z).

    The dataset stores xyzw and the reference reorders with ``[6,3,4,5]``
    before calling PyTorch3D ops (reference datasets/utils.py:168-181).
    """
    return jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)


def quat_wxyz_to_xyzw(q: jax.Array) -> jax.Array:
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def quaternion_to_matrix(quaternions: jax.Array) -> jax.Array:
    """(…, 4) wxyz quaternions -> (…, 3, 3) rotation matrices."""
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with a zero subgradient at x=0."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """(…, 3, 3) rotations -> (…, 4) wxyz quaternions.

    Numerically-stable candidate-selection algorithm (same maths as the
    reference's vendored PyTorch3D ``matrix_to_quaternion``): four candidate
    quaternions are formed, one per diagonal combination, and the
    best-conditioned one (largest |component|) is selected.
    """
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    flr = jnp.asarray(0.1, dtype=matrix.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    one_hot = jax.nn.one_hot(best, 4, dtype=matrix.dtype)
    return jnp.sum(quat_candidates * one_hot[..., None], axis=-2)


def quaternion_raw_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    ow = aw * bw - ax * bx - ay * by - az * bz
    ox = aw * bx + ax * bw + ay * bz - az * by
    oy = aw * by - ax * bz + ay * bw + az * bx
    oz = aw * bz + ax * by - ay * bx + az * bw
    return jnp.stack([ow, ox, oy, oz], axis=-1)


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose rotations (a then applied after b), standardized sign."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_apply(quaternion: jax.Array, point: jax.Array) -> jax.Array:
    """Rotate (…, 3) points by (…, 4) wxyz unit quaternions."""
    real_part = jnp.zeros_like(point[..., :1])
    point_q = jnp.concatenate([real_part, point], axis=-1)
    out = quaternion_raw_multiply(
        quaternion_raw_multiply(quaternion, point_q),
        quaternion_invert(quaternion),
    )
    return out[..., 1:]


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half_angles = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_angles = jnp.where(small, 1.0, angles)
    # Taylor: sin(x/2)/x ~ 1/2 - x^2/48
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / safe_angles,
    )
    return jnp.concatenate(
        [jnp.cos(half_angles), axis_angle * sin_half_over_angle], axis=-1
    )


def quaternion_to_axis_angle(quaternions: jax.Array) -> jax.Array:
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_angles = jnp.where(small, 1.0, angles)
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / safe_angles,
    )
    return quaternions[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def _axis_angle_rotation(axis: str, angle: jax.Array) -> jax.Array:
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jax.Array, convention: str) -> jax.Array:
    """(…, 3) euler angles -> (…, 3, 3), e.g. convention='XYZ'."""
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"invalid convention {convention}")
    matrices = [
        _axis_angle_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    # tiny 3x3 matmuls: full f32 precision (default precision truncates to
    # bf16 passes and breaks the 1e-3 parity budget)
    mm = functools.partial(jnp.matmul, precision="highest")
    return functools.reduce(mm, matrices)


def _angle_from_tan(
    axis: str, other_axis: str, data: jax.Array, horizontal: bool, tait_bryan: bool
) -> jax.Array:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def _index_from_letter(letter: str) -> int:
    return "XYZ".index(letter)


def matrix_to_euler_angles(matrix: jax.Array, convention: str) -> jax.Array:
    """(…, 3, 3) -> (…, 3) euler angles in the given convention."""
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"invalid convention {convention}")
    i0 = _index_from_letter(convention[0])
    i2 = _index_from_letter(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central_angle = jnp.arcsin(
            jnp.clip(
                matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0),
                -1.0,
                1.0,
            )
        )
    else:
        central_angle = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0, 1.0))

    o = (
        _angle_from_tan(
            convention[0], convention[1], matrix[..., i2], False, tait_bryan
        ),
        central_angle,
        _angle_from_tan(
            convention[2], convention[1], matrix[..., i0, :], True, tait_bryan
        ),
    )
    return jnp.stack(o, axis=-1)


def _normalize_vector(v: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Matches reference normalize_vector (model/utils/utils.py:95-105)."""
    mag = jnp.sqrt(jnp.sum(jnp.square(v), axis=-1, keepdims=True))
    return v / jnp.maximum(mag, eps)


def rotation_matrix_from_ortho6d(ortho6d: jax.Array) -> jax.Array:
    """(…, 6) -> (…, 3, 3), column convention of Zhou et al.

    The 6 numbers are raw first/second columns; output columns are the
    Gram-Schmidt frame (x, y, z).  Matches reference
    ``compute_rotation_matrix_from_ortho6d`` (model/utils/utils.py:117-130)
    but batched over arbitrary leading dims.
    """
    x_raw = ortho6d[..., 0:3]
    y_raw = ortho6d[..., 3:6]
    x = _normalize_vector(x_raw)
    z = _normalize_vector(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns


def ortho6d_from_rotation_matrix(matrix: jax.Array) -> jax.Array:
    """(…, 3, 3) -> (…, 6): first two columns, flattened column-major.

    Matches reference ``get_ortho6d_from_rotation_matrix``
    (model/utils/utils.py:133-139).
    """
    return jnp.concatenate([matrix[..., :, 0], matrix[..., :, 1]], axis=-1)


def rotation_from_svd(
    points1: jax.Array,
    points2: jax.Array,
    center1: jax.Array | None = None,
    center2: jax.Array | None = None,
) -> jax.Array:
    """Least-squares rotation aligning points2 to points1 via SVD
    (Kabsch; reference model/utils/utils.py:163-199).

    points1/points2: (..., npts, 3); optional explicit centers (..., 3).
    Returns (..., 3, 3) proper rotations (det +1).
    """
    if center1 is None:
        points1 = points1 - jnp.mean(points1, axis=-2, keepdims=True)
    else:
        points1 = points1 - center1[..., None, :]
    if center2 is None:
        points2 = points2 - jnp.mean(points2, axis=-2, keepdims=True)
    else:
        points2 = points2 - center2[..., None, :]

    h = jnp.matmul(
        jnp.swapaxes(points2, -2, -1), points1, precision="highest"
    )
    u, _, vh = jnp.linalg.svd(h)
    v = jnp.swapaxes(vh, -2, -1)
    r = jnp.matmul(v, jnp.swapaxes(u, -2, -1), precision="highest")
    # reflection fix: flip V's last column where det < 0
    neg = jnp.linalg.det(r)[..., None, None] < 0
    v_fixed = jnp.concatenate([v[..., :2], jnp.where(neg, -v[..., 2:], v[..., 2:])], axis=-1)
    return jnp.matmul(v_fixed, jnp.swapaxes(u, -2, -1), precision="highest")


def orthonormalize_by_gram_schmidt(matrix: jax.Array) -> jax.Array:
    """Gram-Schmidt over the columns of (…, 3, 3) (reference utils.py:142-160)."""
    a1, a2, a3 = matrix[..., :, 0], matrix[..., :, 1], matrix[..., :, 2]
    b1 = _normalize_vector(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _normalize_vector(b2)
    b3 = (
        a3
        - jnp.sum(b1 * a3, axis=-1, keepdims=True) * b1
        - jnp.sum(b2 * a3, axis=-1, keepdims=True) * b2
    )
    b3 = _normalize_vector(b3)
    return jnp.stack([b1, b2, b3], axis=-1)
