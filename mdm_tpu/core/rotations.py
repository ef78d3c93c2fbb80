"""Rotation representation conversions in JAX.

Covers the conversion surface of the reference's PyTorch3D-derived
`utils/rotation_conversions.py` (quat <-> matrix, axis-angle <-> matrix/quat,
euler <-> matrix, rotation_6d <-> matrix) with the same conventions, so that
the a2m (rot6d) model family and its geometric losses are interchangeable.

rotation_6d here uses the PyTorch3D *row* convention (first two rows of the
matrix, Zhou et al. 2019) — distinct from the HumanML codec's column
convention in ``quaternions.quaternion_to_cont6d``.
"""
from __future__ import annotations

import jax.numpy as jnp

from .quaternions import quaternion_to_matrix

__all__ = [
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "axis_angle_to_quaternion",
    "quaternion_to_axis_angle",
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "euler_angles_to_matrix",
    "matrix_to_euler_angles",
    "rotation_6d_to_matrix",
    "matrix_to_rotation_6d",
    "standardize_quaternion",
    "quaternion_multiply",
    "quaternion_invert",
    "quaternion_apply",
    "random_quaternions",
    "random_rotations",
    "random_rotation",
]


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion with non-negative real part.

    Copysign formulation (the convention of the reference's
    rotation_conversions.py:98-120); branch-free on the VPU. For a
    numerically-robust variant near w==0 see
    ``quaternions.matrix_to_quaternion``.
    """
    m00 = matrix[..., 0, 0]
    m11 = matrix[..., 1, 1]
    m22 = matrix[..., 2, 2]
    sqrt_pos = lambda x: jnp.sqrt(jnp.maximum(x, 0.0))
    w = 0.5 * sqrt_pos(1.0 + m00 + m11 + m22)
    x = 0.5 * sqrt_pos(1.0 + m00 - m11 - m22)
    y = 0.5 * sqrt_pos(1.0 - m00 + m11 - m22)
    z = 0.5 * sqrt_pos(1.0 - m00 - m11 + m22)
    x = jnp.copysign(x, matrix[..., 2, 1] - matrix[..., 1, 2])
    y = jnp.copysign(y, matrix[..., 0, 2] - matrix[..., 2, 0])
    z = jnp.copysign(z, matrix[..., 1, 0] - matrix[..., 0, 1])
    return jnp.stack([w, x, y, z], axis=-1)


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real part is non-negative."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = (a[..., i : i + 1] for i in range(4))
    bw, bx, by, bz = (b[..., i : i + 1] for i in range(4))
    return jnp.concatenate(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_invert(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_apply(q: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    # Deliberately NOT aliased to quaternions.qrot: this is the PyTorch3D
    # cross-product form (reference rotation_conversions.py), qrot is the
    # reference quaternion.py form — different float op orders, and each
    # module's parity oracle pins its own reference file.
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, point)
    uuv = jnp.cross(qv, uv)
    return point + 2.0 * (qw * uv + uuv)


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle ``(..., 3)`` -> quaternion, small-angle-safe via Taylor branch."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # sin(x/2)/x: Taylor for tiny angles to stay differentiable at 0.
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angles)
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    norms = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, q[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles),
    )
    return q[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def _axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis!r}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Euler angles (radians, intrinsic, e.g. 'XYZ') -> rotation matrix."""
    mats = [
        _axis_rotation(axis, euler_angles[..., i])
        for i, axis in enumerate(convention)
    ]
    return mats[0] @ mats[1] @ mats[2]


def _angle_from_tan(
    axis: str, other_axis: str, data: jnp.ndarray, horizontal: bool, tait_bryan: bool
) -> jnp.ndarray:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str) -> jnp.ndarray:
    i0 = "XYZ".index(convention[0])
    i2 = "XYZ".index(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0), -1, 1)
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1, 1))
    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    )
    return jnp.stack(o, axis=-1)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rep (first two *rows*, Zhou et al.) -> rotation matrix.

    Hot path: this sits inside the a2m training loss graph (FK of every
    predicted frame), so it is pure VPU math with no normalize-by-branch.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - (b1 * a2).sum(axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def random_quaternions(key, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """``n`` uniform random unit quaternions with non-negative real part
    (reference rotation_conversions.py random_quaternions; PRNG key replaces
    torch's global generator)."""
    import jax

    q = jax.random.normal(key, (n, 4), dtype)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return standardize_quaternion(q)


def random_rotations(key, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """``n`` uniform random rotation matrices ``[n, 3, 3]``."""
    return quaternion_to_matrix(random_quaternions(key, n, dtype))


def random_rotation(key, dtype=jnp.float32) -> jnp.ndarray:
    """One uniform random rotation matrix ``[3, 3]``."""
    return random_rotations(key, 1, dtype)[0]
