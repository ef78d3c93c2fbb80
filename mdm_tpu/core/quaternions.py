"""Quaternion algebra in JAX (w, x, y, z convention).

Behavior-parity target: the torch/numpy twins in the reference repo
(`/root/reference/data_loaders/humanml/common/quaternion.py`). All functions
here are pure, broadcast over arbitrary leading dims, and are safe under
`jax.jit` / `vmap` / `grad`.

Design notes (TPU):
- Everything is expressed as elementwise VPU math on the last axis; no
  reshapes into batched matmuls (the reference's `qmul` uses `torch.bmm`
  outer products, which is wasteful — the expanded product form fuses
  into a handful of VPU ops under XLA).
- `qfix` (temporal sign continuity) is a cumulative parity over time,
  implemented with `cumsum % 2` rather than a Python loop.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "qinv",
    "qnormalize",
    "qmul",
    "qrot",
    "qbetween",
    "qfix",
    "qeuler",
    "euler_to_quaternion",
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "quaternion_to_cont6d",
    "cont6d_to_matrix",
    "expmap_to_quaternion",
    "qpow",
    "qslerp",
    "lerp",
]


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of unit quaternion(s) ``(..., 4)``."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to unit length.

    Matches the reference guard (quaternion.py:28-31) which biases the z
    component by 1e-4 before normalizing to avoid division by zero; kept
    for bit-level parity in the codec round-trip tests.
    """
    q = q.at[..., -1].add(1e-4)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q*r for ``(..., 4)`` tensors (broadcasting)."""
    qw, qx, qy, qz = jnp.split(q, 4, axis=-1)
    rw, rx, ry, rz = jnp.split(r, 4, axis=-1)
    return jnp.concatenate(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ],
        axis=-1,
    )


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``(..., 3)`` by quaternion(s) ``(..., 4)``.

    Uses the Rodrigues-style 2-cross-product form (same math as reference
    quaternion.py:56-75) which is 15 mul + 15 add on the VPU.
    """
    qw = q[..., :1]
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (qw * uv + uuv)


def qbetween(v0: jnp.ndarray, v1: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating v0 onto v1 (both ``(..., 3)``)."""
    v = jnp.cross(v0, v1)
    w = jnp.sqrt(
        (v0**2).sum(axis=-1, keepdims=True) * (v1**2).sum(axis=-1, keepdims=True)
    ) + (v0 * v1).sum(axis=-1, keepdims=True)
    return qnormalize(jnp.concatenate([w, v], axis=-1))


def qfix(q: np.ndarray) -> np.ndarray:
    """Enforce sign continuity along axis 0 of ``(L, J, 4)``.

    Host-side preprocessing helper (numpy): select q or -q per frame so
    consecutive frames have non-negative dot product.
    """
    dots = np.sum(q[1:] * q[:-1], axis=-1)
    flip = (np.cumsum(dots < 0, axis=0) % 2).astype(bool)
    out = q.copy()
    out[1:][flip] *= -1
    return out


def qeuler(
    q: jnp.ndarray, order: str, epsilon: float = 0.0, deg: bool = False
) -> jnp.ndarray:
    """Quaternion -> Euler angles for the given axis order.

    Radians by default; ``deg=True`` matches the reference's default output
    units (quaternion.py:78-127).
    """
    q0, q1, q2, q3 = (q[..., i] for i in range(4))
    clip = lambda x: jnp.clip(x, -1.0 + epsilon, 1.0 - epsilon)
    if order == "xyz":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = jnp.arcsin(clip(2 * (q1 * q3 + q0 * q2)))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    elif order == "yzx":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = jnp.arcsin(clip(2 * (q1 * q2 + q0 * q3)))
    elif order == "zxy":
        x = jnp.arcsin(clip(2 * (q0 * q1 + q2 * q3)))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "xzy":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 + q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = jnp.arcsin(clip(2 * (q0 * q3 - q1 * q2)))
    elif order == "yxz":
        x = jnp.arcsin(clip(2 * (q0 * q1 - q2 * q3)))
        y = jnp.arctan2(2 * (q1 * q3 + q0 * q2), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q1 * q2 + q0 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "zyx":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = jnp.arcsin(clip(2 * (q0 * q2 - q1 * q3)))
        z = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    else:
        raise ValueError(f"unknown euler order {order!r}")
    out = jnp.stack([x, y, z], axis=-1)
    return out * (180.0 / jnp.pi) if deg else out


def euler_to_quaternion(e: jnp.ndarray, order: str, deg: bool = True) -> jnp.ndarray:
    """Euler angles ``(..., 3)`` -> quaternion ``(..., 4)``."""
    if deg:
        e = e * (jnp.pi / 180.0)
    x, y, z = e[..., 0], e[..., 1], e[..., 2]
    zero = jnp.zeros_like(x)
    axis_quats = {
        "x": jnp.stack([jnp.cos(x / 2), jnp.sin(x / 2), zero, zero], axis=-1),
        "y": jnp.stack([jnp.cos(y / 2), zero, jnp.sin(y / 2), zero], axis=-1),
        "z": jnp.stack([jnp.cos(z / 2), zero, zero, jnp.sin(z / 2)], axis=-1),
    }
    result = None
    for axis in order:
        result = axis_quats[axis] if result is None else qmul(result, axis_quats[axis])
    # Reference euler2quat flips the antipodal representation for these
    # orders (quaternion.py:209-211) — same rotation, but bit-level parity
    # of components matters for sign-continuity (qfix) over mixed data.
    if order in ("xyz", "yzx", "zxy"):
        result = -result
    return result


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion ``(..., 4)`` -> rotation matrix ``(..., 3, 3)``."""
    r, i, j, k = (q[..., n] for n in range(4))
    two_s = 2.0 / (q * q).sum(axis=-1)
    m = jnp.stack(
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
    return m.reshape(q.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``(..., 3, 3)`` -> quaternion ``(..., 4)``.

    Branch-free formulation (per-element candidate quaternions + best-trace
    selection) so it vectorizes on the VPU with no data-dependent control
    flow, unlike typical CPU implementations.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = jnp.stack(
        [
            _sqrt_positive_part(1.0 + m00 + m11 + m22),
            _sqrt_positive_part(1.0 + m00 - m11 - m22),
            _sqrt_positive_part(1.0 - m00 + m11 - m22),
            _sqrt_positive_part(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
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
    return jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]


def quaternion_to_cont6d(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> continuous 6D rep (first two matrix *columns*).

    NOTE: the HumanML codec's 6D convention stacks matrix columns
    (reference quaternion.py:316-319); this differs from the PyTorch3D
    row convention used for a2m training — see ``rotations.matrix_to_rotation_6d``.
    """
    mat = quaternion_to_matrix(q)
    return jnp.concatenate([mat[..., 0], mat[..., 1]], axis=-1)


def cont6d_to_matrix(c: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D (column convention) -> rotation matrix ``(..., 3, 3)``."""
    x_raw = c[..., 0:3]
    y_raw = c[..., 3:6]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def expmap_to_quaternion(e: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle / exponential map ``(..., 3)`` -> quaternion ``(..., 4)``.

    Stable half-angle sinc form (reference quaternion.py:216-232).
    """
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate([w, xyz], axis=-1)


def qpow(q0: jnp.ndarray, t) -> jnp.ndarray:
    """Quaternion power ``q0 ** t`` (reference quaternion.py:346-369).

    Scalar ``t`` -> ``q0.shape``; array ``t`` -> ``t.shape + q0.shape``
    (each power applied to every quaternion, as in the reference).
    """
    q0 = qnormalize(q0)
    theta0 = jnp.arccos(jnp.clip(q0[..., 0], -1.0, 1.0))
    theta0 = jnp.where(jnp.abs(theta0) <= 1e-9, 1e-9, theta0)
    v0 = q0[..., 1:] / jnp.sin(theta0)[..., None]
    t = jnp.asarray(t, q0.dtype)
    if t.ndim:
        theta = t.reshape(t.shape + (1,) * theta0.ndim) * theta0
        v0 = jnp.broadcast_to(v0, t.shape + v0.shape)
    else:
        theta = t * theta0
    return jnp.concatenate(
        [jnp.cos(theta)[..., None], v0 * jnp.sin(theta)[..., None]], axis=-1
    )


def qslerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation q0 -> q1 at point(s) ``t``
    (reference quaternion.py:371-385). Array ``t`` -> ``t.shape + q0.shape``.
    """
    q0 = qnormalize(q0)
    q1 = qnormalize(q1)
    q_ = qpow(qmul(q1, qinv(q0)), t)
    t = jnp.asarray(t)
    if t.ndim:
        q0 = jnp.broadcast_to(q0, t.shape + q0.shape)
    return qmul(q_, q0)


def lerp(p0: jnp.ndarray, p1: jnp.ndarray, t) -> jnp.ndarray:
    """Linear interpolation, result ``t.shape + p0.shape`` with ``t``
    promoted to at least rank 1 (reference quaternion.py:414-425)."""
    t = jnp.atleast_1d(jnp.asarray(t, p0.dtype))
    tb = t.reshape(t.shape + (1,) * p0.ndim)
    return p0 * (1.0 - tb) + p1 * tb
