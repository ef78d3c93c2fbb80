"""HumanML3D / KIT-ML motion feature codec ("hml_vec") in JAX.

The 263-d (HumanML, 22 joints) / 251-d (KIT, 21 joints) per-frame feature
vector is laid out as::

    [ root_rot_vel(1) | root_lin_vel_xz(2) | root_y(1)
      | ric (J-1)*3 | rot (J-1)*6 | local_vel J*3 | foot_contact(4) ]

This module provides the decode path used at every sampling call
(``recover_from_ric`` — cumulative-sum root integration + y-rotation of local
joints), the rotation-based decode (``recover_from_rot``), and the encode
path (``extract_features`` / ``process_file``) used for offline dataset
preprocessing and round-trip tests.

Decode is pure jnp (hot: called on every generated batch; cumsum along time
vectorizes on TPU). Encode is host numpy (offline IK + gaussian smoothing).

Reference behavior source: /root/reference/data_loaders/humanml/scripts/
motion_process.py:366-452 (decode), :43-355 (encode).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import quaternions as Q
from .skeleton import (
    KIT_FACE_JOINTS,
    Skeleton,
    T2M_FACE_JOINTS,
    kit_skeleton,
    t2m_skeleton,
)

__all__ = [
    "recover_root_rot_pos",
    "recover_from_ric",
    "recover_from_rot",
    "recover_rot",
    "recover_root_rot_heading_ang",
    "extract_features",
    "process_file",
    "feature_dim",
    "HML_JOINT_NAMES",
    "HML_EE_JOINT_NAMES",
]

HML_JOINT_NAMES = [
    "pelvis", "left_hip", "right_hip", "spine1", "left_knee", "right_knee",
    "spine2", "left_ankle", "right_ankle", "spine3", "left_foot", "right_foot",
    "neck", "left_collar", "right_collar", "head", "left_shoulder",
    "right_shoulder", "left_elbow", "right_elbow", "left_wrist", "right_wrist",
]
HML_EE_JOINT_NAMES = ["left_foot", "right_foot", "left_wrist", "right_wrist", "head"]


def feature_dim(joints_num: int) -> int:
    return 4 + (joints_num - 1) * 3 + (joints_num - 1) * 6 + joints_num * 3 + 4


def recover_root_rot_pos(data: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate root yaw + planar velocity into per-frame rotation/position.

    data: [..., T, D] hml features. Returns (r_rot_quat [..., T, 4],
    r_pos [..., T, 3]).
    """
    rot_vel = data[..., 0]
    # Frame t accumulates velocities of frames < t (exclusive prefix sum).
    shifted = jnp.concatenate(
        [jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1
    )
    r_rot_ang = jnp.cumsum(shifted, axis=-1)

    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack(
        [jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1
    )

    vel_xz = data[..., :-1, 1:3]  # planar velocity of frames < t
    zeros3 = jnp.zeros(data.shape[:-1] + (3,), dtype=data.dtype)
    r_pos_local = zeros3.at[..., 1:, 0].set(vel_xz[..., 0]).at[..., 1:, 2].set(vel_xz[..., 1])
    # Rotate each step's local velocity into the world frame, then integrate.
    r_pos = Q.qrot(Q.qinv(r_rot_quat), r_pos_local)
    r_pos = jnp.cumsum(r_pos, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data: jnp.ndarray, joints_num: int) -> jnp.ndarray:
    """Decode hml features to global joint positions.

    data: [..., T, D] -> joints [..., T, J, 3]. Jit/vmap/grad-safe.
    """
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4 : (joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))

    # Rotate local joints into the world frame by the inverse root yaw.
    inv_rot = Q.qinv(r_rot_quat)[..., None, :]
    positions = Q.qrot(jnp.broadcast_to(inv_rot, positions.shape[:-1] + (4,)), positions)

    positions = positions.at[..., 0].add(r_pos[..., None, 0])
    positions = positions.at[..., 2].add(r_pos[..., None, 2])
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def recover_from_rot(
    data: jnp.ndarray, joints_num: int, skeleton: Skeleton, offsets: jnp.ndarray
) -> jnp.ndarray:
    """Decode via the rotation channels + FK instead of the ric channels."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_rot_cont6d = Q.quaternion_to_cont6d(r_rot_quat)
    start = 1 + 2 + 1 + (joints_num - 1) * 3
    end = start + (joints_num - 1) * 6
    cont6d = data[..., start:end].reshape(data.shape[:-1] + (joints_num - 1, 6))
    cont6d = jnp.concatenate([r_rot_cont6d[..., None, :], cont6d], axis=-2)
    return skeleton.forward_kinematics_cont6d(cont6d, r_pos, offsets)


def recover_rot(data: jnp.ndarray) -> jnp.ndarray:
    """Extract per-joint cont6d params + padded root translation row.

    data [..., T, 263/251] -> [..., T, J+1, 6] (last row: root pos, zero-pad).
    """
    joints_num = 22 if data.shape[-1] == 263 else 21
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_rot_cont6d = Q.quaternion_to_cont6d(r_rot_quat)
    start = 1 + 2 + 1 + (joints_num - 1) * 3
    end = start + (joints_num - 1) * 6
    cont6d = data[..., start:end].reshape(data.shape[:-1] + (joints_num - 1, 6))
    cont6d = jnp.concatenate([r_rot_cont6d[..., None, :], cont6d], axis=-2)
    r_pos_pad = jnp.concatenate([r_pos, jnp.zeros_like(r_pos)], axis=-1)[..., None, :]
    return jnp.concatenate([cont6d, r_pos_pad], axis=-2)


def recover_root_rot_heading_ang(joints: jnp.ndarray) -> jnp.ndarray:
    """Heading angle (rad) from joint positions [B, J, 3] -> [B, 1].

    Matches the reference's post-bugfix joint order (motion_process.py:388-404).
    """
    r_hip, l_hip, sdr_r, sdr_l = 2, 1, 17, 16
    across = (joints[:, r_hip] - joints[:, l_hip]) + (joints[:, sdr_r] - joints[:, sdr_l])
    across = across / jnp.maximum(jnp.linalg.norm(across, axis=-1, keepdims=True), 1e-12)
    up = jnp.asarray([0.0, 1.0, 0.0], dtype=joints.dtype)
    forward = jnp.cross(jnp.broadcast_to(up, across.shape), across)
    forward = forward / jnp.maximum(jnp.linalg.norm(forward, axis=-1, keepdims=True), 1e-12)
    return jnp.arctan2(forward[:, 0], forward[:, 2])[:, None]


# ---------------------------------------------------------------------------
# Encode path (host-side, offline preprocessing + round-trip tests)
# ---------------------------------------------------------------------------

def _foot_contacts(positions: np.ndarray, fid_l, fid_r, thres: float):
    def contact(fid):
        d = positions[1:, fid] - positions[:-1, fid]
        return ((d**2).sum(axis=-1) < thres).astype(np.float32)

    return contact(fid_l), contact(fid_r)


def extract_features(
    positions: np.ndarray,
    feet_thre: float,
    skeleton: Skeleton,
    face_joints,
    fid_r,
    fid_l,
) -> np.ndarray:
    """Positions [T, J, 3] -> hml features [T-1, D]. Host numpy."""
    positions = positions.astype(np.float64).copy()
    global_positions = positions.copy()

    feet_l, feet_r = _foot_contacts(positions, fid_l, fid_r, feet_thre)

    quat_params = skeleton.inverse_kinematics(positions, face_joints, smooth_forward=True)
    cont6d = np.asarray(Q.quaternion_to_cont6d(jnp.asarray(quat_params, jnp.float32)))
    r_rot = quat_params[:, 0].copy()

    velocity = positions[1:, 0] - positions[:-1, 0]
    velocity = np.asarray(
        Q.qrot(jnp.asarray(r_rot[1:], jnp.float32), jnp.asarray(velocity, jnp.float32))
    )
    r_velocity = np.asarray(
        Q.qmul(jnp.asarray(r_rot[1:], jnp.float32), Q.qinv(jnp.asarray(r_rot[:-1], jnp.float32)))
    )

    # Root-relative ("rifke") local positions, all frames rotated to face Z+.
    positions[..., 0] -= positions[:, 0:1, 0]
    positions[..., 2] -= positions[:, 0:1, 2]
    positions = np.asarray(
        Q.qrot(
            jnp.asarray(np.repeat(r_rot[:, None], positions.shape[1], axis=1), jnp.float32),
            jnp.asarray(positions, jnp.float32),
        )
    )

    root_y = positions[:, 0, 1:2]
    r_vel_ang = np.arcsin(r_velocity[:, 2:3])
    l_vel_xz = velocity[:, [0, 2]]
    root_data = np.concatenate([r_vel_ang, l_vel_xz, root_y[:-1]], axis=-1)

    rot_data = cont6d[:, 1:].reshape(len(cont6d), -1)
    ric_data = positions[:, 1:].reshape(len(positions), -1)

    local_vel = np.asarray(
        Q.qrot(
            jnp.asarray(
                np.repeat(r_rot[:-1, None], global_positions.shape[1], axis=1), jnp.float32
            ),
            jnp.asarray(global_positions[1:] - global_positions[:-1], jnp.float32),
        )
    ).reshape(len(positions) - 1, -1)

    return np.concatenate(
        [root_data, ric_data[:-1], rot_data[:-1], local_vel, feet_l, feet_r], axis=-1
    ).astype(np.float32)


def process_file(
    positions: np.ndarray,
    feet_thre: float,
    dataset: str = "t2m",
    tgt_offsets: Optional[np.ndarray] = None,
):
    """Full preprocessing: floor/origin/face-Z+ normalization + feature extraction.

    Returns (features [T-1, D], global_positions [T, J, 3]).
    """
    skeleton = t2m_skeleton() if dataset == "t2m" else kit_skeleton()
    face_joints = T2M_FACE_JOINTS if dataset == "t2m" else KIT_FACE_JOINTS
    fid_r, fid_l = ([8, 11], [7, 10]) if dataset == "t2m" else ([14, 15], [19, 20])

    positions = positions.astype(np.float64).copy()
    if tgt_offsets is not None:
        positions = _uniform_skeleton(positions, skeleton, face_joints, tgt_offsets, dataset)

    positions[:, :, 1] -= positions.min(axis=0).min(axis=0)[1]  # put on floor
    root_init = positions[0]
    positions = positions - root_init[0] * np.array([1, 0, 1])  # XZ to origin

    # Rotate so the initial pose faces Z+.
    r_hip, l_hip, sdr_r, sdr_l = face_joints
    across = (root_init[r_hip] - root_init[l_hip]) + (root_init[sdr_r] - root_init[sdr_l])
    across = across / np.linalg.norm(across)
    forward = np.cross(np.array([0, 1, 0]), across)
    forward = forward / np.linalg.norm(forward)
    init_quat = np.asarray(
        Q.qbetween(jnp.asarray(forward[None], jnp.float32), jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32))
    )[0]
    quat_full = np.broadcast_to(init_quat, positions.shape[:-1] + (4,))
    positions = np.asarray(
        Q.qrot(jnp.asarray(quat_full, jnp.float32), jnp.asarray(positions, jnp.float32))
    ).astype(np.float64)

    feats = extract_features(positions, feet_thre, skeleton, face_joints, fid_r, fid_l)
    return feats, positions


def _uniform_skeleton(positions, skeleton, face_joints, tgt_offsets, dataset):
    l_idx1, l_idx2 = (5, 8) if dataset == "t2m" else (17, 18)
    src_offset = skeleton.offsets_from_rest_pose(positions[0])
    src_leg = np.abs(src_offset[l_idx1]).max() + np.abs(src_offset[l_idx2]).max()
    tgt_leg = np.abs(tgt_offsets[l_idx1]).max() + np.abs(tgt_offsets[l_idx2]).max()
    scale = tgt_leg / src_leg
    tgt_root = positions[:, 0] * scale
    quat_params = skeleton.inverse_kinematics(positions, face_joints)
    joints = skeleton.forward_kinematics(
        jnp.asarray(quat_params, jnp.float32),
        jnp.asarray(tgt_root, jnp.float32),
        jnp.asarray(tgt_offsets, jnp.float32),
    )
    return np.asarray(joints).astype(np.float64)
