"""Kinematic skeleton: forward kinematics in JAX, inverse kinematics on host.

Mirrors the capability of the reference `data_loaders/humanml/common/skeleton.py`
(Skeleton.forward_kinematics / _cont6d / inverse_kinematics_np) with a
TPU-first design:

- FK is a *static unroll over the kinematic chains* (njoints is 22/21,
  known at trace time) — per-chain accumulation from the root quaternion,
  reproducing the reference's per-chain quirk exactly. No in-place writes,
  no dynamic Python bookkeeping inside jit.
- Semantics match the reference exactly: the global rotation of joint j
  includes j's own local rotation and the bone offset of j is rotated by that
  accumulated rotation (skeleton.py:117-126 in the reference).
- IK (used only in offline preprocessing) stays host-side numpy, including
  the gaussian-smoothed forward direction.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from . import quaternions as Q
from .quaternions import cont6d_to_matrix

# Kinematic description of the two mocap skeletons used by the HumanML stack.
# Chains list joint indices root-outward (same topology as the published
# datasets; reference paramUtil.py).
T2M_KINEMATIC_CHAINS: List[List[int]] = [
    [0, 2, 5, 8, 11],
    [0, 1, 4, 7, 10],
    [0, 3, 6, 9, 12, 15],
    [9, 14, 17, 19, 21],
    [9, 13, 16, 18, 20],
]
KIT_KINEMATIC_CHAINS: List[List[int]] = [
    [0, 11, 12, 13, 14, 15],
    [0, 16, 17, 18, 19, 20],
    [0, 1, 2, 3, 4],
    [3, 5, 6, 7],
    [3, 8, 9, 10],
]

# Unit bone directions in the rest pose (axis-aligned by construction).
T2M_RAW_OFFSETS = np.array(
    [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, -1, 0],
     [0, 1, 0], [0, -1, 0], [0, -1, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1],
     [0, 1, 0], [1, 0, 0], [-1, 0, 0], [0, 0, 1], [0, -1, 0], [0, -1, 0],
     [0, -1, 0], [0, -1, 0], [0, -1, 0], [0, -1, 0]],
    dtype=np.float32,
)
KIT_RAW_OFFSETS = np.array(
    [[0, 0, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0], [1, 0, 0],
     [0, -1, 0], [0, -1, 0], [-1, 0, 0], [0, -1, 0], [0, -1, 0], [1, 0, 0],
     [0, -1, 0], [0, -1, 0], [0, 0, 1], [0, 0, 1], [-1, 0, 0], [0, -1, 0],
     [0, -1, 0], [0, 0, 1], [0, 0, 1]],
    dtype=np.float32,
)

T2M_FACE_JOINTS = [2, 1, 17, 16]  # r_hip, l_hip, sdr_r, sdr_l
KIT_FACE_JOINTS = [11, 16, 5, 8]


def parents_from_chains(chains: Sequence[Sequence[int]], njoints: int) -> np.ndarray:
    parents = np.zeros(njoints, dtype=np.int32)
    parents[0] = -1
    for chain in chains:
        for i in range(1, len(chain)):
            parents[chain[i]] = chain[i - 1]
    return parents


@dataclass(frozen=True)
class Skeleton:
    """Static skeleton description. All fields are host constants; FK methods
    trace to pure XLA programs with the tree unrolled."""

    raw_offsets: np.ndarray  # [J, 3] unit bone directions
    chains: Tuple[Tuple[int, ...], ...]
    parents: np.ndarray = field(init=False)

    def __post_init__(self):
        parents = parents_from_chains(self.chains, len(self.raw_offsets))
        object.__setattr__(self, "parents", parents)

    @property
    def njoints(self) -> int:
        return len(self.raw_offsets)

    # ---------------------------------------------------------------- offsets
    def offsets_from_rest_pose(self, rest_joints: np.ndarray) -> np.ndarray:
        """Scale unit directions by bone lengths measured on a rest pose.

        rest_joints: [J, 3] -> offsets [J, 3]. Host-side (preprocessing).
        """
        offsets = self.raw_offsets.astype(np.float64).copy()
        for j in range(1, self.njoints):
            bone = rest_joints[j] - rest_joints[self.parents[j]]
            offsets[j] = np.linalg.norm(bone) * offsets[j]
        return offsets.astype(np.float32)

    # --------------------------------------------------------------------- FK
    def forward_kinematics(
        self,
        quats: jnp.ndarray,
        root_pos: jnp.ndarray,
        offsets: jnp.ndarray,
        do_root_rotation: bool = True,
    ) -> jnp.ndarray:
        """Quaternion FK. quats [..., J, 4], root_pos [..., 3], offsets [J, 3]
        (or broadcastable [..., J, 3]) -> joints [..., J, 3].

        Parity note: rotation accumulation restarts from the *root*
        quaternion at the head of every chain (even chains anchored at a
        non-root joint) — this reproduces the reference/T2M semantics
        (skeleton.py:117-126) on which the published datasets and
        checkpoints depend.
        """
        pos = [None] * self.njoints
        root_q = quats[..., 0, :]
        if not do_root_rotation:
            root_q = jnp.zeros_like(root_q).at[..., 0].set(1.0)
        pos[0] = root_pos
        offsets = jnp.broadcast_to(offsets, quats.shape[:-1] + (3,))
        for chain in self.chains:
            acc = root_q
            for i in range(1, len(chain)):
                j = chain[i]
                acc = Q.qmul(acc, quats[..., j, :])
                pos[j] = Q.qrot(acc, offsets[..., j, :]) + pos[chain[i - 1]]
        return jnp.stack(pos, axis=-2)

    def forward_kinematics_cont6d(
        self,
        cont6d: jnp.ndarray,
        root_pos: jnp.ndarray,
        offsets: jnp.ndarray,
        do_root_rotation: bool = True,
    ) -> jnp.ndarray:
        """cont6d FK (HumanML column convention). cont6d [..., J, 6].

        Same per-chain accumulation semantics as ``forward_kinematics``.
        """
        mats = cont6d_to_matrix(cont6d)  # [..., J, 3, 3]
        pos = [None] * self.njoints
        root_m = mats[..., 0, :, :]
        if not do_root_rotation:
            root_m = jnp.broadcast_to(jnp.eye(3, dtype=cont6d.dtype), root_m.shape)
        pos[0] = root_pos
        offsets = jnp.broadcast_to(offsets, cont6d.shape[:-1] + (3,))
        for chain in self.chains:
            acc = root_m
            for i in range(1, len(chain)):
                j = chain[i]
                acc = acc @ mats[..., j, :, :]
                pos[j] = (
                    jnp.einsum("...ij,...j->...i", acc, offsets[..., j, :])
                    + pos[chain[i - 1]]
                )
        return jnp.stack(pos, axis=-2)

    # --------------------------------------------------------------------- IK
    def inverse_kinematics(
        self,
        joints: np.ndarray,
        face_joints: Sequence[int],
        smooth_forward: bool = False,
    ) -> np.ndarray:
        """Positions [T, J, 3] -> local quaternions [T, J, 4]. Host numpy.

        Matches reference skeleton.py:55-104 (including its l_hip/r_hip
        argument-order quirk) — used only for offline preprocessing parity.
        """
        import scipy.ndimage as ndi

        l_hip, r_hip, sdr_r, sdr_l = face_joints
        across = (joints[:, r_hip] - joints[:, l_hip]) + (joints[:, sdr_r] - joints[:, sdr_l])
        across = across / np.linalg.norm(across, axis=-1, keepdims=True)
        forward = np.cross(np.array([[0.0, 1.0, 0.0]]), across, axis=-1)
        if smooth_forward:
            forward = ndi.gaussian_filter1d(forward, 20, axis=0, mode="nearest")
        forward = forward / np.linalg.norm(forward, axis=-1, keepdims=True)

        target = np.tile(np.array([[0.0, 0.0, 1.0]]), (len(forward), 1))
        root_quat = np.asarray(Q.qbetween(jnp.asarray(forward, jnp.float32), jnp.asarray(target, jnp.float32)))

        quat_params = np.zeros(joints.shape[:-1] + (4,), dtype=np.float64)
        quat_params[:, 0] = root_quat
        for chain in self.chains:
            R = root_quat
            for i in range(len(chain) - 1):
                u = np.tile(self.raw_offsets[chain[i + 1]][None], (len(joints), 1))
                v = joints[:, chain[i + 1]] - joints[:, chain[i]]
                v = v / np.linalg.norm(v, axis=-1, keepdims=True)
                rot_u_v = np.asarray(Q.qbetween(jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32)))
                R_loc = np.asarray(Q.qmul(Q.qinv(jnp.asarray(R, jnp.float32)), jnp.asarray(rot_u_v, jnp.float32)))
                quat_params[:, chain[i + 1]] = R_loc
                R = np.asarray(Q.qmul(jnp.asarray(R, jnp.float32), jnp.asarray(R_loc, jnp.float32)))
        return quat_params


def t2m_skeleton() -> Skeleton:
    return Skeleton(T2M_RAW_OFFSETS, tuple(tuple(c) for c in T2M_KINEMATIC_CHAINS))


def kit_skeleton() -> Skeleton:
    return Skeleton(KIT_RAW_OFFSETS, tuple(tuple(c) for c in KIT_KINEMATIC_CHAINS))
