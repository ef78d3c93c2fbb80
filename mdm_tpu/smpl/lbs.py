"""Differentiable SMPL linear blend skinning in JAX.

Native replacement for the reference's smplx dependency (model/smpl.py:64-97):
shape blend shapes + pose blend shapes + kinematic rigid transforms + LBS
skinning, all expressed as batched matmuls that map straight onto the MXU.
The layer is differentiable end-to-end, which is what lets the rcxyz /
foot-contact losses run inside the jitted training step (the reference does
FK inside its loss graph, gaussian_diffusion.py:1241-1347).

Model data loads from the standard `SMPL_NEUTRAL.pkl` (downloaded by
`prepare/download_smpl_files.sh`, same asset contract as the reference) and
the SPIN `J_regressor_extra.npy`. Extra keypoint vertex ids are the public
smplx/SPIN constants.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Extra keypoints picked directly from the mesh (smplx VertexJointSelector
# constants for the SMPL topology): 5 face + 6 feet + 10 fingertips.
EXTRA_VERTEX_IDS = np.array(
    [
        332, 6260, 2800, 4071, 583,  # nose, reye, leye, rear, lear
        3216, 3226, 3387, 6617, 6624, 6787,  # L/R big toe, small toe, heel
        2746, 2319, 2445, 2556, 2673,  # left finger tips (thumb..pinky)
        6191, 5782, 5905, 6016, 6133,  # right finger tips
    ],
    dtype=np.int32,
)

# Joint-set index maps (reference model/smpl.py:11-60).
ACTION2MOTION_JOINTS = np.array(
    [8, 1, 2, 3, 4, 5, 6, 7, 0, 9, 10, 11, 12, 13, 14, 21, 24, 38], dtype=np.int32
)
JOINT_MAP = {
    "OP Nose": 24, "OP Neck": 12, "OP RShoulder": 17, "OP RElbow": 19,
    "OP RWrist": 21, "OP LShoulder": 16, "OP LElbow": 18, "OP LWrist": 20,
    "OP MidHip": 0, "OP RHip": 2, "OP RKnee": 5, "OP RAnkle": 8,
    "OP LHip": 1, "OP LKnee": 4, "OP LAnkle": 7, "OP REye": 25,
    "OP LEye": 26, "OP REar": 27, "OP LEar": 28, "OP LBigToe": 29,
    "OP LSmallToe": 30, "OP LHeel": 31, "OP RBigToe": 32, "OP RSmallToe": 33,
    "OP RHeel": 34, "Right Ankle": 8, "Right Knee": 5, "Right Hip": 45,
    "Left Hip": 46, "Left Knee": 4, "Left Ankle": 7, "Right Wrist": 21,
    "Right Elbow": 19, "Right Shoulder": 17, "Left Shoulder": 16,
    "Left Elbow": 18, "Left Wrist": 20, "Neck (LSP)": 47,
    "Top of Head (LSP)": 48, "Pelvis (MPII)": 49, "Thorax (MPII)": 50,
    "Spine (H36M)": 51, "Jaw (H36M)": 52, "Head (H36M)": 53, "Nose": 24,
    "Left Eye": 26, "Right Eye": 25, "Left Ear": 28, "Right Ear": 27,
}
JOINT_NAMES = [
    "OP Nose", "OP Neck", "OP RShoulder", "OP RElbow", "OP RWrist",
    "OP LShoulder", "OP LElbow", "OP LWrist", "OP MidHip", "OP RHip",
    "OP RKnee", "OP RAnkle", "OP LHip", "OP LKnee", "OP LAnkle", "OP REye",
    "OP LEye", "OP REar", "OP LEar", "OP LBigToe", "OP LSmallToe", "OP LHeel",
    "OP RBigToe", "OP RSmallToe", "OP RHeel", "Right Ankle", "Right Knee",
    "Right Hip", "Left Hip", "Left Knee", "Left Ankle", "Right Wrist",
    "Right Elbow", "Right Shoulder", "Left Shoulder", "Left Elbow",
    "Left Wrist", "Neck (LSP)", "Top of Head (LSP)", "Pelvis (MPII)",
    "Thorax (MPII)", "Spine (H36M)", "Jaw (H36M)", "Head (H36M)", "Nose",
    "Left Eye", "Right Eye", "Left Ear", "Right Ear",
]
JOINTSTYPE_ROOT = {"a2m": 0, "smpl": 0, "a2mpl": 0, "vibe": 8}

VIBE_INDEXES = np.array([JOINT_MAP[n] for n in JOINT_NAMES], dtype=np.int32)
A2M_INDEXES = VIBE_INDEXES[ACTION2MOTION_JOINTS]
SMPL_INDEXES = np.arange(24, dtype=np.int32)
A2MPL_INDEXES = np.unique(np.r_[SMPL_INDEXES, A2M_INDEXES]).astype(np.int32)
JOINT_SET_INDEXES: Dict[str, np.ndarray] = {
    "vibe": VIBE_INDEXES, "a2m": A2M_INDEXES, "smpl": SMPL_INDEXES,
    "a2mpl": A2MPL_INDEXES,
}


def _root_to_minus1(parents: np.ndarray) -> np.ndarray:
    parents = parents.copy()
    parents[0] = -1
    return parents


@dataclass(frozen=True)
class SMPLModel:
    """Static SMPL model tensors (host numpy; traced as constants)."""

    v_template: np.ndarray  # [V, 3]
    shapedirs: np.ndarray  # [V, 3, n_betas]
    posedirs: np.ndarray  # [(J-1)*9, V*3]
    j_regressor: np.ndarray  # [J, V]
    parents: np.ndarray  # [J]
    lbs_weights: np.ndarray  # [V, J]
    faces: Optional[np.ndarray] = None  # [F, 3]
    j_regressor_extra: Optional[np.ndarray] = None  # [9, V]
    extra_vertex_ids: Optional[np.ndarray] = None  # defaults to EXTRA_VERTEX_IDS

    @property
    def num_joints(self) -> int:
        return self.j_regressor.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    @classmethod
    def load(
        cls,
        model_path: str = "body_models/smpl/SMPL_NEUTRAL.pkl",
        extra_regressor_path: Optional[str] = "body_models/smpl/J_regressor_extra.npy",
        num_betas: int = 10,
    ) -> "SMPLModel":
        with open(model_path, "rb") as f:
            data = pickle.load(f, encoding="latin1")

        def dense(x):
            if hasattr(x, "toarray"):
                x = x.toarray()
            return np.asarray(x, dtype=np.float64)

        extra = None
        if extra_regressor_path and os.path.exists(extra_regressor_path):
            extra = np.asarray(np.load(extra_regressor_path), dtype=np.float32)

        posedirs = dense(data["posedirs"])  # [V, 3, 207]
        V = posedirs.shape[0]
        posedirs = posedirs.reshape(V * 3, -1).T  # [207, V*3]

        return cls(
            v_template=dense(data["v_template"]).astype(np.float32),
            shapedirs=dense(data["shapedirs"])[..., :num_betas].astype(np.float32),
            posedirs=posedirs.astype(np.float32),
            j_regressor=dense(data["J_regressor"]).astype(np.float32),
            # kintree_table is uint32 with 2**32-1 as the root sentinel —
            # a clip(min=-1) after int64 cast would keep 4294967295; set
            # the root explicitly to -1 (smplx convention).
            parents=_root_to_minus1(np.asarray(data["kintree_table"][0], np.int64))
            if "kintree_table" in data
            else np.asarray(data["parents"], dtype=np.int64),
            lbs_weights=dense(data["weights"]).astype(np.float32),
            faces=np.asarray(data.get("f"), dtype=np.int32) if "f" in data else None,
            j_regressor_extra=extra,
        )


def _rigid_transforms(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: np.ndarray):
    """Global joint transforms via the relative-offset trick.

    rot_mats [B, J, 3, 3], joints [B, J, 3] (rest) -> (posed_joints [B, J, 3],
    rel_transforms [B, J, 4, 4]). Tree unrolled statically (J=24).
    """
    B, J = joints.shape[:2]
    rel_joints = joints.at[:, 1:].add(-joints[:, np.asarray(parents[1:])])

    def make_tf(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)  # [..., 3, 4]
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    tfs = make_tf(rot_mats, rel_joints)  # [B, J, 4, 4]
    chain = [tfs[:, 0]]
    for j in range(1, J):
        chain.append(chain[int(parents[j])] @ tfs[:, j])
    transforms = jnp.stack(chain, axis=1)  # [B, J, 4, 4]

    posed_joints = transforms[..., :3, 3]
    # Subtract the skeleton-driven offset so transforms act on rest vertices.
    joints_h = jnp.concatenate([joints, jnp.zeros((B, J, 1), joints.dtype)], axis=-1)
    correction = jnp.einsum("bjik,bjk->bji", transforms, joints_h)
    rel = transforms.at[..., :3, 3].add(-correction[..., :3])
    return posed_joints, rel


def lbs(
    model: SMPLModel,
    betas: jnp.ndarray,  # [B, n_betas]
    global_orient: jnp.ndarray,  # [B, 3, 3]
    body_pose: jnp.ndarray,  # [B, J-1, 3, 3]
    transl: Optional[jnp.ndarray] = None,  # [B, 3]
):
    """SMPL forward: returns dict with vertices [B, V, 3], joint sets."""
    B = betas.shape[0]
    dtype = betas.dtype

    v_template = jnp.asarray(model.v_template, dtype)
    shapedirs = jnp.asarray(model.shapedirs, dtype)
    posedirs = jnp.asarray(model.posedirs, dtype)
    j_regressor = jnp.asarray(model.j_regressor, dtype)
    lbs_weights = jnp.asarray(model.lbs_weights, dtype)

    # Shape blend shapes.
    v_shaped = v_template[None] + jnp.einsum("bl,vkl->bvk", betas, shapedirs)
    # Rest joints.
    joints_rest = jnp.einsum("jv,bvk->bjk", j_regressor, v_shaped)

    rot_mats = jnp.concatenate([global_orient[:, None], body_pose], axis=1)  # [B,J,3,3]

    # Pose blend shapes: (R - I) flattened over non-root joints.
    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # [B, (J-1)*9]
    v_posed = v_shaped + jnp.matmul(pose_feature, posedirs).reshape(B, -1, 3)

    posed_joints, rel_transforms = _rigid_transforms(
        rot_mats, joints_rest, model.parents
    )

    # Skinning: per-vertex blended transforms.
    T = jnp.einsum("vj,bjik->bvik", lbs_weights, rel_transforms)  # [B, V, 4, 4]
    v_h = jnp.concatenate([v_posed, jnp.ones((B, v_posed.shape[1], 1), dtype)], axis=-1)
    vertices = jnp.einsum("bvik,bvk->bvi", T, v_h)[..., :3]

    if transl is not None:
        vertices = vertices + transl[:, None]
        posed_joints = posed_joints + transl[:, None]

    # Joint sets: 24 smpl + 21 mesh keypoints (+ 9 extra regressed).
    extra_ids = jnp.asarray(
        model.extra_vertex_ids if model.extra_vertex_ids is not None else EXTRA_VERTEX_IDS
    )
    keypoints = vertices[:, extra_ids]
    all_joints = jnp.concatenate([posed_joints, keypoints], axis=1)  # [B, 45, 3]
    if model.j_regressor_extra is not None:
        extra = jnp.einsum(
            "jv,bvk->bjk", jnp.asarray(model.j_regressor_extra, dtype), vertices
        )
        all_joints = jnp.concatenate([all_joints, extra], axis=1)  # [B, 54, 3]

    out = {"vertices": vertices, "joints": all_joints}
    for name, idx in JOINT_SET_INDEXES.items():
        if idx.max() < all_joints.shape[1]:
            out[name] = all_joints[:, jnp.asarray(idx)]
    return out
