"""DiP multi-target goal conditioning: target extraction + sampling.

Mirror of the reference's goal machinery (data_loaders/humanml/scripts/
motion_process.py:594-669 and utils/loss_util.py:34-46) with a fixed-shape
API: requested joints are a boolean validity matrix [B, G+2] over
(goal_joints..., traj, heading) instead of per-sample python name lists.

Goal tensor layout [B, G+2, 3]: rows are the goal joints' last-frame world
locations, then the planar trajectory (pelvis with y zeroed), then the
heading angle stored in [..., 0].
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from . import quaternions as Q
from .hml_codec import (
    HML_EE_JOINT_NAMES,
    HML_JOINT_NAMES,
    recover_from_ric,
    recover_root_rot_heading_ang,
)

ALL_GOAL_JOINT_NAMES: List[str] = ["pelvis"] + HML_EE_JOINT_NAMES


def extended_goal_names(all_goal_joint_names: Sequence[str] = ALL_GOAL_JOINT_NAMES):
    return list(all_goal_joint_names) + ["traj", "heading"]


def goal_joint_indices(all_goal_joint_names: Sequence[str] = ALL_GOAL_JOINT_NAMES):
    """HML joint index for each goal row (traj row reuses the pelvis)."""
    idx = [HML_JOINT_NAMES.index(n) for n in all_goal_joint_names]
    idx.append(HML_JOINT_NAMES.index("pelvis"))  # traj
    return np.asarray(idx, dtype=np.int32)


def get_target_location(
    motion: jnp.ndarray,  # [B, T, D] normalized hml features
    mean: jnp.ndarray,
    std: jnp.ndarray,
    joints_num: int = 22,
    all_goal_joint_names: Sequence[str] = ALL_GOAL_JOINT_NAMES,
    validity: Optional[jnp.ndarray] = None,  # [B, G+2] bool
) -> jnp.ndarray:
    """Last-frame goal tensor [B, G+2, 3] from a motion batch.

    Dense equivalent of reference get_target_location (motion_process.py:
    594-621): joints decoded for all rows, invalid rows zeroed by the
    validity mask (instead of python name loops).
    """
    joints = recover_from_ric(motion * std + mean, joints_num)  # [B, T, J, 3]
    last = joints[:, -1]  # [B, J, 3]
    gidx = jnp.asarray(goal_joint_indices(all_goal_joint_names))
    target = last[:, gidx]  # [B, G+1, 3]
    target = target.at[:, -1, 1].set(0.0)  # traj row: zero vertical axis

    heading = recover_root_rot_heading_ang(last)  # [B, 1]
    heading_row = jnp.concatenate(
        [heading, jnp.zeros((motion.shape[0], 2), motion.dtype)], axis=-1
    )[:, None]
    target = jnp.concatenate([target, heading_row], axis=1)  # [B, G+2, 3]

    if validity is not None:
        target = target * validity[..., None].astype(target.dtype)
    return target


def sample_goal(
    batch_size: int,
    rng: np.random.Generator,
    force_joints: Optional[str] = None,
    all_goal_joint_names: Sequence[str] = ALL_GOAL_JOINT_NAMES,
    none_prob: float = 0.5,
    max_goal_joints: int = 2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random per-sample goal configuration for training.

    Returns (validity [B, G+2] bool incl. the heading row, is_heading [B]).
    Reference semantics (motion_process.py:632-654): choose up to 2 goals
    from {None, traj, pelvis, end effectors} with P(None)=0.5; heading is an
    independent fair coin — unless a force_joints config pins the options.
    """
    names = extended_goal_names(all_goal_joint_names)
    G = len(names)
    validity = np.zeros((batch_size, G), dtype=bool)
    is_heading = np.zeros(batch_size, dtype=bool)

    if force_joints is None:
        choices = ["None", "traj", "pelvis"] + list(HML_EE_JOINT_NAMES)
        probs = np.full(len(choices), (1 - none_prob) / (len(choices) - 1))
        probs[0] = none_prob
        for b in range(batch_size):
            picks = rng.choice(choices, size=max_goal_joints, replace=True, p=probs)
            for p in set(picks):
                if p != "None":
                    validity[b, names.index(p)] = True
            is_heading[b] = rng.random() < 0.5
            validity[b, names.index("heading")] = is_heading[b]
        return validity, is_heading

    options = get_allowed_joint_options(force_joints)
    for b in range(batch_size):
        opt = list(options[rng.integers(len(options))])
        if "heading" in opt:
            is_heading[b] = True
            opt.remove("heading")
        for name in opt:
            validity[b, names.index(name)] = True
        validity[b, names.index("heading")] = is_heading[b]
    return validity, is_heading


def get_allowed_joint_options(config_name: str) -> List[List[str]]:
    """Named goal-joint curricula (reference motion_process.py:656-668)."""
    if config_name == "DIMP_FULL":
        return [["pelvis", "heading"], ["pelvis", "head"], ["traj", "heading"],
                ["right_wrist", "heading"], ["left_wrist", "heading"],
                ["right_foot", "heading"], ["left_foot", "heading"]]
    if config_name == "DIMP_FINAL":
        return [["pelvis", "heading"], ["traj", "heading"],
                ["right_wrist", "heading"], ["left_wrist", "heading"],
                ["right_foot", "heading"], ["left_foot", "heading"], []]
    if config_name == "DIMP_SLIM":
        return [["pelvis", "heading"], ["pelvis", "head"], ["traj", "heading"],
                ["left_wrist", "heading"], ["left_foot", "heading"]]
    if config_name == "DIMP_BENCH":
        return [["pelvis", "heading"], ["pelvis", "head"]]
    if config_name == "PURE_T2M":
        return [[]]
    return [config_name.split(",")]


def goal_loss_mask(validity: jnp.ndarray) -> jnp.ndarray:
    """Validity [B, G+2] -> location-loss mask [B, G+1, 3] with the traj
    row's vertical axis masked out (reference masked_goal_l2)."""
    loc = jnp.broadcast_to(
        validity[:, :-1, None], validity.shape[:1] + (validity.shape[1] - 1, 3)
    )
    return loc.at[:, -1, 1].set(False)


def traj_global2vel(
    traj_positions: jnp.ndarray,  # [B, T, 2] world xz
    traj_yaw: jnp.ndarray,  # [B, T] heading (rad)
) -> jnp.ndarray:
    """Global planar trajectory -> the first 3 hml channels per step
    [B, T-1, 3] (yaw velocity via arcsin, rotated linear velocity) —
    reference motion_process.py:554-592."""
    B, T = traj_yaw.shape
    zeros = jnp.zeros_like(traj_yaw)
    euler = jnp.stack([zeros, traj_yaw, zeros], axis=-1)
    quat = Q.euler_to_quaternion(euler, "yxz", deg=False)  # [B, T, 4]

    vel = jnp.zeros((B, T - 1, 3), traj_positions.dtype)
    delta = traj_positions[:, 1:] - traj_positions[:, :-1]
    vel = vel.at[..., 0].set(delta[..., 0]).at[..., 2].set(delta[..., 1])
    vel = Q.qrot(quat[:, 1:], vel)

    r_vel = Q.qmul(quat[:, 1:], Q.qinv(quat[:, :-1]))
    yaw_vel = jnp.arcsin(r_vel[..., 2])
    return jnp.stack([yaw_vel, vel[..., 0], vel[..., 2]], axis=-1)
