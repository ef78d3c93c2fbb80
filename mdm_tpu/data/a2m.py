"""Action-to-motion datasets (HumanAct12, UESTC) — host pipeline.

Capability mirror of /root/reference/data_loaders/a2m/{dataset,
humanact12poses,uestc}.py with numpy + explicit RNG. Pose sequences are
axis-angle [T, 24, 3]; representations (rotvec/rotmat/rotquat/rot6d) are
converted on access, the root translation appended as a 25th "joint" row
(first 3 dims), and clips padded/sampled to a fixed frame count — the model
sees [B, T, 25*6] for rot6d.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core import rotations as R

HUMANACT12_ACTIONS = {
    0: "warm_up", 1: "walk", 2: "run", 3: "jump", 4: "drink",
    5: "lift_dumbbell", 6: "sit", 7: "eat", 8: "turn steering wheel",
    9: "phone", 10: "boxing", 11: "throw",
}


def _to_rep(pose_rotvec: np.ndarray, pose_rep: str) -> np.ndarray:
    """axis-angle [T, J, 3] -> chosen representation [T, J, F]."""
    import jax.numpy as jnp

    aa = jnp.asarray(pose_rotvec)
    if pose_rep == "rotvec":
        out = aa
    elif pose_rep == "rotmat":
        out = R.axis_angle_to_matrix(aa).reshape(pose_rotvec.shape[:2] + (9,))
    elif pose_rep == "rotquat":
        out = R.axis_angle_to_quaternion(aa)
    elif pose_rep == "rot6d":
        out = R.matrix_to_rotation_6d(R.axis_angle_to_matrix(aa))
    else:
        raise ValueError(pose_rep)
    return np.asarray(out, dtype=np.float32)


@dataclass
class A2MConfig:
    num_frames: int = 60
    sampling: str = "conseq"  # conseq | random_conseq | random
    sampling_step: int = 1
    pose_rep: str = "rot6d"
    translation: bool = True
    glob: bool = True
    max_len: int = -1
    min_len: int = -1
    align_pose_frontview: bool = False


class ActionMotionDataset:
    """Base action dataset; subclasses fill _pose/_joints/_actions lists."""

    dataname = "a2m"

    def __init__(self, config: A2MConfig, split: str = "train"):
        self.config = config
        self.split = split
        self._pose: List[np.ndarray] = []
        self._joints: List[Optional[np.ndarray]] = []
        self._actions: List[int] = []
        self._train: List[int] = []
        self._test: List[int] = []
        self._action_classes: Dict[int, str] = {}
        self.num_actions: int = 0

    # ----------------------------------------------------------- frame picks
    def _frame_indices(self, nframes: int, rng: np.random.Generator) -> np.ndarray:
        cfg = self.config
        num_frames = cfg.num_frames if cfg.num_frames != -1 else cfg.max_len
        if cfg.num_frames == -1 and (cfg.max_len == -1 or nframes <= cfg.max_len):
            return np.arange(nframes)
        if num_frames > nframes:
            pad = (nframes - 1) * np.ones(num_frames - nframes, dtype=int)
            return np.concatenate([np.arange(nframes), pad])
        if cfg.sampling in ("conseq", "random_conseq"):
            step_max = (nframes - 1) // (num_frames - 1)
            if cfg.sampling == "conseq":
                step = (
                    step_max
                    if cfg.sampling_step == -1 or cfg.sampling_step * (num_frames - 1) >= nframes
                    else cfg.sampling_step
                )
            else:
                step = int(rng.integers(1, step_max + 1))
            lastone = step * (num_frames - 1)
            shift_max = nframes - lastone - 1
            shift = int(rng.integers(0, max(shift_max, 1)))
            return shift + np.arange(0, lastone + 1, step)
        if cfg.sampling == "random":
            return np.sort(rng.choice(nframes, num_frames, replace=False))
        raise ValueError(cfg.sampling)

    # --------------------------------------------------------------- access
    def _pose_features(self, idx: int, frame_ix: np.ndarray) -> np.ndarray:
        cfg = self.config
        pose = self._pose[idx][frame_ix].reshape(len(frame_ix), -1, 3).copy()
        if not cfg.glob:
            pose = pose[:, 1:]

        trans = None
        if cfg.translation:
            if self._joints[idx] is not None:
                joints = self._joints[idx][frame_ix]
                joints = joints - joints[0, 0]
                trans = joints[:, 0].copy()
            else:
                trans = np.zeros((len(frame_ix), 3), np.float32)

        if cfg.align_pose_frontview:
            import jax.numpy as jnp

            first = np.asarray(R.axis_angle_to_matrix(jnp.asarray(pose[0, 0])))
            roots = np.asarray(R.axis_angle_to_matrix(jnp.asarray(pose[:, 0])))
            aligned = first.T @ roots
            pose[:, 0] = np.asarray(R.matrix_to_axis_angle(jnp.asarray(aligned)))
            if trans is not None:
                trans = (first.T @ trans.T).T

        feats = _to_rep(pose, cfg.pose_rep)  # [T, J, F]
        if cfg.translation:
            pad = np.zeros((feats.shape[0], 1, feats.shape[2]), np.float32)
            pad[:, 0, :3] = trans
            feats = np.concatenate([feats, pad], axis=1)
        return feats  # [T, J(+1), F]

    def indices(self) -> List[int]:
        return self._train if self.split == "train" else self._test

    def __len__(self) -> int:
        return len(self.indices())

    def sample(self, item: int, rng: np.random.Generator) -> Dict:
        idx = self.indices()[item]
        nframes = len(self._pose[idx])
        frame_ix = self._frame_indices(nframes, rng)
        feats = self._pose_features(idx, frame_ix)  # [T, J, F]
        T, J, F = feats.shape
        action = int(self._actions[idx])
        return {
            "motion": feats.reshape(T, J * F),
            "length": T,
            "original_length": T,
            "action": action,
            "action_text": self._action_classes[action],
            "key": str(idx),
        }


class HumanAct12(ActionMotionDataset):
    """humanact12poses.pkl: {'poses': [T,72] rotvec, 'joints3D', 'y'}."""

    dataname = "humanact12"

    def __init__(self, config: A2MConfig, datapath="dataset/HumanAct12Poses", split="train"):
        super().__init__(config, split)
        with open(os.path.join(datapath, "humanact12poses.pkl"), "rb") as f:
            data = pickle.load(f)
        self._pose = [np.asarray(p, np.float32) for p in data["poses"]]
        self._joints = [np.asarray(j, np.float32) for j in data["joints3D"]]
        self._actions = [int(y) for y in data["y"]]
        self.num_actions = 12
        self._action_classes = HUMANACT12_ACTIONS
        self._train = list(range(len(self._pose)))  # train-only dataset
        self._test = list(range(len(self._pose)))


class UESTC(ActionMotionDataset):
    """UESTC VIBE-estimated poses: 40 actions, 118 subjects (51 train).

    Expects the reference's preprocessed layout under `datapath`:
    vibe_cache (list of per-video dicts with 'pose'/'joints3D') or the
    consolidated npz produced by our `prepare` tooling; names encode
    action/subject/view per the UESTC convention `aA_sS_vV_...`.
    """

    dataname = "uestc"
    NUM_ACTIONS = 40
    TRAIN_SUBJECTS = 51

    def __init__(self, config: A2MConfig, datapath="dataset/uestc", split="train"):
        super().__init__(config, split)
        info_path = os.path.join(datapath, "info", "names.txt")
        with open(info_path) as f:
            names = [line.strip() for line in f if line.strip()]
        blob = np.load(os.path.join(datapath, "vibe_cache.npz"), allow_pickle=True)
        poses, joints = blob["poses"], blob["joints3D"]

        self.num_actions = self.NUM_ACTIONS
        self._action_classes = {
            i: f"action_{i}" for i in range(self.NUM_ACTIONS)
        }
        maps_path = os.path.join(datapath, "info", "action_classes.txt")
        if os.path.exists(maps_path):
            with open(maps_path) as f:
                self._action_classes = {
                    i: line.strip() for i, line in enumerate(f) if line.strip()
                }

        for i, name in enumerate(names):
            # UESTC naming: aA_dD_pP_cC...  (action, direction, performer, camera)
            parts = name.split("_")
            action = int(parts[0].lstrip("a"))
            subject = int(parts[2].lstrip("p")) if len(parts) > 2 else 0
            self._pose.append(np.asarray(poses[i], np.float32))
            self._joints.append(
                np.asarray(joints[i], np.float32) if joints is not None else None
            )
            self._actions.append(action)
            (self._train if subject < self.TRAIN_SUBJECTS else self._test).append(i)
