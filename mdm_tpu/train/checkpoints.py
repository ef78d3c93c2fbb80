"""Checkpoint save/restore with orbax + run-config persistence.

Mirrors the reference contract (train/training_loop.py:385-444,
utils/model_util.py:118-131): checkpoints keyed by step under save_dir, the
run config persisted as args.json next to them and re-ingested by every
downstream CLI, auto-resume from the highest step, EMA preferred at load.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_RE = re.compile(r"^ckpt_(\d+)$")


def save_args(save_dir: str, args: Dict[str, Any]):
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "args.json"), "w") as f:
        json.dump(args, f, indent=2, sort_keys=True, default=str)


def load_args(save_dir_or_ckpt: str) -> Dict[str, Any]:
    """Load args.json next to a checkpoint path or from a run dir."""
    d = save_dir_or_ckpt
    if not os.path.isdir(d):
        d = os.path.dirname(d)
    path = os.path.join(d, "args.json")
    with open(path) as f:
        return json.load(f)


def save_checkpoint(save_dir: str, step: int, state) -> str:
    path = os.path.abspath(os.path.join(save_dir, f"ckpt_{step:09d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def find_resume_checkpoint(save_dir: str) -> Optional[Tuple[str, int]]:
    """Highest-step checkpoint in save_dir (reference training_loop.py:385-397)."""
    if not os.path.isdir(save_dir):
        return None
    best = None
    for name in os.listdir(save_dir):
        m = CKPT_RE.match(name)
        if m:
            step = int(m.group(1))
            if best is None or step > best[1]:
                best = (os.path.join(save_dir, name), step)
    return best


def restore_checkpoint(path: str, target):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def restore_pytree_numpy(path: str):
    """Restore a checkpoint as plain numpy, regardless of the device
    topology it was saved under.

    Orbax records each array's sharding; a naive restore of a multi-host
    (pod) checkpoint on one host fails with "available devices are
    different". Restoring to np.ndarray via per-leaf RestoreArgs sidesteps
    sharding entirely — the standard consume-a-pod-checkpoint-for-sampling
    path.
    """
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    meta = ckptr.metadata(path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    restored = ckptr.restore(path, restore_args=restore_args)
    # Shape sanity check (ADVICE r4): the `meta.tree` probe above depends on
    # the orbax version's metadata layout — if an upgrade changes it, the
    # tree_map over restore_args could mis-shape silently. The restored tree
    # must structurally match the metadata we derived restore_args from.
    if (jax.tree_util.tree_structure(restored)
            != jax.tree_util.tree_structure(tree)):
        raise RuntimeError(
            f"orbax metadata/restore structure mismatch for {path}: the "
            f"PyTreeCheckpointer metadata layout this code probes "
            f"(`item_metadata.tree`) no longer matches what restore returns "
            f"— likely an orbax-checkpoint version change; update "
            f"restore_pytree_numpy for the new metadata shape."
        )
    return restored


def restore_params_only(path: str, params_target, use_ema: bool = True):
    """Restore just (ema_)params from a full TrainState checkpoint."""
    tree = restore_pytree_numpy(path)
    if use_ema and tree.get("ema_params") is not None:
        src = tree["ema_params"]
    else:
        src = tree["params"]
    return jax.tree_util.tree_map(lambda t, s: np.asarray(s, dtype=t.dtype), params_target, src)
