"""Train-time goal conditioning wiring (DiP target conditioning).

Reference behavior: the training loop's cond modifiers sample a goal per
batch and extract the GT target locations before the step
(train/training_loop.py:192-205), and `training_losses` adds
masked_goal_l2 on the prediction (gaussian_diffusion.py:1341-1347).

Here: `goal_cond_modifier` augments a host batch with validity/targets, and
`make_target_loss_builder` returns the per-batch target-loss closure passed
to the jitted train step.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.goals import get_target_location, goal_loss_mask, sample_goal
from ..diffusion.losses import masked_goal_l2


def goal_cond_modifier(
    batch: Dict,
    rng: np.random.Generator,
    mean: np.ndarray,
    std: np.ndarray,
    joints_num: int = 22,
    force_joints: Optional[str] = None,
    compute_target: bool = True,
) -> Dict:
    """Attach goal fields to a host batch (GT targets).

    compute_target=False samples only validity/is_heading (pure numpy) and
    leaves the target extraction to the jitted train step
    (make_train_step(target_cond_fn=...)): the eager extraction here costs
    a full-batch H2D plus a blocking pull per batch, serializing the input
    pipeline against the step — the CLI training path always defers.
    """
    B = batch["x"].shape[0]
    validity, is_heading = sample_goal(B, rng, force_joints=force_joints)
    batch = dict(batch)
    if compute_target:
        target = get_target_location(
            jnp.asarray(batch["x"]), jnp.asarray(mean), jnp.asarray(std),
            joints_num, validity=jnp.asarray(validity),
        )
        batch["target_cond"] = np.asarray(target)
    batch["target_validity"] = validity
    batch["is_heading"] = is_heading
    return batch


def make_target_cond_fn(
    mean: np.ndarray, std: np.ndarray, joints_num: int = 22
) -> Callable:
    """fn(x_start, validity) -> GT targets, for in-graph extraction inside
    the jitted train step (no host round-trip per batch)."""
    mean_c = jnp.asarray(mean)
    std_c = jnp.asarray(std)

    def fn(x_start, validity):
        return get_target_location(
            x_start, mean_c, std_c, joints_num, validity=validity
        )

    return fn


def make_target_loss_builder(
    mean: np.ndarray, std: np.ndarray, joints_num: int = 22
) -> Callable:
    """-> target_loss_builder(batch) for mdm_tpu.train.make_train_step."""
    mean_c = jnp.asarray(mean)
    std_c = jnp.asarray(std)

    def builder(batch: Dict) -> Optional[Callable]:
        cond = batch["cond"]
        if cond.target_cond is None or cond.target_validity is None:
            return None
        validity = cond.target_validity
        ref_goal = cond.target_cond
        loc_mask = goal_loss_mask(validity)
        is_heading = validity[:, -1]

        def fn(model_output):
            pred = get_target_location(
                model_output, mean_c, std_c, joints_num, validity=validity
            )
            return masked_goal_l2(pred, ref_goal, loc_mask, is_heading)

        return fn

    return builder
