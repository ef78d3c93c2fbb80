"""Goal-conditioning machinery vs the reference (string-list -> validity)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.core.goals import (
    ALL_GOAL_JOINT_NAMES,
    extended_goal_names,
    get_allowed_joint_options,
    get_target_location,
    goal_loss_mask,
    sample_goal,
    traj_global2vel,
)
from mdm_tpu.diffusion.losses import masked_goal_l2

RNG = np.random.default_rng(81)


def test_get_target_location_matches_reference(reference_path):
    import torch
    from data_loaders.humanml.scripts.motion_process import (
        get_target_location as ref_gtl,
    )

    B, T, D = 3, 20, 263
    motion = RNG.normal(size=(B, T, D)).astype(np.float32) * 0.05
    mean = RNG.normal(size=(D,)).astype(np.float32) * 0.01
    std = (RNG.uniform(0.5, 1.5, size=(D,))).astype(np.float32)

    names = extended_goal_names()
    target_joint_names = [
        np.array(["pelvis"]), np.array(["left_wrist", "traj"]), np.array([]),
    ]
    is_heading = np.array([True, False, True])
    validity = np.zeros((B, len(names)), dtype=bool)
    for b, sample in enumerate(target_joint_names):
        for n in sample:
            validity[b, names.index(n)] = True
        validity[b, -1] = is_heading[b]

    # reference expects [B, J, F, T] layout + torch types
    motion_ref = torch.from_numpy(motion.transpose(0, 2, 1)[:, :, None, :])
    lengths = torch.full((B,), T)
    # reference mean/std are the dataset's mean_gpu/std_gpu: [1, D, 1, 1]
    mean_ref = torch.from_numpy(mean[None, :, None, None])
    std_ref = torch.from_numpy(std[None, :, None, None])
    theirs = ref_gtl(
        motion_ref, mean_ref, std_ref, lengths,
        22, ALL_GOAL_JOINT_NAMES, target_joint_names,
        torch.from_numpy(is_heading),
    ).numpy()

    ours = np.asarray(
        get_target_location(
            jnp.asarray(motion), jnp.asarray(mean), jnp.asarray(std),
            validity=jnp.asarray(validity),
        )
    )
    # Reference zeroes unrequested rows implicitly (output tensor starts at
    # zero); ours multiplies by validity — compare directly.
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_sample_goal_distributions():
    validity, is_heading = sample_goal(500, np.random.default_rng(0))
    # None prob 0.5 per pick, 2 picks -> ~25% of samples have no goal joints
    frac_empty = (validity[:, :-1].sum(axis=1) == 0).mean()
    assert 0.1 < frac_empty < 0.45
    assert 0.3 < is_heading.mean() < 0.7
    # heading row mirrors is_heading
    np.testing.assert_array_equal(validity[:, -1], is_heading)


def test_sample_goal_forced():
    validity, is_heading = sample_goal(
        50, np.random.default_rng(1), force_joints="DIMP_BENCH"
    )
    names = extended_goal_names()
    used = {tuple(np.where(v[:-1])[0]) for v in validity}
    pelvis, head = names.index("pelvis"), names.index("head")
    assert used <= {(pelvis,), (pelvis, head)}


def test_goal_loss_and_mask(reference_path):
    import torch
    from utils.loss_util import masked_goal_l2 as ref_mgl

    B = 3
    names = extended_goal_names()
    G = len(names)
    pred = RNG.normal(size=(B, G, 3)).astype(np.float32)
    ref_goal = RNG.normal(size=(B, G, 3)).astype(np.float32)
    target_joint_names = [np.array(["pelvis"]), np.array(["traj"]), np.array([])]
    is_heading = np.array([True, False, True])
    validity = np.zeros((B, G), dtype=bool)
    for b, sample in enumerate(target_joint_names):
        for n in sample:
            validity[b, names.index(n)] = True
        validity[b, -1] = is_heading[b]

    cond = {
        "target_joint_names": target_joint_names,
        "is_heading": torch.from_numpy(is_heading),
    }
    theirs = ref_mgl(
        torch.from_numpy(pred), torch.from_numpy(ref_goal), cond,
        np.array(ALL_GOAL_JOINT_NAMES),
    ).numpy()

    ours = np.asarray(
        masked_goal_l2(
            jnp.asarray(pred), jnp.asarray(ref_goal),
            goal_loss_mask(jnp.asarray(validity)), jnp.asarray(is_heading),
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_traj_global2vel_matches_reference(reference_path):
    import torch
    from data_loaders.humanml.scripts.motion_process import traj_global2vel as ref_tgv

    B, T = 2, 12
    pos = np.cumsum(RNG.normal(scale=0.1, size=(B, T, 2)), axis=1).astype(np.float32)
    yaw = np.cumsum(RNG.normal(scale=0.05, size=(B, T)), axis=1).astype(np.float32)

    theirs = ref_tgv(
        torch.from_numpy(pos.transpose(0, 2, 1)),
        torch.from_numpy(yaw[:, None, :]),
    ).numpy()  # [B, 3, 1, T-1]
    ours = np.asarray(traj_global2vel(jnp.asarray(pos), jnp.asarray(yaw)))
    np.testing.assert_allclose(
        ours, theirs[:, :, 0].transpose(0, 2, 1), atol=1e-4
    )
