"""Diffusion training losses: masked L2 + geometric terms.

One jitted function computes the full loss dict for a batch (reference:
training_losses + masked_l2 across gaussian_diffusion.py:1224-1354 and
utils/loss_util.py). Canonical layout here is time-major features
``x: [B, T, D]`` with ``mask: [B, T, 1]`` (True = valid frame); geometric
terms operate on decoded joints ``[B, T, J, 3]``.

Geometric hooks (FK/SMPL decode, goal-target extraction) are injected as
callables so the engine stays model- and dataset-agnostic.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from . import gaussian as G
from .schedule import MeanType, Schedule, VarType


def masked_l2(
    a: jnp.ndarray,
    b: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    loss_fn: Callable = lambda x, y: (x - y) ** 2,
    epsilon: float = 1e-8,
    entries_norm: bool = True,
) -> jnp.ndarray:
    """Per-sample mean of squared error over unmasked elements.

    `mask` broadcasts against `a`; when it is per-frame (one entry per
    frame), `entries_norm` scales the normalizer by the number of feature
    elements per frame — reference semantics (loss_util.py:13-31).
    """
    loss = loss_fn(a, b) * mask.astype(a.dtype)
    loss = G.sum_flat(loss)
    non_zero = G.sum_flat(mask.astype(a.dtype))
    if entries_norm:
        n_entries = 1
        for d in a.shape[1:]:
            n_entries *= d
        mask_elems = 1
        for d in mask.shape[1:]:
            mask_elems *= d
        non_zero = non_zero * (n_entries // mask_elems)
    return loss / (non_zero + epsilon)


def angle_l2(a1: jnp.ndarray, a2: jnp.ndarray) -> jnp.ndarray:
    """Squared wrapped angular difference (period pi), reference loss_util.py:5-8."""
    a = a1 - a2
    a = jnp.mod(a + jnp.pi / 2, jnp.pi) - jnp.pi / 2
    return a**2


def masked_goal_l2(
    pred_goal: jnp.ndarray,
    ref_goal: jnp.ndarray,
    loc_mask: jnp.ndarray,
    is_heading: jnp.ndarray,
) -> jnp.ndarray:
    """Goal-conditioning loss: per-joint location L2 + wrapped heading L2.

    pred/ref_goal: [B, G+1, 3] (last row: heading angle in [..., 0]);
    loc_mask: [B, G, 3] bool validity of requested joints (with the traj
    row's vertical axis already masked out); is_heading: [B] bool.
    """
    loc_loss = masked_l2(
        pred_goal[:, :-1], ref_goal[:, :-1], loc_mask, entries_norm=False
    )
    heading_loss = masked_l2(
        pred_goal[:, -1:, :1],
        ref_goal[:, -1:, :1],
        is_heading[:, None, None],
        loss_fn=angle_l2,
        entries_norm=False,
    )
    return loc_loss + heading_loss


@dataclass(frozen=True)
class LossConfig:
    """Static loss weights/flags (reference GaussianDiffusion.__init__)."""

    mean_type: MeanType = MeanType.START_X
    var_type: VarType = VarType.FIXED_SMALL
    lambda_rcxyz: float = 0.0
    lambda_vel: float = 0.0
    lambda_vel_rcxyz: float = 0.0
    lambda_fc: float = 0.0
    lambda_target_loc: float = 0.0
    # a2m foot-contact joint indices (SMPL: L_Ankle, L_Foot, R_Ankle, R_Foot)
    fc_joints: tuple = (7, 10, 8, 11)
    fc_threshold: float = 0.01
    # vel_mse excludes the trailing root-translation row (reference
    # gaussian_diffusion.py:1337 slices off the last joint). In the flat
    # [B, T, D] layout that is the last `nfeats` features (6 for a2m rot6d).
    vel_drop_last_feats: int = 0
    # RESCALED_MSE's vb scaling (reference :1286-1289). MDM's factory pins
    # plain MSE, so this stays False there.
    rescale_vb: bool = False


def training_losses(
    sched: Schedule,
    model_output: jnp.ndarray,
    x_start: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    mask: jnp.ndarray,
    config: LossConfig = LossConfig(),
    *,
    get_xyz: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    target_loss_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-sample loss terms. Caller supplies the model output on x_t.

    get_xyz: features [B,T,D] -> joints [B,T,J,3] (FK/SMPL decode) — needed
    for rcxyz / vel_rcxyz / fc terms.
    target_loss_fn: model_output -> per-sample goal loss (DiP target cond).
    """
    terms: Dict[str, jnp.ndarray] = {}
    if config.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        # Learned sigma: the model emits 2D channels; the variance half
        # trains through the variational bound with the mean FROZEN
        # (reference gaussian_diffusion.py:1269-1289).
        D = x_t.shape[-1]
        assert model_output.shape[-1] == 2 * D, (
            f"learned variance needs 2x{D} output channels, "
            f"got {model_output.shape[-1]}"
        )
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        vb, _ = G.vb_terms_bpd(
            sched, jax.lax.stop_gradient(model_output), x_start, x_t, t,
            mean_type=config.mean_type, var_type=config.var_type,
            model_var_values=model_var_values, clip_denoised=False,
        )
        terms["vb"] = vb * (sched.num_timesteps / 1000.0
                            if config.rescale_vb else 1.0)

    if config.mean_type == MeanType.PREVIOUS_X:
        target, _, _ = G.q_posterior_mean_variance(sched, x_start, x_t, t)
    elif config.mean_type == MeanType.START_X:
        target = x_start
    else:
        target = noise

    terms["rot_mse"] = masked_l2(target, model_output, mask)

    target_xyz = pred_xyz = None
    if (config.lambda_rcxyz > 0 or config.lambda_vel_rcxyz > 0 or config.lambda_fc > 0):
        assert get_xyz is not None, "geometric losses need a get_xyz decoder"
        target_xyz = get_xyz(target)
        pred_xyz = get_xyz(model_output)
        mask_xyz = mask[..., None]  # [B,T,1,1]

    if config.lambda_rcxyz > 0:
        terms["rcxyz_mse"] = masked_l2(target_xyz, pred_xyz, mask_xyz)

    if config.lambda_vel_rcxyz > 0:
        tv = target_xyz[:, 1:] - target_xyz[:, :-1]
        pv = pred_xyz[:, 1:] - pred_xyz[:, :-1]
        terms["vel_xyz_mse"] = masked_l2(tv, pv, mask_xyz[:, 1:])

    if config.lambda_fc > 0:
        fj = list(config.fc_joints)
        gt_j = target_xyz[:, :, fj]  # [B,T,4,3]
        gt_vel = jnp.linalg.norm(gt_j[:, 1:] - gt_j[:, :-1], axis=-1)  # [B,T-1,4]
        contact = (gt_vel <= config.fc_threshold)[..., None]  # [B,T-1,4,1]
        pred_j = pred_xyz[:, :, fj]
        pred_vel = (pred_j[:, 1:] - pred_j[:, :-1]) * contact
        terms["fc"] = masked_l2(pred_vel, jnp.zeros_like(pred_vel), mask[..., None][:, 1:])

    if config.lambda_vel > 0:
        d = config.vel_drop_last_feats
        sl = slice(None, -d if d > 0 else None)
        tv = target[:, 1:, sl] - target[:, :-1, sl]
        pv = model_output[:, 1:, sl] - model_output[:, :-1, sl]
        terms["vel_mse"] = masked_l2(tv, pv, mask[:, 1:])

    if config.lambda_target_loc > 0:
        assert target_loss_fn is not None
        terms["target_loc"] = target_loss_fn(model_output)

    terms["loss"] = (
        terms["rot_mse"]
        + terms.get("vb", 0.0)
        + config.lambda_vel * terms.get("vel_mse", 0.0)
        + config.lambda_rcxyz * terms.get("rcxyz_mse", 0.0)
        + config.lambda_vel_rcxyz * terms.get("vel_xyz_mse", 0.0)
        + config.lambda_target_loc * terms.get("target_loc", 0.0)
        + config.lambda_fc * terms.get("fc", 0.0)
    )
    return terms
