"""Train state: params + optimizer + EMA in one pytree.

Replaces the reference's TrainLoop plumbing (train/training_loop.py:37-250):
AdamW with configurable beta2, linear LR anneal, and the manual EMA update
`avg = decay*avg + (1-decay)*p` (training_loop.py:299-310) — all fused into
the jitted train step via optax.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    adam_beta2: float = 0.999
    lr_anneal_steps: int = 0
    grad_clip: float = 0.0  # 0 = off
    ema_decay: float = 0.9999
    use_ema: bool = True


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any]


def make_optimizer(config: OptimConfig) -> optax.GradientTransformation:
    if config.lr_anneal_steps > 0:
        # Reference anneal: lr * (1 - step/anneal_steps) (training_loop.py:349-355).
        schedule = lambda step: config.lr * jnp.maximum(
            0.0, 1.0 - step / config.lr_anneal_steps
        )
    else:
        schedule = config.lr
    tx = optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=config.adam_beta2,
        weight_decay=config.weight_decay,
    )
    if config.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(config.grad_clip), tx)
    return tx


def create_train_state(params, config: OptimConfig) -> TrainState:
    tx = make_optimizer(config)
    # Copy params: the train step donates the state's buffers, so the state
    # must own its arrays (callers may reuse `params` afterwards).
    params = jax.tree_util.tree_map(jnp.copy, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if config.use_ema else None,
    )


def apply_gradients(state: TrainState, grads, config: OptimConfig, tx) -> TrainState:
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = state.ema_params
    if config.use_ema and state.ema_params is not None:
        new_ema = optax.incremental_update(
            new_params, state.ema_params, step_size=1.0 - config.ema_decay
        )
    return TrainState(
        step=state.step + 1,
        params=new_params,
        opt_state=new_opt_state,
        ema_params=new_ema,
    )
