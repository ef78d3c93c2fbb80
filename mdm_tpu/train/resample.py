"""Train-time timestep samplers (reference diffusion/resample.py).

Functional JAX versions: the uniform sampler is a pure `randint`; the
loss-second-moment importance sampler keeps its per-timestep loss history in
a small state pytree updated inside the jitted train step (the reference's
torch.distributed all_gather sync, resample.py:83-104, becomes a `psum`-free
design because the history update already happens on replicated state after
the gradient all-reduce).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


def uniform_sample_t(key, batch_size: int, num_timesteps: int):
    """t ~ U{0..T-1}, weights = 1 (reference UniformSampler)."""
    t = jax.random.randint(key, (batch_size,), 0, num_timesteps)
    return t, jnp.ones((batch_size,), jnp.float32)


@struct.dataclass
class LossAwareState:
    """Ring buffer of recent losses per timestep [T, history]."""

    history: jnp.ndarray  # [T, H] float32
    counts: jnp.ndarray  # [T] int32

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10):
        return cls(
            history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
        )

    @property
    def warmed_up(self) -> jnp.ndarray:
        return (self.counts == self.history.shape[1]).all()


def loss_aware_weights(state: LossAwareState, uniform_prob: float = 0.001):
    """Sampling distribution over timesteps: sqrt(E[loss^2]) + uniform mix."""
    weights = jnp.sqrt(jnp.mean(state.history**2, axis=-1))
    weights = weights / weights.sum()
    weights = weights * (1 - uniform_prob) + uniform_prob / weights.shape[0]
    return weights


def loss_aware_sample_t(
    key, state: LossAwareState, batch_size: int, uniform_prob: float = 0.001
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    T = state.history.shape[0]
    p_warm = loss_aware_weights(state, uniform_prob)
    p_uniform = jnp.full((T,), 1.0 / T)
    p = jnp.where(state.warmed_up, p_warm, p_uniform)
    t = jax.random.choice(key, T, (batch_size,), p=p)
    weights = 1.0 / (T * p[t])
    return t, weights


def loss_aware_update(state: LossAwareState, t, losses) -> LossAwareState:
    """Insert new per-sample losses into the per-timestep ring buffers.

    Scatter-based equivalent of LossSecondMomentResampler.update_with_all_losses
    (resample.py:119-138): for warmed-up timesteps shift-left and append,
    otherwise fill the next free slot.
    """
    H = state.history.shape[1]

    def insert(carry, idx):
        history, counts = carry
        ti = t[idx]
        li = losses[idx]
        full = counts[ti] == H
        row = history[ti]
        shifted = jnp.concatenate([row[1:], jnp.array([li])])
        filled = row.at[jnp.clip(counts[ti], 0, H - 1)].set(li)
        new_row = jnp.where(full, shifted, filled)
        history = history.at[ti].set(new_row)
        counts = counts.at[ti].set(jnp.where(full, counts[ti], counts[ti] + 1))
        return (history, counts), None

    (history, counts), _ = jax.lax.scan(
        insert, (state.history, state.counts), jnp.arange(t.shape[0])
    )
    return LossAwareState(history=history, counts=counts)
