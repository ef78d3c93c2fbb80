"""Shared key-padding handling for the fused attention kernels.

Every kernel consumes an ADDITIVE f32 row bias (added to the attention
logits). Callers may pass either a bool mask [B, S] (True = ignore, the
torch key_padding_mask convention, converted to 0/-1e9 here) or an already
additive float row [B, S] — the latter is forwarded exactly, so finite
biases survive the kernel path losslessly (ADVICE r4: the old call sites
binarized via `< -1e8`, silently corrupting any finite bias).
"""
from __future__ import annotations

import jax.numpy as jnp


def row_bias_contrib(mask_or_bias: jnp.ndarray) -> jnp.ndarray:
    """[B, S] bool mask or float additive row -> f32 additive row [B, S]."""
    if jnp.issubdtype(mask_or_bias.dtype, jnp.bool_):
        return jnp.where(mask_or_bias, -1e9, 0.0).astype(jnp.float32)
    return mask_or_bias.astype(jnp.float32)
