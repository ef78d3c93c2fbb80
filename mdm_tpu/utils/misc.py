"""Small utilities (reference utils/misc.py equivalents that survive the
functional redesign — WeightedSum became stacked weights in EmbedTargetLoc;
wrapped_getattr is unnecessary without wrapper nn.Modules)."""
from __future__ import annotations

import jax.numpy as jnp


def freeze_joints(x: jnp.ndarray, joints_to_freeze) -> jnp.ndarray:
    """Freeze selected joints' rotations to their first-frame values.

    x: [B, T, J, F] (canonical layout; reference misc.py:69-74 uses
    [B, J, F, T]). Returns a copy with the frozen joints broadcast from t=0.
    """
    idx = jnp.asarray(list(joints_to_freeze))
    first = x[:, :1, idx, :]  # [B, 1, len(idx), F]
    return x.at[:, :, idx, :].set(jnp.broadcast_to(first, x[:, :, idx, :].shape))


def to_numpy(x):
    import numpy as np

    return np.asarray(x)
