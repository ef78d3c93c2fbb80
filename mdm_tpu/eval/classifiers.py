"""GRU action classifier (action2motion) for HumanAct12 evaluation.

Port target: /root/reference/eval/a2m/action2motion/models.py
(MotionDiscriminator / MotionDiscriminatorForFID): a plain multi-layer GRU
over xyz joint sequences, last-valid hidden state -> tanh linear -> logits;
the 30-d tanh layer doubles as the FID feature.
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MotionDiscriminator(nn.Module):
    """[B, T, input_size] + lengths -> dict(features [B, 30], yhat [B, C])."""

    input_size: int
    hidden_size: int = 128
    hidden_layers: int = 2
    output_size: int = 12

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        B, T, _ = x.shape
        H = self.hidden_size
        h = x
        for layer in range(self.hidden_layers):
            w_ih = self.param(f"w_ih_l{layer}", nn.initializers.lecun_normal(), (h.shape[-1], 3 * H))
            w_hh = self.param(f"w_hh_l{layer}", nn.initializers.lecun_normal(), (H, 3 * H))
            b_ih = self.param(f"b_ih_l{layer}", nn.initializers.zeros, (3 * H,))
            b_hh = self.param(f"b_hh_l{layer}", nn.initializers.zeros, (3 * H,))
            gates_x = h @ w_ih + b_ih

            def step(hc, gx):
                gh = hc @ w_hh + b_hh
                xr, xz, xn = jnp.split(gx, 3, axis=-1)
                hr, hz, hn = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1 - z) * n + z * hc
                return h_new, h_new

            h0 = jnp.zeros((B, H), x.dtype)
            _, hs = jax.lax.scan(step, h0, jnp.swapaxes(gates_x, 0, 1))
            h = jnp.swapaxes(hs, 0, 1)  # [B, T, H]

        idx = (lengths - 1)[:, None, None]
        last = jnp.take_along_axis(h, jnp.broadcast_to(idx, (B, 1, H)), axis=1)[:, 0]
        feat = jnp.tanh(nn.Dense(30, name="linear1")(last))
        yhat = nn.Dense(self.output_size, name="linear2")(feat)
        return {"features": feat, "yhat": yhat}


def convert_motion_discriminator(sd: Mapping[str, np.ndarray], hidden_layers: int = 2) -> Dict:
    """torch MotionDiscriminator state_dict -> flax params.

    NOTE: the reference classifier runs with a *random* initial hidden state
    each call (models.py:40-41). We use zeros — deterministic, and consistent
    across gt/generated sides, which only stabilizes the metric.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    t = lambda w: np.ascontiguousarray(w.T)
    params = {
        "linear1": {"kernel": t(sd["linear1.weight"]), "bias": sd["linear1.bias"]},
        "linear2": {"kernel": t(sd["linear2.weight"]), "bias": sd["linear2.bias"]},
    }
    for k in range(hidden_layers):
        params[f"w_ih_l{k}"] = t(sd[f"recurrent.weight_ih_l{k}"])
        params[f"w_hh_l{k}"] = t(sd[f"recurrent.weight_hh_l{k}"])
        params[f"b_ih_l{k}"] = sd[f"recurrent.bias_ih_l{k}"]
        params[f"b_hh_l{k}"] = sd[f"recurrent.bias_hh_l{k}"]
    return {"params": params}
