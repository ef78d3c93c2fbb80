"""Pallas fused attention v2: batch-tiled, heads looped in-kernel.

STATUS: HISTORICAL (measured: wins B=32 sampling, loses B=128; superseded
by the whole-block kernel. Kept opt-in. See docs/DESIGN.md 'Kernel
inventory').

Motivated by a profiler trace of the sampling scan (docs/DESIGN.md §7): the
per-layer attention chain is XLA's most expensive fusion (~0.28 ms/layer/
step at B=64, S=197) while all gemms run at MXU peak. This kernel:

- takes q/k/v directly in the model's [B, S, H*Dh] layout — the [B,S,H,Dh]
  <-> [B,H,S,Dh] transposes of the einsum path disappear entirely;
- grids over the batch only; each cell computes all heads with
  [S_pad, Dh] x [Dh, S_pad] MXU matmuls and an in-VMEM f32 softmax;
- masking is a [B, S_pad] additive row (broadcast in-kernel), not a
  materialized [B, 1, S, S] bias.

The wrapper pads S to the 128-lane multiple once per call; padded keys get
-1e9 mask, padded query rows are sliced away.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ._mask import row_bias_contrib

_LANE = 128


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_attention_v2(q, k, v, mask_row, num_heads: int, interpret: bool = False):
    """q/k/v [B, S_pad, D]; mask_row [B, 1, S_pad] additive f32 -> [B, S_pad, D]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, D = q.shape
    Dh = D // num_heads

    def kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        mask = m_ref[0, 0, :]  # [S]
        for h in range(num_heads):
            sl = slice(h * Dh, (h + 1) * Dh)
            qh = q_ref[0, :, sl]  # [S, Dh]
            kh = k_ref[0, :, sl]
            vh = v_ref[0, :, sl]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            logits = logits + mask[None, :]
            mx = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[0, :, sl] = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)

    spec3 = pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec3, spec3, spec3, mask_spec],
        out_specs=spec3,
        out_shape=jax.ShapeDtypeStruct((B, S, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * S * D,
            bytes_accessed=4 * B * S * D * q.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=interpret,
    )(q, k, v, mask_row)


def fused_attention_v2(
    q: jnp.ndarray,  # [B, S, D] (heads packed in D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] bool True=ignore, or additive f32 row
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, D = q.shape
    Dh = D // num_heads
    S_pad = max(_pad_to(S, _LANE), _LANE)

    q = q * (1.0 / np.sqrt(Dh))
    pad = [(0, 0), (0, S_pad - S), (0, 0)]
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    mask_row = jnp.zeros((B, 1, S_pad), jnp.float32)
    mask_row = mask_row.at[:, :, S:].set(-1e9)
    if key_padding_mask is not None:
        mask_row = mask_row.at[:, 0, :S].add(
            row_bias_contrib(key_padding_mask)
        )

    out = _fused_attention_v2(qp, kp, vp, mask_row, num_heads, interpret)
    return out[:, :S]
