"""Pallas fused attention BLOCK: q/k/v projections + attention + out-proj.

STATUS: HISTORICAL (forward-only precursor of attention_train_block.py,
which ships instead. Kept opt-in. See docs/DESIGN.md 'Kernel inventory').

Third iteration of the attention kernel line (see docs/DESIGN.md §7): v1/v2
lose end-to-end because any pallas_call boundary forces q/k/v to round-trip
HBM while XLA fuses them away. This kernel moves the whole attention block
into one program, so per (batch-cell): one x read, one output write, weights
resident in VMEM (Mosaic skips re-fetch of grid-invariant blocks).

Scope: self-attention with optional key-padding row mask (the denoiser's
only masking pattern), no attention dropout -> sampling/serving path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_block(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row,
                 num_heads: int, interpret: bool = False):
    """x [B, S, D] (padded); weights [D, D]; biases [1, D]; mask [B, 1, S]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, D = x.shape
    Dh = D // num_heads

    def kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
               wo_ref, bo_ref, m_ref, o_ref, attn_scratch):
        xb = x_ref[0]  # [S, D]
        f32 = jnp.float32

        def proj(w_ref, b_ref):
            h = jax.lax.dot_general(
                xb, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
            ) + b_ref[0].astype(f32)
            return h.astype(xb.dtype)

        q = proj(wq_ref, bq_ref)
        k = proj(wk_ref, bk_ref)
        v = proj(wv_ref, bv_ref)

        mask = m_ref[0, 0, :]
        scale = 1.0 / np.sqrt(Dh)
        for h in range(num_heads):
            sl = slice(h * Dh, (h + 1) * Dh)
            logits = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ) * scale
            logits = logits + mask[None, :]
            mx = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            attn_scratch[:, sl] = jax.lax.dot_general(
                p.astype(xb.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ).astype(xb.dtype)

        out = jax.lax.dot_general(
            attn_scratch[...], wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bo_ref[0].astype(f32)
        o_ref[0] = out.astype(o_ref.dtype)

    x_spec = pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[x_spec, w_spec, b_spec, w_spec, b_spec, w_spec, b_spec,
                  w_spec, b_spec, m_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((S, D), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=B * (8 * S * D * D + 4 * S * S * D),
            bytes_accessed=(2 * B * S * D + 4 * D * D) * x.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=interpret,
    )(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row)


def fused_attention_block(
    x: jnp.ndarray,  # [B, S, D]
    wq, bq, wk, bk, wv, bv, wo, bo,  # [D, D] kernels / [D] biases
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] bool True=ignore
    interpret: bool = False,
) -> jnp.ndarray:
    """Full attention block on the model's [B, S, D] layout."""
    B, S, D = x.shape
    S_pad = max(_pad_to(S, _LANE), _LANE)

    xp = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
    mask_row = jnp.zeros((B, 1, S_pad), jnp.float32).at[:, :, S:].set(-1e9)
    if key_padding_mask is not None:
        mask_row = mask_row.at[:, 0, :S].add(
            jnp.where(key_padding_mask, -1e9, 0.0).astype(jnp.float32)
        )

    dt = x.dtype
    as2 = lambda b: b.reshape(1, D).astype(dt)
    out = _fused_block(
        xp, wq.astype(dt), as2(bq), wk.astype(dt), as2(bk), wv.astype(dt),
        as2(bv), wo.astype(dt), as2(bo), mask_row, num_heads, interpret,
    )
    return out[:, :S]
