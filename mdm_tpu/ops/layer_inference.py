"""Pallas fused WHOLE-LAYER inference kernel: attention block + encoder tail
as ONE program per batch cell.

The shipped round-4 sampling default runs two Pallas programs per encoder
layer — fused_block_attention_inference (projections + attention + out
projection) then fused_encoder_tail_inference (LN1 + FFN + LN2). That
boundary still round-trips the [B,S,D] attention tensor through HBM once
per layer in each direction, plus a second read of x by the tail: 5 [B,S,D]
HBM transits per layer where 2 (read x, write z) are fundamental. VERDICT
r4 item 5 flagged the forward-only whole-layer fusion as untried — unlike
the refuted monolithic *training* kernel, the inference layer needs no VJP,
no residual stash, and roughly half the VMEM.

Per grid cell b the kernel reads x[b] once, holds all ten weight tensors
VMEM-resident (grid-invariant blocks), runs the attention block into a VMEM
scratch, feeds it straight into the tail math, and writes only z[b]. The
attention half is literally attention_train_block's rate-0 forward body and
the tail half is encoder_tail's rate-0 `_recompute` — same helpers, same
op order, same f32 accumulation and bf16 casts — so the fused layer is
BITWISE identical to the two-kernel path it replaces (pinned by tests).

Scope: deterministic (sampling/eval) self-attention encoder layers — the
flagship trans_enc forward and both halves of the eval protocol. Training
keeps the two-kernel path (its custom_vjps need the boundary); the decoder
cross-attention half keeps block+tail.

Reference behavior being reproduced: one full torch.nn.TransformerEncoderLayer
(post-norm, exact-erf GELU) in eval mode (/root/reference/model/mdm.py:75-98).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ._mask import row_bias_contrib
from .attention_train_block import _proj, _softmax_rows
from .encoder_tail import _recompute

_SUBLANE = 16  # bf16 sublane multiple; also a multiple of the f32 one (8)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _layer_kernel(num_heads, *refs):
    (x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
     m_ref, g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, bl2_ref,
     z_ref, ctx_ref) = refs

    xb = x_ref[0]  # [S, D]
    S, D = xb.shape
    Dh = D // num_heads

    # ---- attention block: identical math to attention_train_block's
    # rate-0 forward (q/k/v projections, per-head softmax(QK^T/sqrt(dh)+m)V,
    # out projection) so the fused layer is bitwise equal to the 2-kernel
    # path.
    q = _proj(xb, wq_ref, bq_ref)
    k = _proj(xb, wk_ref, bk_ref)
    v = _proj(xb, wv_ref, bv_ref)
    mask = m_ref[0, 0, :]
    scale = np.float32(1.0 / np.sqrt(Dh))
    for h in range(num_heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask[None, :]
        p = _softmax_rows(logits)
        ctx_ref[:, sl] = jax.lax.dot_general(
            p.astype(xb.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xb.dtype)
    attn = (jax.lax.dot_general(
        ctx_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0].astype(jnp.float32)).astype(xb.dtype)

    # ---- tail: encoder_tail's rate-0 forward body (LN1 -> FFN(GELU) ->
    # LN2), consuming the attention output straight from VMEM.
    param_refs = (g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref,
                  bl2_ref)
    r = _recompute(xb, attn, param_refs, 0.0, False, None)
    z_ref[0] = r["z32"].astype(z_ref.dtype)


def _call_layer(x, attn_params, mask_row, tail_params, num_heads, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, D = x.shape
    F = tail_params[2].shape[1]
    cell = pl.BlockSpec((1, S, D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    w_dd = pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    vec_f = pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM)
    w1s = pl.BlockSpec((D, F), lambda b: (0, 0), memory_space=pltpu.VMEM)
    w2s = pl.BlockSpec((F, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    m_s = pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_layer_kernel, num_heads),
        grid=(B,),
        in_specs=[cell, *([w_dd, vec_d] * 4), m_s,
                  vec_d, vec_d, w1s, vec_f, w2s, vec_d, vec_d, vec_d],
        out_specs=cell,
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((S, D), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=B * (8 * S * D * D + 4 * S * S * D + 4 * S * D * F),
            bytes_accessed=(2 * B * S * D + 4 * D * D + 2 * D * F)
            * x.dtype.itemsize,
            transcendentals=B * (num_heads * S * S + S * F),
        ),
        interpret=interpret,
    )(x, *attn_params, mask_row, *tail_params)


def fused_layer_inference(
    x: jnp.ndarray,  # [B, S, D] heads packed in D
    wq, bq, wk, bk, wv, bv, wo, bo,  # attention [D, D] kernels / [D] biases
    g1, bl1,  # norm1 scale/bias [D]
    w1, b1,   # linear1 kernel [D, F] / bias [F]
    w2, b2,   # linear2 kernel [F, D] / bias [D]
    g2, bl2,  # norm2 scale/bias [D]
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] bool True=ignore, or additive f32 row
    interpret: bool = False,
) -> jnp.ndarray:
    """One full post-LN encoder layer, forward-only (sampling/eval)."""
    B, S, D = x.shape
    S_pad = max(_pad_to(S, _SUBLANE), _SUBLANE)
    xp = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
    mask_row = jnp.zeros((B, 1, S_pad), jnp.float32).at[:, :, S:].set(-1e9)
    if key_padding_mask is not None:
        mask_row = mask_row.at[:, 0, :S].add(row_bias_contrib(key_padding_mask))
    dt = x.dtype
    row = lambda v: v.reshape(1, -1).astype(dt)
    attn_params = (wq.astype(dt), row(bq), wk.astype(dt), row(bk),
                   wv.astype(dt), row(bv), wo.astype(dt), row(bo))
    tail_params = (row(g1), row(bl1), w1.astype(dt), row(b1), w2.astype(dt),
                   row(b2), row(g2), row(bl2))
    out = _call_layer(xp, attn_params, mask_row, tail_params, num_heads,
                      interpret)
    return out[:, :S]
