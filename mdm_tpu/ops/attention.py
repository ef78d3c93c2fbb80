"""Pallas TPU kernel: fused multi-head attention for short sequences.

STATUS: HISTORICAL (measured negative result — loses to XLA; kept opt-in.
Shipped kernels: attention_train_block.py + encoder_tail.py. See
docs/DESIGN.md 'Kernel inventory').

The MDM denoiser attends over <=~224 tokens (196 frames + condition tokens)
at head_dim 128 — the whole (S, Dh) tile of one (batch, head) fits in VMEM
with room to spare. This kernel fuses QK^T -> bias add -> softmax -> PV into
a single VMEM-resident pass (one HBM read per operand, one write for the
output, no [B,H,S,S] probability tensor ever hitting HBM).

Usage: `fused_attention(q, k, v, bias)` with [B, H, S, D] operands; falls
back to the pure-XLA einsum path on non-TPU backends or when shapes don't
meet the tiling constraints. Exposed to the model via
MultiHeadAttention(use_pallas=...) — wired in `mdm_tpu.ops.enable()`.
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


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    """One (batch, head) tile: q,k,v [S, D] in VMEM; bias [S, S]."""
    q = q_ref[...]  # pre-scaled by 1/sqrt(true head_dim) in the wrapper
    k = k_ref[...]
    v = v_ref[...]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits + bias_ref[...]
    # Numerically-stable softmax in f32 on the VPU.
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    out_ref[...] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_attention_pallas(q, k, v, bias, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    grid = (B, H)

    def qkv_spec():
        return pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    bias_spec = pl.BlockSpec(
        (1, 1, S, S), lambda b, h: (b, 0 if bias.shape[1] == 1 else h, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
        _attention_kernel(
            q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0], b_ref.at[0, 0],
            o_ref.at[0, 0],
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec(), qkv_spec(), qkv_spec(), bias_spec],
        out_specs=pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * S * S * D * 2,
            bytes_accessed=(3 * B * H * S * D + B * H * S * D) * q.dtype.itemsize,
            transcendentals=B * H * S * S,
        ),
        interpret=interpret,
    )(q, k, v, bias)


def xla_attention(q, k, v, bias):
    """Reference einsum path (always available)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def fused_attention(
    q: jnp.ndarray,  # [B, H, S, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,  # [B, 1|H, S, S] additive
    interpret: bool = False,
    force_pallas: bool = False,
) -> jnp.ndarray:
    """Pad to TPU tiles, run the fused kernel, slice back.

    Falls back to XLA when not on TPU (unless interpret/force flags set).
    """
    on_tpu = any(d.platform == "tpu" for d in jax.devices()) or jax.default_backend() in ("tpu", "axon")
    if not (on_tpu or interpret or force_pallas):
        return xla_attention(q, k, v, bias)

    B, H, S, D = q.shape
    S_pad = max(_pad_to(S, _LANE), _LANE)
    D_pad = max(_pad_to(D, _LANE), _LANE)

    if bias is None:
        bias = jnp.zeros((B, 1, S, S), jnp.float32)
    if bias.ndim == 4 and bias.shape[2] == 1:
        bias = jnp.broadcast_to(bias, (B, bias.shape[1], S, S))

    pad_qkv = [(0, 0), (0, 0), (0, S_pad - S), (0, D_pad - D)]
    # Fold the softmax scale into q BEFORE padding (the kernel must scale by
    # the true head_dim, not the padded one).
    q = q * (1.0 / np.sqrt(D))
    qp = jnp.pad(q, pad_qkv)
    kp = jnp.pad(k, pad_qkv)
    vp = jnp.pad(v, pad_qkv)
    # Padding keys must never receive attention mass.
    bias_p = jnp.pad(
        bias.astype(jnp.float32),
        [(0, 0), (0, 0), (0, S_pad - S), (0, S_pad - S)],
        constant_values=-1e9,
    )
    # Padded *query* rows softmax over all -1e9 -> uniform; harmless, sliced off.
    bias_p = bias_p.at[:, :, S:, :].set(0.0)

    out = _fused_attention_pallas(qp, kp, vp, bias_p, interpret=interpret)
    return out[:, :, :S, :D]
