"""Pallas fused attention with in-kernel dropout, for the TRAINING path.

STATUS: HISTORICAL (superseded by attention_train_block.py; its bits-dump
utilities still back the train-block tests. See docs/DESIGN.md 'Kernel
inventory').

Motivation (docs/BENCHMARKS.md, round-3): attention-prob dropout costs the
fused train step ~10 ms at B=128 (48.7 vs the 39.0 ms no-dropout floor) and
neither rbg re-keying, operand-passed masks, nor remat recovers it — the
cost is materializing and re-reading the [B, H, S, S] prob/mask tensors
around XLA's attention fusion. This kernel never materializes them: QK^T,
additive row mask, stable softmax, Bernoulli mask from the TPU hardware
PRNG, and the PV matmul run per (batch) grid cell entirely in VMEM, and the
backward kernel RECOMPUTES the probabilities and REPLAYS the identical
PRNG bit sequence (same seed, same generation order) instead of reading a
saved mask.

custom_vjp residuals are only (q, k, v, mask_row, seed) — [B, S, D]-sized,
nothing quadratic in S touches HBM in either direction.

Testing strategy: the TPU PRNG has no CPU-interpret lowering, so every
kernel takes a static `use_prng` switch — False routes a caller-supplied
uint32 bits tensor through the same code path, which CPU interpret tests
check against a manual implementation (values AND gradients); a TPU-only
test then pins that the prng path equals the injected path given bits
dumped by `dropout_bits` (which replays the same sequence).

Reference behavior being reproduced: torch.nn.MultiheadAttention's
dropout on attention probabilities during training
(/root/reference/model/mdm.py:75-98 via nn.TransformerEncoderLayer).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ._mask import row_bias_contrib

_LANE = 128
_SUBLANE = 16


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _keep_threshold(rate: float) -> np.uint32:
    """uint32 threshold t with P(bits < t) == 1 - rate."""
    return np.uint32(min(int(round((1.0 - rate) * 2.0 ** 32)), 2 ** 32 - 1))


def _head_bits(h_idx, shape, use_prng, bits_ref):
    """Bits for one head: hardware PRNG (TPU) or injected tensor (tests).

    PRNG mode relies on call-order determinism: the forward and backward
    kernels seed identically and call prng_random_bits once per head in the
    same order, so the h-th call yields the same bits in both.
    """
    from jax.experimental.pallas import tpu as pltpu

    if use_prng:
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits_ref[0, h_idx]


def _fwd_kernel(num_heads, rate, use_prng, *refs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if use_prng:
        seed_ref, q_ref, k_ref, v_ref, m_ref, o_ref = refs
        bits_ref = None
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    else:
        q_ref, k_ref, v_ref, m_ref, bits_ref, o_ref = refs
    S = q_ref.shape[1]
    Dh = q_ref.shape[2] // num_heads
    mask = m_ref[0, 0, :]
    thr = _keep_threshold(rate)
    inv_keep = np.float32(1.0 / (1.0 - rate))
    for h in range(num_heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        qh = q_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logits = logits + mask[None, :]
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        bits = _head_bits(h, (S, S), use_prng, bits_ref)
        w = jnp.where(bits < thr, p * inv_keep, 0.0)
        o_ref[0, :, sl] = jax.lax.dot_general(
            w.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(num_heads, rate, use_prng, *refs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if use_prng:
        seed_ref, q_ref, k_ref, v_ref, m_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
        bits_ref = None
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    else:
        q_ref, k_ref, v_ref, m_ref, bits_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
    S = q_ref.shape[1]
    Dh = q_ref.shape[2] // num_heads
    mask = m_ref[0, 0, :]
    thr = _keep_threshold(rate)
    inv_keep = np.float32(1.0 / (1.0 - rate))
    for h in range(num_heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        qh = q_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        doh = do_ref[0, :, sl].astype(jnp.float32)
        # recompute probabilities (flash-style: nothing quadratic was saved)
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logits = logits + mask[None, :]
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        # replay the IDENTICAL bit sequence as the forward
        bits = _head_bits(h, (S, S), use_prng, bits_ref)
        keepf = jnp.where(bits < thr, inv_keep, 0.0)  # mask * 1/keep
        w = p * keepf
        # dV = W^T dO
        dv_ref[0, :, sl] = jax.lax.dot_general(
            w, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        # dW = dO V^T ; dP = keepf * dW ; dlogits = P*(dP - rowsum(dP*P))
        dw = jax.lax.dot_general(
            doh, vh.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = keepf * dw
        dlog = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_ref[0, :, sl] = jax.lax.dot_general(
            dlog, kh.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            dlog, qh.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _call_fwd(q, k, v, mask_row, seed, bits, num_heads, rate, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, D = q.shape
    use_prng = bits is None
    spec3 = pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_fwd_kernel, num_heads, rate, use_prng)
    common = dict(
        grid=(B,),
        out_specs=spec3,
        out_shape=jax.ShapeDtypeStruct((B, S, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * S * D,
            bytes_accessed=4 * B * S * D * q.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=interpret,
    )
    if use_prng:
        seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kern, in_specs=[seed_spec, spec3, spec3, spec3, mask_spec], **common
        )(jnp.asarray([seed], jnp.int32), q, k, v, mask_row)
    bits_spec = pl.BlockSpec(
        (1, num_heads, S, S), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern, in_specs=[spec3, spec3, spec3, mask_spec, bits_spec], **common
    )(q, k, v, mask_row, bits)


def _call_bwd(q, k, v, mask_row, seed, bits, do, num_heads, rate, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, D = q.shape
    use_prng = bits is None
    spec3 = pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, num_heads, rate, use_prng)
    common = dict(
        grid=(B,),
        out_specs=(spec3, spec3, spec3),
        out_shape=tuple(jax.ShapeDtypeStruct((B, S, D), q.dtype) for _ in range(3)),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * S * S * D,
            bytes_accessed=8 * B * S * D * q.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=interpret,
    )
    if use_prng:
        seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kern, in_specs=[seed_spec, spec3, spec3, spec3, mask_spec, spec3], **common
        )(jnp.asarray([seed], jnp.int32), q, k, v, mask_row, do)
    bits_spec = pl.BlockSpec(
        (1, num_heads, S, S), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern, in_specs=[spec3, spec3, spec3, mask_spec, bits_spec, spec3], **common
    )(q, k, v, mask_row, bits, do)


def dropout_bits(seed: int, B: int, num_heads: int, S: int, interpret=False):
    """Dump the exact bit tensor the prng kernels consume (tests only)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        for h in range(num_heads):
            out_ref[0, h] = pltpu.bitcast(
                pltpu.prng_random_bits((S, S)), jnp.uint32
            )

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, num_heads, S, S), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, num_heads, S, S), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32))


# ---------------------------------------------------------------------------
# custom_vjp wrapper over padded, pre-scaled operands
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _attention_core(q, k, v, mask_row, seed, num_heads, rate, interpret):
    return _call_fwd(q, k, v, mask_row, seed, None, num_heads, rate, interpret)


def _attention_core_fwd(q, k, v, mask_row, seed, num_heads, rate, interpret):
    out = _call_fwd(q, k, v, mask_row, seed, None, num_heads, rate, interpret)
    return out, (q, k, v, mask_row, seed)


def _attention_core_bwd(num_heads, rate, interpret, res, do):
    q, k, v, mask_row, seed = res
    dq, dk, dv = _call_bwd(
        q, k, v, mask_row, seed, None, do, num_heads, rate, interpret
    )
    dseed = np.zeros(seed.shape, jax.dtypes.float0)  # integer input
    return dq, dk, dv, jnp.zeros_like(mask_row), dseed


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


def _pad_operands(q, k, v, num_heads, key_padding_mask, pad_multiple=None):
    B, S, D = q.shape
    Dh = D // num_heads
    # Minimal padding: Mosaic masks partial 128-lane tiles itself, so padding
    # to the bf16 sublane multiple (16) is enough and avoids the 197->256
    # FLOP blow-up (256^2/197^2 = 1.69x on every attention matmul).
    m = pad_multiple or _SUBLANE
    S_pad = max(_pad_to(S, m), m)
    q = q * np.float32(1.0 / np.sqrt(Dh))
    pad = [(0, 0), (0, S_pad - S), (0, 0)]
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    mask_row = jnp.zeros((B, 1, S_pad), jnp.float32)
    mask_row = mask_row.at[:, :, S:].set(-1e9)
    if key_padding_mask is not None:
        mask_row = mask_row.at[:, 0, :S].add(
            row_bias_contrib(key_padding_mask)
        )
    return qp, kp, vp, mask_row


def fused_dropout_attention(
    q: jnp.ndarray,  # [B, S, D] heads packed in D
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    rate: float,
    seed,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] bool True=ignore, or additive f32 row
    interpret: bool = False,
) -> jnp.ndarray:
    """Training attention with prob-dropout, differentiable (custom VJP)."""
    S = q.shape[1]
    qp, kp, vp, mask_row = _pad_operands(q, k, v, num_heads, key_padding_mask)
    seed = jnp.asarray(seed, jnp.int32).reshape(())
    out = _attention_core(
        qp, kp, vp, mask_row, seed, num_heads, float(rate), interpret
    )
    return out[:, :S]
