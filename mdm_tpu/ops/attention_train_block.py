"""Pallas fused TRAINING attention block: projections + attention + dropout.

The one kernel VERDICT r3 flagged as untried: merge ops/attention_block.py
(q/k/v/out projections fused into the attention program, so q/k/v never
round-trip HBM at a pallas boundary) with ops/attention_dropout.py's
in-kernel seed-replayed dropout VJP. Per (batch) grid cell the forward
reads x once, holds the four weight matrices VMEM-resident (grid-invariant
blocks), computes q/k/v, per-head QK^T -> additive row mask -> stable
softmax -> Bernoulli mask from the TPU hardware PRNG -> PV, then the out
projection — one x read, one out write. The backward kernel RECOMPUTES
q/k/v and the probabilities and REPLAYS the identical PRNG bit sequence
(same per-cell seed, same per-head generation order), producing dx per cell
and accumulating dW/db across the batch grid into constant-index-map f32
output blocks. custom_vjp residuals are (x, weights, mask_row, seed) —
nothing quadratic in S touches HBM in either direction, and no [B,H,S,S]
prob/mask tensor ever exists.

Testing strategy (same as attention_dropout): the TPU PRNG has no CPU
interpret lowering, so every kernel takes a static `use_prng` switch —
False routes a caller-supplied uint32 bits tensor through the same code
path, which CPU interpret tests check against a manual implementation
(values AND all nine gradients); a TPU-only test pins that the prng path
equals the injected path given bits dumped by attention_dropout.dropout_bits
(identical seeding/order contract).

Reference behavior being reproduced: torch.nn.MultiheadAttention — packed
qkv projection, per-head softmax(QK^T/sqrt(dh)) with training dropout on
the probabilities, out projection (/root/reference/model/mdm.py:75-98 via
nn.TransformerEncoderLayer).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ._mask import row_bias_contrib

_SUBLANE = 16  # bf16 sublane multiple; also a multiple of the f32 one (8)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _keep_threshold(rate: float) -> np.uint32:
    """uint32 threshold t with P(bits < t) == 1 - rate."""
    return np.uint32(min(int(round((1.0 - rate) * 2.0 ** 32)), 2 ** 32 - 1))


def _head_bits(h_idx, shape, use_prng, bits_ref):
    """Bits for one head: hardware PRNG (TPU) or injected tensor (tests)."""
    from jax.experimental.pallas import tpu as pltpu

    if use_prng:
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits_ref[0, h_idx]


def _proj(xb, w_ref, b_ref):
    """[S, D] @ [D, D] + [1, D], f32 accumulate, back to x's dtype."""
    h = jax.lax.dot_general(
        xb, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0].astype(jnp.float32)
    return h.astype(xb.dtype)


def _softmax_rows(logits):
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(num_heads, rate, use_prng, *refs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if use_prng:
        (seed_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
         wo_ref, bo_ref, m_ref, o_ref, ctx_ref) = refs
        bits_ref = None
        if rate > 0.0:  # static: the rate-0 (inference) variant draws no bits
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    else:
        (x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
         wo_ref, bo_ref, m_ref, bits_ref, o_ref, ctx_ref) = refs
    xb = x_ref[0]  # [S, D]
    S, D = xb.shape
    Dh = D // num_heads
    q = _proj(xb, wq_ref, bq_ref)
    k = _proj(xb, wk_ref, bk_ref)
    v = _proj(xb, wv_ref, bv_ref)
    mask = m_ref[0, 0, :]
    scale = np.float32(1.0 / np.sqrt(Dh))
    thr = _keep_threshold(rate)
    inv_keep = np.float32(1.0 / (1.0 - rate))
    for h in range(num_heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask[None, :]
        p = _softmax_rows(logits)
        if rate > 0.0:
            bits = _head_bits(h, (S, S), use_prng, bits_ref)
            w = jnp.where(bits < thr, p * inv_keep, 0.0)
        else:
            w = p
        ctx_ref[:, sl] = jax.lax.dot_general(
            w.astype(xb.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xb.dtype)
    out = jax.lax.dot_general(
        ctx_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(num_heads, rate, use_prng, *refs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if use_prng:
        (seed_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
         wo_ref, m_ref, do_ref,
         dx_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
         dwo_ref, dbo_ref) = refs
        bits_ref = None
        if rate > 0.0:  # static: mirror the forward — at rate 0 no bits are
            # drawn there, so the replay must not seed/draw either (a draw
            # would zero a kept element with p=2^-32 per element).
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    else:
        (x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
         wo_ref, m_ref, bits_ref, do_ref,
         dx_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
         dwo_ref, dbo_ref) = refs

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dbk_ref[...] = jnp.zeros_like(dbk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    xb = x_ref[0]  # [S, D]
    S, D = xb.shape
    Dh = D // num_heads
    dt = xb.dtype
    # Recompute the projections (flash-style: nothing was saved).
    q = _proj(xb, wq_ref, bq_ref)
    k = _proj(xb, wk_ref, bk_ref)
    v = _proj(xb, wv_ref, bv_ref)
    mask = m_ref[0, 0, :]
    scale = np.float32(1.0 / np.sqrt(Dh))
    thr = _keep_threshold(rate)
    inv_keep = np.float32(1.0 / (1.0 - rate))

    dob = do_ref[0].astype(dt)  # [S, D]
    # dctx = dO @ Wo^T ; dWo/dbo accumulate below, per head / directly.
    dctx = jax.lax.dot_general(
        dob, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo_ref[...] += jnp.sum(do_ref[0].astype(jnp.float32), axis=0,
                            keepdims=True)

    dx = jnp.zeros((S, D), jnp.float32)
    for h in range(num_heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask[None, :]
        p = _softmax_rows(logits)
        if rate > 0.0:
            # Replay the IDENTICAL bit sequence as the forward.
            bits = _head_bits(h, (S, S), use_prng, bits_ref)
            keepf = jnp.where(bits < thr, inv_keep, 0.0)
        else:  # static: forward drew no bits at rate 0 — neither do we
            keepf = jnp.float32(1.0)
        w16 = (p * keepf).astype(dt)  # [S, S]
        dctx_h = dctx[:, sl].astype(dt)  # [S, Dh]
        # dWo rows for this head: ctx_h^T @ dO
        ctx_h = jax.lax.dot_general(
            w16, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(dt)
        dwo_ref[sl, :] += jax.lax.dot_general(
            ctx_h, dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dV_h = W^T dctx_h
        dv_h = jax.lax.dot_general(
            w16, dctx_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        # dW = dctx_h V_h^T ; dP = keepf*dW ; dlogits = P*(dP - rowsum(dP*P))
        dw = jax.lax.dot_general(
            dctx_h, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = keepf * dw
        dlog = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
                ).astype(dt)
        dq_h = jax.lax.dot_general(
            dlog, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(dt)
        dk_h = jax.lax.dot_general(
            dlog, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(dt)
        # Projection-weight grads: dW*[:, sl] += x^T @ d*_h ; db* += colsum.
        dwq_ref[:, sl] += jax.lax.dot_general(
            xb, dq_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dbq_ref[0, sl] += jnp.sum(dq_h.astype(jnp.float32), axis=0)
        dwk_ref[:, sl] += jax.lax.dot_general(
            xb, dk_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dbk_ref[0, sl] += jnp.sum(dk_h.astype(jnp.float32), axis=0)
        dwv_ref[:, sl] += jax.lax.dot_general(
            xb, dv_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dbv_ref[0, sl] += jnp.sum(dv_h.astype(jnp.float32), axis=0)
        # dx += dq_h Wq[:, sl]^T + dk_h Wk[:, sl]^T + dv_h Wv[:, sl]^T
        dx += jax.lax.dot_general(
            dq_h, wq_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx += jax.lax.dot_general(
            dk_h, wk_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx += jax.lax.dot_general(
            dv_h, wv_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _specs(B, S, D):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return dict(
        x=pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        w=pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        b=pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        m=pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        seed=pl.BlockSpec(memory_space=pltpu.SMEM),
    )


def _call_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, seed, bits,
              num_heads, rate, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, D = x.shape
    use_prng = bits is None
    sp = _specs(B, S, D)
    kern = functools.partial(_fwd_kernel, num_heads, rate, use_prng)
    common = dict(
        grid=(B,),
        out_specs=sp["x"],
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((S, D), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=B * (8 * S * D * D + 4 * S * S * D),
            bytes_accessed=(2 * B * S * D + 4 * D * D) * x.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=interpret,
    )
    weight_specs = [sp["w"], sp["b"]] * 4
    if use_prng:
        return pl.pallas_call(
            kern, in_specs=[sp["seed"], sp["x"], *weight_specs, sp["m"]],
            **common,
        )(jnp.asarray([seed], jnp.int32), x, wq, bq, wk, bk, wv, bv, wo, bo,
          mask_row)
    bits_spec = pl.BlockSpec(
        (1, num_heads, S, S), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern, in_specs=[sp["x"], *weight_specs, sp["m"], bits_spec], **common
    )(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, bits)


def _call_bwd(x, wq, bq, wk, bk, wv, bv, wo, mask_row, seed, bits, do,
              num_heads, rate, interpret):
    from jax.experimental import pallas as pl

    B, S, D = x.shape
    use_prng = bits is None
    sp = _specs(B, S, D)
    kern = functools.partial(_bwd_kernel, num_heads, rate, use_prng)
    f32 = jnp.float32
    # Accumulator outputs (constant index map -> one VMEM-resident block
    # revisited by every grid cell, written back once) + per-cell dx.
    acc_w = pl.BlockSpec(
        (D, D), lambda b: (0, 0), memory_space=sp["w"].memory_space)
    acc_b = pl.BlockSpec(
        (1, D), lambda b: (0, 0), memory_space=sp["b"].memory_space)
    common = dict(
        grid=(B,),
        out_specs=(sp["x"], acc_w, acc_b, acc_w, acc_b, acc_w, acc_b,
                   acc_w, acc_b),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
            jax.ShapeDtypeStruct((D, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, D), f32), jax.ShapeDtypeStruct((1, D), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * (22 * S * D * D + 14 * S * S * D),
            bytes_accessed=(3 * B * S * D + 12 * D * D) * x.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=interpret,
    )
    weight_specs = [sp["w"], sp["b"]] * 3 + [sp["w"]]
    if use_prng:
        return pl.pallas_call(
            kern,
            in_specs=[sp["seed"], sp["x"], *weight_specs, sp["m"], sp["x"]],
            **common,
        )(jnp.asarray([seed], jnp.int32), x, wq, bq, wk, bk, wv, bv, wo,
          mask_row, do)
    bits_spec = pl.BlockSpec(
        (1, num_heads, S, S), lambda b: (b, 0, 0, 0),
        memory_space=sp["x"].memory_space,
    )
    return pl.pallas_call(
        kern,
        in_specs=[sp["x"], *weight_specs, sp["m"], bits_spec, sp["x"]],
        **common,
    )(x, wq, bq, wk, bk, wv, bv, wo, mask_row, bits, do)


# ---------------------------------------------------------------------------
# custom_vjp wrapper over padded operands
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _block_core(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, seed,
                num_heads, rate, interpret):
    return _call_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, seed, None,
                     num_heads, rate, interpret)


def _block_core_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, seed,
                    num_heads, rate, interpret):
    out = _call_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, seed, None,
                    num_heads, rate, interpret)
    return out, (x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, seed)


def _block_core_bwd(num_heads, rate, interpret, res, do):
    x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, seed = res
    (dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo) = _call_bwd(
        x, wq, bq, wk, bk, wv, bv, wo, mask_row, seed, None, do,
        num_heads, rate, interpret,
    )
    cast = lambda g, p: g.astype(p.dtype)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)  # integer input
    return (dx, cast(dwq, wq), cast(dbq, bq), cast(dwk, wk), cast(dbk, bk),
            cast(dwv, wv), cast(dbv, bv), cast(dwo, wo),
            cast(dbo, bo), jnp.zeros_like(mask_row), dseed)


_block_core.defvjp(_block_core_fwd, _block_core_bwd)


def fused_train_attention_block(
    x: jnp.ndarray,  # [B, S, D] heads packed in D
    wq, bq, wk, bk, wv, bv, wo, bo,  # [D, D] kernels / [D] biases
    num_heads: int,
    rate: float,
    seed,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] bool True=ignore, or additive f32 row
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole training attention block with prob-dropout, differentiable."""
    B, S, D = x.shape
    S_pad = max(_pad_to(S, _SUBLANE), _SUBLANE)
    xp = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
    mask_row = jnp.zeros((B, 1, S_pad), jnp.float32).at[:, :, S:].set(-1e9)
    if key_padding_mask is not None:
        mask_row = mask_row.at[:, 0, :S].add(
            row_bias_contrib(key_padding_mask)
        )
    dt = x.dtype
    as2 = lambda b: b.reshape(1, D).astype(dt)
    seed = jnp.asarray(seed, jnp.int32).reshape(())
    out = _block_core(
        xp, wq.astype(dt), as2(bq), wk.astype(dt), as2(bk), wv.astype(dt),
        as2(bv), wo.astype(dt), as2(bo), mask_row, seed,
        num_heads, float(rate), interpret,
    )
    return out[:, :S]


def fused_block_attention_inference(
    x: jnp.ndarray,  # [B, S, D] heads packed in D
    wq, bq, wk, bk, wv, bv, wo, bo,
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] bool True=ignore, or additive f32 row
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward-only whole attention block for SAMPLING (rate=0, no PRNG).

    Same program as the training kernel minus dropout: per batch cell, one
    x read, VMEM-resident projection weights, per-head softmax(QK^T/√dh+m)V,
    out projection, one write — the [B,H,S,S] probabilities never exist in
    HBM, targeting the CFG double-batch regime where XLA's attention
    mega-fusion goes HBM-heavy (docs/BENCHMARKS.md sampling shootout).
    Not differentiable (sampling never is); use fused_train_attention_block
    for training.
    """
    B, S, D = x.shape
    S_pad = max(_pad_to(S, _SUBLANE), _SUBLANE)
    xp = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
    mask_row = jnp.zeros((B, 1, S_pad), jnp.float32).at[:, :, S:].set(-1e9)
    if key_padding_mask is not None:
        mask_row = mask_row.at[:, 0, :S].add(
            row_bias_contrib(key_padding_mask)
        )
    dt = x.dtype
    as2 = lambda b: b.reshape(1, D).astype(dt)
    out = _call_fwd(
        xp, wq.astype(dt), as2(bq), wk.astype(dt), as2(bk), wv.astype(dt),
        as2(bv), wo.astype(dt), as2(bo), mask_row, jnp.int32(0), None,
        num_heads, 0.0, interpret,
    )
    return out[:, :S]
