"""Pallas fused encoder-layer TAIL: dropout + residual + LN1 + FFN + LN2.

The whole-block attention kernel (ops/attention_train_block.py) left the
rest of each transformer layer to XLA: dropout on the attention output,
the residual add + LayerNorm, the two FFN matmuls with GELU and two more
dropouts, and the second residual + LayerNorm. Each of those boundaries
costs an HBM round-trip of a [B,S,D] (or [B,S,F]) activation. This kernel
fuses the entire tail into one pallas program per batch cell: read x and
attn once, hold W1/W2 VMEM-resident, and write only the layer output —
no intermediate (y, h, ffn-out, dropout masks) ever exists in HBM.

It composes with the attention kernel through ordinary JAX autodiff: the
layer is `attn = fused_train_attention_block(x, ...)` followed by
`z = fused_encoder_tail(x, attn, ...)`; each has its own custom_vjp, and
the cotangent for x flows through both (tail residual path + attention
input path) with no manual layer-level VJP.

Dropout is the same seed-replay scheme as the attention kernel: the
backward kernel re-seeds the TPU hardware PRNG with the identical per-cell
seed and draws the three masks (attn-out [S,D], ffn-hidden [S,F], ffn-out
[S,D]) in the identical order, so nothing stochastic is saved. custom_vjp
residuals are just (x, attn, params, seed).

Testing strategy (same as attention_train_block): the TPU PRNG has no CPU
interpret lowering, so every kernel takes a static `use_prng` switch —
False routes caller-supplied uint32 bits tensors through the same code
path, which CPU interpret tests check against a manual flax-equivalent
implementation (values AND all ten gradients); a TPU test pins the prng
path against the injected path and the whole layer against the XLA module.

Reference behavior being reproduced: the second half of
torch.nn.TransformerEncoderLayer with post-norm + exact-erf GELU
(/root/reference/model/mdm.py:75-98): x = norm1(x + dropout(attn));
x = norm2(x + dropout(linear2(dropout(gelu(linear1(x)))))).
The identical structure is the cross-attn->FFN half of
torch.nn.TransformerDecoderLayer (norm2/linear1/linear2/norm3).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_SUBLANE = 16  # bf16 sublane multiple; also a multiple of the f32 one (8)
_EPS = np.float32(1e-5)  # torch/flax LayerNorm default
_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))
_INV_SQRT2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _keep_threshold(rate: float) -> np.uint32:
    """uint32 threshold t with P(bits < t) == 1 - rate."""
    return np.uint32(min(int(round((1.0 - rate) * 2.0 ** 32)), 2 ** 32 - 1))


def _bits(shape, use_prng, ref):
    from jax.experimental.pallas import tpu as pltpu

    if use_prng:
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return ref[0]


def _ln_fwd(s, g, b):
    """Row LayerNorm in f32. Returns (out_f32, xhat, rstd)."""
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s), axis=-1, keepdims=True) - jnp.square(mu)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (s - mu) * rstd
    return xhat * g + b, xhat, rstd


def _ln_bwd(dout, xhat, rstd, g):
    """ds for post-LN given upstream dout (all f32). Also dg/db terms."""
    dxhat = dout * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    ds = (dxhat - m1 - xhat * m2) * rstd
    dg = jnp.sum(dout * xhat, axis=0)
    db = jnp.sum(dout, axis=0)
    return ds, dg, db


def _erf_f32(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7, f32-accurate):
    Mosaic has no lowering for the erf primitive, and exact-erf GELU is a
    parity surface (models/layers.py::gelu_exact, reference torch F.gelu)."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + np.float32(0.3275911) * ax)
    poly = t * (np.float32(0.254829592) + t * (np.float32(-0.284496736)
           + t * (np.float32(1.421413741) + t * (np.float32(-1.453152027)
           + t * np.float32(1.061405429)))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_f32(u):
    """erf-based GELU (torch default; models/layers.py::gelu_exact)."""
    return u * 0.5 * (1.0 + _erf_f32(u * _INV_SQRT2))


def _gelu_grad_f32(u):
    phi = jnp.exp(-0.5 * jnp.square(u)) * _INV_SQRT2PI
    cdf = 0.5 * (1.0 + _erf_f32(u * _INV_SQRT2))
    return cdf + u * phi


def _matmul(a, w_ref, b_ref):
    """[S, A] @ [A, B] + [1, B] -> f32 [S, B]."""
    h = jax.lax.dot_general(
        a, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return h + b_ref[0].astype(jnp.float32)


def _recompute(xb, ab, refs, rate, use_prng, bits_refs):
    """Shared fwd math from the (x, attn) cell blocks. Returns everything
    the backward needs; the forward uses the prefix."""
    (g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, bl2_ref) = refs
    dt = xb.dtype
    S, D = xb.shape
    thr = _keep_threshold(rate)
    inv_keep = np.float32(1.0 / (1.0 - rate)) if rate > 0.0 else np.float32(1.0)

    a32 = ab.astype(jnp.float32)
    if rate > 0.0:
        bits0 = _bits((S, D), use_prng, bits_refs[0] if bits_refs else None)
        keep0 = jnp.where(bits0 < thr, inv_keep, 0.0)
        a32 = a32 * keep0
    else:
        keep0 = None
    s1 = xb.astype(jnp.float32) + a32
    y32, xhat1, rstd1 = _ln_fwd(s1, g1_ref[0].astype(jnp.float32),
                                bl1_ref[0].astype(jnp.float32))
    y = y32.astype(dt)
    u = _matmul(y, w1_ref, b1_ref)  # [S, F] f32
    gact = _gelu_exact_f32(u)
    if rate > 0.0:
        bits1 = _bits(u.shape, use_prng, bits_refs[1] if bits_refs else None)
        keep1 = jnp.where(bits1 < thr, inv_keep, 0.0)
        gact = gact * keep1
    else:
        keep1 = None
    hd = gact.astype(dt)
    o = _matmul(hd, w2_ref, b2_ref)  # [S, D] f32
    if rate > 0.0:
        bits2 = _bits((S, D), use_prng, bits_refs[2] if bits_refs else None)
        keep2 = jnp.where(bits2 < thr, inv_keep, 0.0)
        o = o * keep2
    else:
        keep2 = None
    s2 = y32 + o
    z32, xhat2, rstd2 = _ln_fwd(s2, g2_ref[0].astype(jnp.float32),
                                bl2_ref[0].astype(jnp.float32))
    return dict(z32=z32, y=y, u=u, hd=hd, keep0=keep0, keep1=keep1,
                keep2=keep2, xhat1=xhat1, rstd1=rstd1, xhat2=xhat2,
                rstd2=rstd2)


def _fwd_kernel(rate, use_prng, *refs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if use_prng:
        (seed_ref, x_ref, a_ref, g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref,
         b2_ref, g2_ref, bl2_ref, z_ref) = refs
        bits_refs = None
        if rate > 0.0:  # static: the rate-0 (inference) variant draws no bits
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    else:
        (x_ref, a_ref, g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         g2_ref, bl2_ref, bits0_ref, bits1_ref, bits2_ref, z_ref) = refs
        bits_refs = (bits0_ref, bits1_ref, bits2_ref)
    param_refs = (g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref,
                  bl2_ref)
    r = _recompute(x_ref[0], a_ref[0], param_refs, rate, use_prng, bits_refs)
    z_ref[0] = r["z32"].astype(z_ref.dtype)


def _bwd_kernel(rate, use_prng, *refs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if use_prng:
        (seed_ref, x_ref, a_ref, g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref,
         b2_ref, g2_ref, bl2_ref, dz_ref,
         dx_ref, da_ref, dg1_ref, dbl1_ref, dw1_ref, db1_ref, dw2_ref,
         db2_ref, dg2_ref, dbl2_ref) = refs
        bits_refs = None
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    else:
        (x_ref, a_ref, g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         g2_ref, bl2_ref, bits0_ref, bits1_ref, bits2_ref, dz_ref,
         dx_ref, da_ref, dg1_ref, dbl1_ref, dw1_ref, db1_ref, dw2_ref,
         db2_ref, dg2_ref, dbl2_ref) = refs
        bits_refs = (bits0_ref, bits1_ref, bits2_ref)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        dbl1_ref[...] = jnp.zeros_like(dbl1_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        dbl2_ref[...] = jnp.zeros_like(dbl2_ref)

    param_refs = (g1_ref, bl1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref,
                  bl2_ref)
    xb = x_ref[0]
    dt = xb.dtype
    # Flash-style: recompute everything (REPLAYING the identical PRNG bit
    # sequence in the identical order) instead of saving activations.
    r = _recompute(xb, a_ref[0], param_refs, rate, use_prng, bits_refs)

    dz = dz_ref[0].astype(jnp.float32)
    g2 = g2_ref[0].astype(jnp.float32)
    ds2, dg2, dbl2 = _ln_bwd(dz, r["xhat2"], r["rstd2"], g2)
    dg2_ref[0, :] += dg2
    dbl2_ref[0, :] += dbl2

    # s2 = y32 + o(masked): residual branch dy_a; FFN-out branch do.
    do = ds2 if r["keep2"] is None else ds2 * r["keep2"]
    do16 = do.astype(dt)
    # o = hd @ W2 + b2
    dw2_ref[...] += jax.lax.dot_general(
        r["hd"], do16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[0, :] += jnp.sum(do, axis=0)
    dhd = jax.lax.dot_general(
        do16, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dgact = dhd if r["keep1"] is None else dhd * r["keep1"]
    du = dgact * _gelu_grad_f32(r["u"])
    du16 = du.astype(dt)
    # u = y @ W1 + b1
    dw1_ref[...] += jax.lax.dot_general(
        r["y"], du16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[0, :] += jnp.sum(du, axis=0)
    dy = ds2 + jax.lax.dot_general(
        du16, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g1 = g1_ref[0].astype(jnp.float32)
    ds1, dg1, dbl1 = _ln_bwd(dy, r["xhat1"], r["rstd1"], g1)
    dg1_ref[0, :] += dg1
    dbl1_ref[0, :] += dbl1
    dx_ref[0] = ds1.astype(dx_ref.dtype)
    da = ds1 if r["keep0"] is None else ds1 * r["keep0"]
    da_ref[0] = da.astype(da_ref.dtype)


def _specs(B, S, D, F):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return dict(
        x=pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        vec_d=pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        vec_f=pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
        w1=pl.BlockSpec((D, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
        w2=pl.BlockSpec((F, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        bits_d=pl.BlockSpec((1, S, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM),
        bits_f=pl.BlockSpec((1, S, F), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM),
        seed=pl.BlockSpec(memory_space=pltpu.SMEM),
    )


def _param_specs(sp):
    return [sp["vec_d"], sp["vec_d"], sp["w1"], sp["vec_f"], sp["w2"],
            sp["vec_d"], sp["vec_d"], sp["vec_d"]]


def _call_fwd(x, attn, params, seed, bits, rate, interpret):
    from jax.experimental import pallas as pl

    B, S, D = x.shape
    F = params[2].shape[1]
    use_prng = bits is None
    sp = _specs(B, S, D, F)
    kern = functools.partial(_fwd_kernel, rate, use_prng)
    common = dict(
        grid=(B,),
        out_specs=sp["x"],
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=B * 4 * S * D * F,
            bytes_accessed=(3 * B * S * D + 2 * D * F) * x.dtype.itemsize,
            transcendentals=B * S * F,
        ),
        interpret=interpret,
    )
    if use_prng:
        return pl.pallas_call(
            kern, in_specs=[sp["seed"], sp["x"], sp["x"], *_param_specs(sp)],
            **common,
        )(jnp.asarray([seed], jnp.int32), x, attn, *params)
    return pl.pallas_call(
        kern,
        in_specs=[sp["x"], sp["x"], *_param_specs(sp), sp["bits_d"],
                  sp["bits_f"], sp["bits_d"]],
        **common,
    )(x, attn, *params, *bits)


def _call_bwd(x, attn, params, seed, bits, dz, rate, interpret):
    from jax.experimental import pallas as pl

    B, S, D = x.shape
    F = params[2].shape[1]
    use_prng = bits is None
    sp = _specs(B, S, D, F)
    kern = functools.partial(_bwd_kernel, rate, use_prng)
    f32 = jnp.float32
    from jax.experimental.pallas import tpu as pltpu

    # Constant-index-map accumulator blocks (VMEM-resident, one writeback).
    a_g1 = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    s_g1 = jax.ShapeDtypeStruct((1, D), f32)
    a_w1 = pl.BlockSpec((D, F), lambda b: (0, 0), memory_space=pltpu.VMEM)
    s_w1 = jax.ShapeDtypeStruct((D, F), f32)
    a_b1 = pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM)
    s_b1 = jax.ShapeDtypeStruct((1, F), f32)
    a_w2 = pl.BlockSpec((F, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    s_w2 = jax.ShapeDtypeStruct((F, D), f32)
    common = dict(
        grid=(B,),
        out_specs=(sp["x"], sp["x"], a_g1, a_g1, a_w1, a_b1, a_w2, a_g1,
                   a_g1, a_g1),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
            s_g1, s_g1, s_w1, s_b1, s_w2, s_g1, s_g1, s_g1,
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * 12 * S * D * F,
            bytes_accessed=(5 * B * S * D + 4 * D * F) * x.dtype.itemsize,
            transcendentals=2 * B * S * F,
        ),
        interpret=interpret,
    )
    if use_prng:
        return pl.pallas_call(
            kern,
            in_specs=[sp["seed"], sp["x"], sp["x"], *_param_specs(sp),
                      sp["x"]],
            **common,
        )(jnp.asarray([seed], jnp.int32), x, attn, *params, dz)
    return pl.pallas_call(
        kern,
        in_specs=[sp["x"], sp["x"], *_param_specs(sp), sp["bits_d"],
                  sp["bits_f"], sp["bits_d"], sp["x"]],
        **common,
    )(x, attn, *params, *bits, dz)


# ---------------------------------------------------------------------------
# custom_vjp wrapper over padded operands
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _tail_core(x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2, seed,
               rate, interpret):
    params = (g1, bl1, w1, b1, w2, b2, g2, bl2)
    return _call_fwd(x, attn, params, seed, None, rate, interpret)


def _tail_core_fwd(x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2, seed,
                   rate, interpret):
    params = (g1, bl1, w1, b1, w2, b2, g2, bl2)
    out = _call_fwd(x, attn, params, seed, None, rate, interpret)
    return out, (x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2, seed)


def _tail_core_bwd(rate, interpret, res, dz):
    x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2, seed = res
    params = (g1, bl1, w1, b1, w2, b2, g2, bl2)
    (dx, da, dg1, dbl1, dw1, db1, dw2, db2, dg2, dbl2) = _call_bwd(
        x, attn, params, seed, None, dz, rate, interpret)
    cast = lambda g, p: g.reshape(p.shape).astype(p.dtype)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)  # integer input
    return (dx, da, cast(dg1, g1), cast(dbl1, bl1), cast(dw1, w1),
            cast(db1, b1), cast(dw2, w2), cast(db2, b2), cast(dg2, g2),
            cast(dbl2, bl2), dseed)


_tail_core.defvjp(_tail_core_fwd, _tail_core_bwd)


def _prep(x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2):
    """Pad S to the sublane multiple; shape params for the kernel."""
    B, S, D = x.shape
    S_pad = max(_pad_to(S, _SUBLANE), _SUBLANE)
    pad = [(0, 0), (0, S_pad - S), (0, 0)]
    dt = x.dtype
    row = lambda v: v.reshape(1, -1).astype(dt)
    return (jnp.pad(x, pad), jnp.pad(attn, pad),
            (row(g1), row(bl1), w1.astype(dt), row(b1), w2.astype(dt),
             row(b2), row(g2), row(bl2)), S)


def fused_encoder_tail(
    x: jnp.ndarray,      # [B, S, D] layer input (= attention kernel input)
    attn: jnp.ndarray,   # [B, S, D] attention block output
    g1, bl1,             # norm1 scale/bias [D]
    w1, b1,              # linear1 kernel [D, F] / bias [F]
    w2, b2,              # linear2 kernel [F, D] / bias [D]
    g2, bl2,             # norm2 scale/bias [D]
    rate: float,
    seed,
    interpret: bool = False,
) -> jnp.ndarray:
    """Training encoder tail with three in-kernel dropouts, differentiable."""
    xp, ap, params, S = _prep(x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2)
    seed = jnp.asarray(seed, jnp.int32).reshape(())
    out = _tail_core(xp, ap, *params, seed, float(rate), interpret)
    return out[:, :S]


def fused_encoder_tail_inference(
    x: jnp.ndarray,
    attn: jnp.ndarray,
    g1, bl1, w1, b1, w2, b2, g2, bl2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward-only tail for SAMPLING (rate 0, no PRNG, not differentiable)."""
    xp, ap, params, S = _prep(x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2)
    out = _call_fwd(xp, ap, params, jnp.int32(0), None, 0.0, interpret)
    return out[:, :S]


def tail_dropout_bits(seed: int, B: int, S: int, D: int, F: int,
                      interpret=False):
    """Dump the exact bit tensors the prng kernels consume, in the exact
    generation order (attn-out [S,D], ffn-hidden [S,F], ffn-out [S,D]) —
    tests only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, o0_ref, o1_ref, o2_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        o0_ref[0] = pltpu.bitcast(pltpu.prng_random_bits((S, D)), jnp.uint32)
        o1_ref[0] = pltpu.bitcast(pltpu.prng_random_bits((S, F)), jnp.uint32)
        o2_ref[0] = pltpu.bitcast(pltpu.prng_random_bits((S, D)), jnp.uint32)

    spec = lambda n: pl.BlockSpec((1, S, n), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(spec(D), spec(F), spec(D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, D), jnp.uint32),
            jax.ShapeDtypeStruct((B, S, F), jnp.uint32),
            jax.ShapeDtypeStruct((B, S, D), jnp.uint32),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32))


# Test-only entry points routing injected bits through the same kernels.

def tail_fwd_with_bits(x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2, rate,
                       bits0, bits1, bits2, interpret=True):
    xp, ap, params, S = _prep(x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2)
    out = _call_fwd(xp, ap, params, None, (bits0, bits1, bits2), float(rate),
                    interpret)
    return out[:, :S]


def tail_bwd_with_bits(x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2, rate,
                       bits0, bits1, bits2, dz, interpret=True):
    xp, ap, params, S = _prep(x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2)
    S_pad = xp.shape[1]
    dzp = jnp.pad(dz, [(0, 0), (0, S_pad - S), (0, 0)])
    outs = _call_bwd(xp, ap, params, None, (bits0, bits1, bits2), dzp,
                     float(rate), interpret)
    dx, da = outs[0][:, :S], outs[1][:, :S]
    return (dx, da) + tuple(outs[2:])
