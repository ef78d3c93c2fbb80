"""Fused encoder-layer tail kernel (ops/encoder_tail.py).

CPU strategy (same as test_attention_train_block.py): the TPU PRNG has no
interpret lowering, so the kernels are driven through the injected-bits
path against a manual jnp implementation of the torch post-norm tail —
dropout(attn) + residual + LN1 + linear1/GELU/dropout/linear2/dropout +
residual + LN2 (reference model/mdm.py:75-98 semantics) — forward values
and ALL TEN gradients (x, attn, 2 LN scales, 2 LN biases, 2 kernels, 2
biases). A TPU-only class pins the PRNG path against the injected path
given bits dumped by tail_dropout_bits (identical seeding/order contract)
and the rate-0 kernel against the flax XLA module tail.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.ops import encoder_tail as ET

B, S, D, F = 2, 32, 64, 128
RATE = 0.25
RNG = np.random.default_rng(0)
EPS = 1e-5


def _operands():
    x = jnp.asarray(RNG.normal(size=(B, S, D)).astype(np.float32))
    attn = jnp.asarray(RNG.normal(size=(B, S, D)).astype(np.float32))
    g1 = jnp.asarray(1.0 + 0.1 * RNG.normal(size=D).astype(np.float32))
    bl1 = jnp.asarray(0.1 * RNG.normal(size=D).astype(np.float32))
    w1 = jnp.asarray((RNG.normal(size=(D, F)) / np.sqrt(D)).astype(np.float32))
    b1 = jnp.asarray(0.1 * RNG.normal(size=F).astype(np.float32))
    w2 = jnp.asarray((RNG.normal(size=(F, D)) / np.sqrt(F)).astype(np.float32))
    b2 = jnp.asarray(0.1 * RNG.normal(size=D).astype(np.float32))
    g2 = jnp.asarray(1.0 + 0.1 * RNG.normal(size=D).astype(np.float32))
    bl2 = jnp.asarray(0.1 * RNG.normal(size=D).astype(np.float32))
    return x, attn, (g1, bl1, w1, b1, w2, b2, g2, bl2)


def _bits():
    u = lambda n: jnp.asarray(
        RNG.integers(0, 2 ** 32, size=(B, S, n), dtype=np.uint32))
    return u(D), u(F), u(D)


def _ln(s, g, b):
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s), axis=-1, keepdims=True) - jnp.square(mu)
    return (s - mu) * jax.lax.rsqrt(var + EPS) * g + b


def _gelu(u):
    return u * 0.5 * (1.0 + jax.lax.erf(u / np.sqrt(2.0)))


def manual(x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2, bits, rate):
    """Tail reference math with threshold dropout from injected bits."""
    thr = np.uint32(min(int(round((1.0 - rate) * 2 ** 32)), 2 ** 32 - 1))
    drop = lambda t, bit: (
        t if rate == 0.0 else jnp.where(bit < thr, t / (1.0 - rate), 0.0))
    bits0, bits1, bits2 = bits
    y = _ln(x + drop(attn, bits0), g1, bl1)
    h = drop(_gelu(y @ w1 + b1), bits1)
    o = drop(h @ w2 + b2, bits2)
    return _ln(y + o, g2, bl2)


class TestInjectedBitsParity:
    def test_forward(self):
        x, attn, params = _operands()
        bits = _bits()
        out = ET.tail_fwd_with_bits(x, attn, *params, RATE, *bits)
        ref = manual(x, attn, *params, bits, RATE)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
        # dropout really dropped something (not a plain rescale)
        zero = tuple(jnp.zeros_like(b) for b in bits)
        nodrop = manual(x, attn, *params, zero, RATE)
        assert not np.allclose(np.asarray(out), np.asarray(nodrop))

    def test_backward_all_ten_grads(self):
        x, attn, params = _operands()
        bits = _bits()
        dz = jnp.asarray(RNG.normal(size=(B, S, D)).astype(np.float32))

        got = ET.tail_bwd_with_bits(x, attn, *params, RATE, *bits, dz)
        names = ["dx", "dattn", "dg1", "dbl1", "dw1", "db1", "dw2", "db2",
                 "dg2", "dbl2"]

        ref_fn = lambda *ops: manual(*ops, bits, RATE)
        _, vjp = jax.vjp(ref_fn, x, attn, *params)
        ref = vjp(dz)
        for name, g, r in zip(names, got, ref):
            np.testing.assert_allclose(
                np.asarray(g).reshape(np.asarray(r).shape), np.asarray(r),
                atol=5e-4, err_msg=name,
            )

    def test_unaligned_seq_len(self):
        """S=19 pads to the sublane multiple internally; the padded rows
        must not leak into outputs or weight grads."""
        Su = 19
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(B, Su, D)).astype(np.float32))
        attn = jnp.asarray(rng.normal(size=(B, Su, D)).astype(np.float32))
        _, _, params = _operands()
        Sp = 32  # padded sublane multiple
        u = lambda n: jnp.asarray(
            rng.integers(0, 2 ** 32, size=(B, Sp, n), dtype=np.uint32))
        bits_p = (u(D), u(F), u(D))
        out = ET.tail_fwd_with_bits(x, attn, *params, RATE, *bits_p)
        bits_u = tuple(b[:, :Su] for b in bits_p)
        ref = manual(x, attn, *params, bits_u, RATE)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

        dz = jnp.asarray(rng.normal(size=(B, Su, D)).astype(np.float32))
        got = ET.tail_bwd_with_bits(x, attn, *params, RATE, *bits_p, dz)
        ref_fn = lambda *ops: manual(*ops, bits_u, RATE)
        _, vjp = jax.vjp(ref_fn, x, attn, *params)
        ref_g = vjp(dz)
        for g, r in zip(got, ref_g):
            np.testing.assert_allclose(
                np.asarray(g).reshape(np.asarray(r).shape), np.asarray(r),
                atol=5e-4,
            )


class TestInferenceWrapper:
    def test_matches_flax_module_tail(self):
        """Rate-0 kernel == the XLA tail exactly as TransformerEncoderLayer
        writes it (flax LayerNorm/Dense/gelu_exact), which anchors the
        manual math to the shipped module, not just to itself."""
        from flax import linen as nn

        from mdm_tpu.models.layers import gelu_exact

        x, attn, params = _operands()
        g1, bl1, w1, b1, w2, b2, g2, bl2 = params

        class Tail(nn.Module):
            @nn.compact
            def __call__(self, x, attn):
                y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
                h = nn.Dense(F, name="linear1")(y)
                h = gelu_exact(h)
                h = nn.Dense(D, name="linear2")(h)
                return nn.LayerNorm(epsilon=1e-5, name="norm2")(y + h)

        variables = {"params": {
            "norm1": {"scale": g1, "bias": bl1},
            "linear1": {"kernel": w1, "bias": b1},
            "linear2": {"kernel": w2, "bias": b2},
            "norm2": {"scale": g2, "bias": bl2},
        }}
        ref = Tail().apply(variables, x, attn)
        out = ET.fused_encoder_tail_inference(x, attn, *params,
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


@pytest.mark.skipif(
    not pytest.importorskip("mdm_tpu.ops").tpu_backend(),
    reason="TPU hardware PRNG path",
)
class TestPrngPathOnTPU:
    def test_wrapper_prng_matches_injected_and_grads(self):
        x, attn, params = _operands()
        seed = 4321
        bits = ET.tail_dropout_bits(seed, B, S, D, F)

        out = ET.fused_encoder_tail(x, attn, *params, RATE, seed)
        ref = manual(x, attn, *params, bits, RATE)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2)

        def loss(xx, aa, ww1, gg2):
            g1, bl1, w1, b1, w2, b2, _, bl2 = params
            o = ET.fused_encoder_tail(xx, aa, g1, bl1, ww1, b1, w2, b2,
                                      gg2, bl2, RATE, seed)
            return jnp.sum(o ** 2)

        gx, ga, gw1, gg2 = jax.grad(loss, argnums=(0, 1, 2, 3))(
            x, attn, params[2], params[6])

        def ref_loss(xx, aa, ww1, gg2):
            g1, bl1, w1, b1, w2, b2, _, bl2 = params
            o = manual(xx, aa, g1, bl1, ww1, b1, w2, b2, gg2, bl2, bits,
                       RATE)
            return jnp.sum(o ** 2)

        rx, ra, rw1, rg2 = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(
            x, attn, params[2], params[6])
        for g, r in ((gx, rx), (ga, ra), (gw1, rw1), (gg2, rg2)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-2, atol=2e-2)
