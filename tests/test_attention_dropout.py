"""Fused attention-with-dropout kernel (ops/attention_dropout.py).

CPU strategy: the TPU PRNG has no interpret lowering, so these tests drive
the kernels through the injected-bits path (identical code modulo the bits
source) against a manual implementation — values and VJPs. A TPU-only test
(tests/test_attention_dropout_tpu.py marker here, guarded) pins that the
PRNG path equals the injected path given bits dumped by dropout_bits.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.ops import attention_dropout as AD

B, S, D, H = 2, 24, 32, 2
RATE = 0.25
RNG = np.random.default_rng(0)


def _operands():
    q = jnp.asarray(RNG.normal(size=(B, S, D)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, S, D)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, S, D)).astype(np.float32))
    kpm = jnp.asarray(np.arange(S)[None, :] >= np.asarray([S, S - 5])[:, None])
    return q, k, v, kpm


def _padded(q, k, v, kpm):
    return AD._pad_operands(q, k, v, H, kpm)


def _bits(S_pad):
    return jnp.asarray(
        RNG.integers(0, 2 ** 32, size=(B, H, S_pad, S_pad), dtype=np.uint32)
    )


def manual(qp, kp, vp, mask_row, bits, rate):
    """Reference math on the padded operands (q already pre-scaled)."""
    Bp, Sp, Dp = qp.shape
    Dh = Dp // H
    thr = np.uint32(min(int(round((1.0 - rate) * 2 ** 32)), 2 ** 32 - 1))
    outs = []
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        logits = jnp.einsum("bsd,btd->bst", qp[..., sl], kp[..., sl])
        logits = logits + mask_row
        p = jax.nn.softmax(logits, axis=-1)
        w = jnp.where(bits[:, h] < thr, p / (1.0 - rate), 0.0)
        outs.append(jnp.einsum("bst,btd->bsd", w, vp[..., sl]))
    return jnp.concatenate(outs, axis=-1)


class TestInjectedBitsParity:
    def test_forward(self):
        q, k, v, kpm = _operands()
        qp, kp, vp, mask_row = _padded(q, k, v, kpm)
        bits = _bits(qp.shape[1])
        out = AD._call_fwd(qp, kp, vp, mask_row, None, bits, H, RATE, True)
        ref = manual(qp, kp, vp, mask_row, bits, RATE)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        # dropout really dropped something and rescaled the rest
        nodrop = manual(qp, kp, vp, mask_row, jnp.zeros_like(bits), RATE)
        assert not np.allclose(np.asarray(out), np.asarray(nodrop) * (1 - RATE))

    def test_backward(self):
        q, k, v, kpm = _operands()
        qp, kp, vp, mask_row = _padded(q, k, v, kpm)
        bits = _bits(qp.shape[1])
        do = jnp.asarray(RNG.normal(size=qp.shape).astype(np.float32))

        dq, dk, dv = AD._call_bwd(qp, kp, vp, mask_row, None, bits, do, H, RATE, True)

        ref_fn = lambda qq, kk, vv: manual(qq, kk, vv, mask_row, bits, RATE)
        _, vjp = jax.vjp(ref_fn, qp, kp, vp)
        rdq, rdk, rdv = vjp(do)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=2e-4)

    def test_keep_rate_distribution(self):
        # random uint32 bits drop ~RATE of entries after thresholding
        bits = np.asarray(_bits(128))[0, 0]
        thr = np.uint32(round((1.0 - RATE) * 2 ** 32))
        keep = (bits < thr).mean()
        assert abs(keep - (1.0 - RATE)) < 0.01


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="TPU hardware PRNG path"
)
class TestPrngPathOnTPU:
    def test_prng_matches_injected_and_grads_flow(self):
        q, k, v, kpm = _operands()
        qp, kp, vp, mask_row = _padded(q, k, v, kpm)
        S_pad = qp.shape[1]
        seed = 1234
        bits = AD.dropout_bits(seed, B, H, S_pad)
        via_prng = AD.fused_dropout_attention(q, k, v, H, RATE, seed,
                                              key_padding_mask=kpm)
        via_bits = AD._call_fwd(qp, kp, vp, mask_row, None, bits, H, RATE, False)
        np.testing.assert_allclose(
            np.asarray(via_prng), np.asarray(via_bits)[:, :S], atol=1e-5
        )

        # custom VJP: grads equal the manual grads under the dumped bits
        def loss(qq):
            o = AD.fused_dropout_attention(qq, k, v, H, RATE, seed,
                                           key_padding_mask=kpm)
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(q)

        def ref_loss(qq):
            qqp, kkp, vvp, mrow = _padded(qq, k, v, kpm)
            o = manual(qqp, kkp, vvp, mrow, bits, RATE)[:, :S]
            return jnp.sum(o ** 2)

        rg = jax.grad(ref_loss)(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(rg), atol=2e-3)
