"""Fused whole-layer inference kernel (ops/layer_inference.py): CPU
interpret-mode parity against both the XLA layer and the two-kernel
(block + tail) path it supersedes, plus checkpoint-tree identity.

The kernel reuses attention_train_block's rate-0 forward body and
encoder_tail's rate-0 `_recompute` verbatim, so it must be BITWISE equal
to the two-kernel path — not merely close. TPU-only behavior (real-chip
numerics vs XLA) is pinned by the sampling-path tests in test_sampling.py
via the auto gating.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu import ops
from mdm_tpu.models.layers import TransformerEncoderLayer, key_padding_bias


@pytest.fixture(autouse=True)
def _kernel_flags():
    ops.enable_pallas_interpret(True)
    yield
    ops.enable_pallas_interpret(False)
    ops.enable_pallas_layer_inference(None)
    ops.enable_pallas_sample_block(None)
    ops.enable_pallas_encoder_tail(None)


def _setup(B=3, S=37, D=128, F=256, H=4, seed=0):
    layer = TransformerEncoderLayer(D, H, F, dropout=0.1)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    pad = np.zeros((B, S), bool)
    pad[0, 30:] = True
    pad[2, 10:] = True
    bias = key_padding_bias(jnp.asarray(pad))
    ops.enable_pallas_layer_inference(False)
    params = layer.init(jax.random.PRNGKey(0), x, bias, True)
    return layer, params, x, bias


def test_fused_layer_matches_xla():
    layer, params, x, bias = _setup()
    ref = layer.apply(params, x, bias, True)
    ops.enable_pallas_layer_inference(True)
    out = layer.apply(params, x, bias, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_layer_bitwise_equals_two_kernel_path():
    layer, params, x, bias = _setup()
    ops.enable_pallas_sample_block(True)
    ops.enable_pallas_encoder_tail(True)
    ops.enable_pallas_layer_inference(False)
    two = layer.apply(params, x, bias, True)
    ops.enable_pallas_layer_inference(True)
    fused = layer.apply(params, x, bias, True)
    assert bool(jnp.all(fused == two)), "fused layer != block+tail bitwise"


def test_fused_layer_param_tree_identical():
    layer, params, x, bias = _setup()
    ops.enable_pallas_layer_inference(True)
    p2 = layer.init(jax.random.PRNGKey(0), x, bias, True)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    assert [p for p, _ in flat1] == [p for p, _ in flat2]
    for (_, a), (_, b) in zip(flat1, flat2):
        assert bool(jnp.all(a == b))


def test_fused_layer_no_padding_bias():
    layer, params, x, _ = _setup()
    ref = layer.apply(params, x, None, True)
    ops.enable_pallas_layer_inference(True)
    out = layer.apply(params, x, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_layer_training_path_unaffected():
    """deterministic=False must never route through the forward-only
    whole-layer kernel, even when pinned on."""
    layer, params, x, bias = _setup()
    ops.enable_pallas_layer_inference(True)
    out = layer.apply(params, x, bias, False,
                      rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out)).all()
