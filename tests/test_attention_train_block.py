"""Fused training attention block kernel (ops/attention_train_block.py).

CPU strategy (same as test_attention_dropout.py): the TPU PRNG has no
interpret lowering, so the kernels are driven through the injected-bits
path (identical code modulo the bits source) against a manual
implementation — forward values and ALL NINE gradients (x + 4 kernels + 4
biases). A TPU-only class pins that the PRNG path equals the injected path
given bits dumped by attention_dropout.dropout_bits (identical
seeding/order contract), and that the custom VJP matches the manual grads.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.ops import attention_dropout as AD
from mdm_tpu.ops import attention_train_block as TB

B, S, D, H = 2, 32, 64, 2
RATE = 0.25
RNG = np.random.default_rng(0)


def _operands():
    x = jnp.asarray(RNG.normal(size=(B, S, D)).astype(np.float32))
    ws = [jnp.asarray((RNG.normal(size=(D, D)) / np.sqrt(D)).astype(np.float32))
          for _ in range(4)]
    bs = [jnp.asarray(RNG.normal(size=(1, D)).astype(np.float32) * 0.1)
          for _ in range(4)]
    kpm = np.arange(S)[None, :] >= np.asarray([S, S - 5])[:, None]
    mask_row = jnp.asarray(
        np.where(kpm, -1e9, 0.0).astype(np.float32)[:, None, :]
    )
    return x, ws, bs, mask_row


def _bits():
    return jnp.asarray(
        RNG.integers(0, 2 ** 32, size=(B, H, S, S), dtype=np.uint32)
    )


def manual(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, bits, rate):
    """Whole-block reference math: projections + per-head softmax(QK^T/s)
    + threshold-dropout on the probabilities + PV + out projection."""
    Dh = D // H
    thr = np.uint32(min(int(round((1.0 - rate) * 2 ** 32)), 2 ** 32 - 1))
    q = x @ wq + bq
    k = x @ wk + bk
    v = x @ wv + bv
    outs = []
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        logits = jnp.einsum("bsd,btd->bst", q[..., sl], k[..., sl])
        logits = logits / np.sqrt(Dh) + mask_row
        p = jax.nn.softmax(logits, axis=-1)
        w = jnp.where(bits[:, h] < thr, p / (1.0 - rate), 0.0)
        outs.append(jnp.einsum("bst,btd->bsd", w, v[..., sl]))
    return jnp.concatenate(outs, axis=-1) @ wo + bo


class TestInjectedBitsParity:
    def test_forward(self):
        x, (wq, wk, wv, wo), (bq, bk, bv, bo), mask_row = _operands()
        bits = _bits()
        out = TB._call_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row,
                           None, bits, H, RATE, True)
        ref = manual(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, bits, RATE)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
        # dropout really dropped something (not a plain rescale)
        nodrop = manual(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row,
                        jnp.zeros_like(bits), RATE)
        assert not np.allclose(np.asarray(out), np.asarray(nodrop))

    def test_backward_all_nine_grads(self):
        x, (wq, wk, wv, wo), (bq, bk, bv, bo), mask_row = _operands()
        bits = _bits()
        do = jnp.asarray(RNG.normal(size=(B, S, D)).astype(np.float32))

        got = TB._call_bwd(x, wq, bq, wk, bk, wv, bv, wo, mask_row,
                           None, bits, do, H, RATE, True)
        names = ["dx", "dwq", "dbq", "dwk", "dbk", "dwv", "dbv", "dwo", "dbo"]

        ref_fn = lambda *ops: manual(*ops, mask_row, bits, RATE)
        _, vjp = jax.vjp(ref_fn, x, wq, bq, wk, bk, wv, bv, wo, bo)
        ref = vjp(do)
        for name, g, r in zip(names, got, ref):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=5e-4, err_msg=name
            )

    def test_zero_bits_keep_everything(self):
        """bits=0 keeps every probability (scaled 1/(1-rate)): the block
        equals the no-dropout block times nothing — i.e. plain attention
        with inverted-dropout scaling baked into the probabilities."""
        x, (wq, wk, wv, wo), (bq, bk, bv, bo), mask_row = _operands()
        bits = jnp.zeros((B, H, S, S), jnp.uint32)
        out = TB._call_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row,
                           None, bits, H, RATE, True)
        ref = manual(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, bits, RATE)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


class TestInferenceWrapper:
    """fused_block_attention_inference: the rate-0, forward-only variant
    for sampling. Statically skips the PRNG (so CPU interpret covers the
    exact shipped path) and pads S internally."""

    def test_matches_plain_attention(self):
        x, (wq, wk, wv, wo), (bq, bk, bv, bo), mask_row = _operands()
        kpm = jnp.asarray(np.asarray(mask_row)[:, 0, :] < -1e8)
        out = TB.fused_block_attention_inference(
            x, wq, bq.reshape(-1), wk, bk.reshape(-1), wv, bv.reshape(-1),
            wo, bo.reshape(-1), H, key_padding_mask=kpm, interpret=True,
        )
        bits = jnp.zeros((B, H, S, S), jnp.uint32)  # full keep
        ref = manual(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, bits, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_unaligned_seq_len(self):
        """S=19 pads to the sublane multiple internally; padded keys are
        masked out of every softmax row."""
        Su = 19
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(B, Su, D)).astype(np.float32))
        ws = [jnp.asarray((rng.normal(size=(D, D)) / np.sqrt(D)).astype(np.float32))
              for _ in range(4)]
        bs = [jnp.asarray(rng.normal(size=(1, D)).astype(np.float32) * 0.1)
              for _ in range(4)]
        out = TB.fused_block_attention_inference(
            x, ws[0], bs[0].reshape(-1), ws[1], bs[1].reshape(-1),
            ws[2], bs[2].reshape(-1), ws[3], bs[3].reshape(-1),
            H, interpret=True,
        )
        zero_mask = jnp.zeros((B, 1, Su), jnp.float32)
        bits = jnp.zeros((B, H, Su, Su), jnp.uint32)
        ref = manual(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                     ws[3], bs[3], zero_mask, bits, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_dense_params_tree_matches_nn_dense():
    """DenseParams (models/layers.py) creates the bit-identical param tree
    nn.Dense does — names, shapes, AND init values (flax derives param RNG
    from the path) — so checkpoints work unchanged whichever branch of
    MultiHeadAttention created or consumes them."""
    from flax import linen as nn

    from mdm_tpu.models.layers import DenseParams

    dp = DenseParams(16, 16)
    dense = nn.Dense(16)
    v1 = dp.init(jax.random.PRNGKey(3))["params"]
    v2 = dense.init(jax.random.PRNGKey(3), jnp.zeros((1, 16)))["params"]
    assert set(v1) == set(v2) == {"kernel", "bias"}
    np.testing.assert_array_equal(np.asarray(v1["kernel"]),
                                  np.asarray(v2["kernel"]))
    np.testing.assert_array_equal(np.asarray(v1["bias"]),
                                  np.asarray(v2["bias"]))


@pytest.mark.skipif(
    not pytest.importorskip("mdm_tpu.ops").tpu_backend(),
    reason="TPU hardware PRNG path",
)
class TestPrngPathOnTPU:
    def test_wrapper_prng_matches_injected_and_grads(self):
        x, (wq, wk, wv, wo), (bq, bk, bv, bo), mask_row = _operands()
        kpm = jnp.asarray(np.asarray(mask_row[:, 0] < -1e8))
        seed = 4321
        bits = AD.dropout_bits(seed, B, H, S)  # identical seeding contract
        b1 = lambda b: b.reshape(-1)

        out = TB.fused_train_attention_block(
            x, wq, b1(bq), wk, b1(bk), wv, b1(bv), wo, b1(bo), H, RATE,
            seed, key_padding_mask=kpm,
        )
        ref = manual(x, wq, bq, wk, bk, wv, bv, wo, bo, mask_row, bits, RATE)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2)

        def loss(xx, ww, bb):
            o = TB.fused_train_attention_block(
                xx, ww, b1(bq), wk, b1(bk), wv, b1(bv), wo, bb, H, RATE,
                seed, key_padding_mask=kpm,
            )
            return jnp.sum(o ** 2)

        gx, gwq, gbo = jax.grad(loss, argnums=(0, 1, 2))(x, wq, b1(bo))

        def ref_loss(xx, ww, bb):
            o = manual(xx, ww, bq, wk, bk, wv, bv, wo, bb.reshape(1, D),
                       mask_row, bits, RATE)
            return jnp.sum(o ** 2)

        rgx, rgwq, rgbo = jax.grad(ref_loss, argnums=(0, 1, 2))(x, wq, b1(bo))
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rgx),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(gwq), np.asarray(rgwq),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(gbo), np.asarray(rgbo),
                                   rtol=2e-2, atol=2e-2)

    def test_model_trains_through_fused_block(self):
        """End-to-end: params initialized on the Dense branch train through
        the fused-block branch (same tree), loss finite, grads flow to all
        four projections."""
        from mdm_tpu import ops
        from mdm_tpu.models import MDM, Conditioning, MDMConfig

        cfg = MDMConfig(njoints=263, nfeats=1, latent_dim=128, ff_size=256,
                        num_layers=2, num_heads=4)
        model = MDM(cfg)
        Bm, Tm = 2, 32
        xm = jnp.zeros((Bm, Tm, 263))
        cond = Conditioning(frames_mask=jnp.ones((Bm, Tm), bool),
                            text_embed=jnp.zeros((Bm, 512)))
        t = jnp.zeros((Bm,), jnp.int32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), xm, t, cond)

        ops.enable_pallas_train_block(True)
        try:
            def loss(params):
                out = model.apply(
                    {"params": params}, xm, t, cond, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)},
                )
                return jnp.mean(out ** 2)

            val, grads = jax.jit(jax.value_and_grad(loss))(variables["params"])
            assert np.isfinite(float(val))
            attn = grads["seqTransEncoder"]["layers_0"]["self_attn"]
            for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
                g = np.asarray(attn[name]["kernel"])
                assert np.isfinite(g).all() and np.abs(g).max() > 0, name
        finally:
            ops.enable_pallas_train_block(None)  # restore auto


class TestAutoDefault:
    """make_train_step binds the kernel's AUTO decision per step:
    single-device steps turn it on (it wins, docs/BENCHMARKS.md), mesh
    steps keep it off (pallas_call has no SPMD partitioning rule). The
    flag logic is backend-independent; on CPU the layers additionally
    gate on tpu_backend() so the kernel itself never runs here."""

    def _tiny_step_inputs(self):
        import jax

        from mdm_tpu.diffusion import LossConfig, Schedule
        from mdm_tpu.models import MDM, Conditioning, MDMConfig
        from mdm_tpu.train import (
            OptimConfig, TrainStepConfig, create_train_state, make_train_step,
        )

        B, T = 8, 16  # divisible by the conftest's 8-way virtual mesh
        cfg = MDMConfig(njoints=26, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=1, num_heads=2)
        model = MDM(cfg)
        cond = Conditioning(frames_mask=jnp.ones((B, T), bool),
                            text_embed=jnp.zeros((B, 32)))
        x = jnp.zeros((B, T, 26))
        params = model.init(jax.random.PRNGKey(0), x,
                            jnp.zeros((B,), jnp.int32), cond)["params"]
        sched = Schedule.create("cosine", 10)
        config = TrainStepConfig(loss=LossConfig(), optim=OptimConfig(lr=1e-4))
        state = create_train_state(params, config.optim)
        batch = {"x": x, "mask": jnp.ones((B, T), bool), "cond": cond}
        return model, sched, config, state, batch, make_train_step

    @staticmethod
    def _spy(name):
        """Record every read of ops.<name> (the layer gates read it at
        trace time, inside the wrapped call). Returns (seen, restore)."""
        import mdm_tpu.ops as ops

        seen, real = [], getattr(ops, name)

        def rec(*a):
            v = real(*a)
            seen.append(v)
            return v

        setattr(ops, name, rec)
        return seen, lambda: setattr(ops, name, real)

    def test_single_device_step_sets_auto_on(self):
        """The auto decision is visible DURING the wrapped call (trace
        time) and restored afterwards (ADVICE r4: no leak into modules
        jitted later)."""
        import jax

        import mdm_tpu.ops as ops

        model, sched, config, state, batch, make_train_step = (
            self._tiny_step_inputs())
        ops._set_auto_train_block(False)
        step = make_train_step(model.apply, sched, config,
                               use_shardings=False)
        seen, restore = self._spy("pallas_train_block_enabled")
        try:
            state, _ = step(state, batch, jax.random.PRNGKey(1))
        finally:
            restore()
        assert seen and all(seen), seen  # kernel gate saw auto=on at trace
        assert not ops.pallas_train_block_enabled()  # restored after call

    def test_mesh_step_sets_auto_off(self):
        import jax

        import mdm_tpu.ops as ops
        from mdm_tpu.parallel import mesh as mesh_mod

        model, sched, config, state, batch, make_train_step = (
            self._tiny_step_inputs())
        prev = mesh_mod._active_mesh
        try:
            mesh_mod.make_mesh()  # 8-way virtual CPU mesh (conftest)
            step = make_train_step(model.apply, sched, config)
            ops._set_auto_train_block(True)
            seen, restore = self._spy("pallas_train_block_enabled")
            try:
                state, _ = step(state, batch, jax.random.PRNGKey(1))
            finally:
                restore()
            assert seen and not any(seen), seen  # gate saw auto=off
            assert ops.pallas_train_block_enabled()  # restored (was True)
        finally:
            mesh_mod._active_mesh = prev
            ops._set_auto_train_block(False)

    def test_sampling_auto_single_vs_mesh(self):
        """MotionGenerator binds the forward-only block kernel's AUTO
        decision: on without a mesh, off with one."""
        import jax

        import mdm_tpu.ops as ops
        from mdm_tpu.diffusion import Schedule
        from mdm_tpu.models import MDM, Conditioning, MDMConfig
        from mdm_tpu.parallel import mesh as mesh_mod
        from mdm_tpu.sampling import GenerationConfig, MotionGenerator

        Bm, Tm = 8, 16
        cfg = MDMConfig(njoints=26, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=1, num_heads=2)
        model = MDM(cfg)
        cond = Conditioning(frames_mask=jnp.ones((Bm, Tm), bool),
                            text_embed=jnp.zeros((Bm, 32)))
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((Bm, Tm, 26)),
                            jnp.zeros((Bm,), jnp.int32), cond)
        sched = Schedule.create("cosine", 4)
        gcfg = GenerationConfig(guidance_scale=1.0)

        ops._set_auto_sample_block(False)
        gen = MotionGenerator(model, params, sched, gcfg, "humanact12",
                              norm_stats=None)
        seen, restore = TestAutoDefault._spy("pallas_sample_block_enabled")
        try:
            gen.sample_features(cond, Bm, Tm, jax.random.PRNGKey(1))
        finally:
            restore()
        assert seen and all(seen), seen  # gate saw auto=on at trace time
        assert not ops.pallas_sample_block_enabled()  # restored after call

        prev = mesh_mod._active_mesh
        try:
            mesh = mesh_mod.make_mesh()
            gen_mesh = MotionGenerator(model, params, sched, gcfg,
                                       "humanact12", norm_stats=None,
                                       mesh=mesh)
            seen, restore = TestAutoDefault._spy("pallas_sample_block_enabled")
            try:
                gen_mesh.sample_features(cond, Bm, Tm, jax.random.PRNGKey(1))
            finally:
                restore()
            assert seen and not any(seen), seen  # gate saw auto=off
        finally:
            mesh_mod._active_mesh = prev
            ops._set_auto_sample_block(False)

    def test_explicit_setting_wins_over_auto(self):
        import mdm_tpu.ops as ops

        ops._set_auto_train_block(True)
        ops.enable_pallas_train_block(False)
        try:
            assert not ops.pallas_train_block_enabled()
        finally:
            ops.enable_pallas_train_block(None)
        assert ops.pallas_train_block_enabled()
        ops._set_auto_train_block(False)
