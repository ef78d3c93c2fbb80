"""shard_map carries the fused Pallas kernels onto DP meshes (VERDICT r4 #1).

Strategy: the TPU PRNG has no CPU-interpret lowering, so these tests run the
KERNEL path end to end through the model with `ops.enable_pallas_interpret`
at dropout rate 0 (the kernels statically skip all PRNG work at rate 0 —
guarded in both forward and backward). That validates the shard_map
plumbing, specs, psums, and the kernels' math per shard. For rate > 0 the
kernels seed per batch cell as `seed + program_id(0)` and the layers offset
the seed by shard_index*local_B (ops.shard_seed_offset), which maps shard
k's cell b to the single-device cell k*B_local + b — bitwise-identical
dropout by construction; the offset mapping itself is pinned here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdm_tpu import ops
from mdm_tpu.diffusion import LossConfig, Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.parallel import mesh as mesh_mod
from mdm_tpu.sampling import GenerationConfig, MotionGenerator
from mdm_tpu.train import (
    OptimConfig,
    TrainStepConfig,
    create_train_state,
    make_train_step,
)

RNG = np.random.default_rng(7)


def _kernel_model(**over):
    """Tiny flagship-shaped model satisfying the kernel gates (D%128==0)."""
    kw = dict(njoints=26, nfeats=1, latent_dim=128, ff_size=128,
              num_layers=1, num_heads=2, dropout=0.0)
    kw.update(over)
    return MDM(MDMConfig(**kw))


def _batch(B, T, model):
    D = model.config.input_feats
    x = jnp.asarray(RNG.normal(size=(B, T, D)).astype(np.float32))
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.asarray(RNG.normal(size=(B, 512)).astype(np.float32)),
    )
    return {"x": x, "mask": jnp.ones((B, T), bool), "cond": cond}


def _init(model, batch):
    B, T = batch["x"].shape[:2]
    return model.init(
        jax.random.PRNGKey(0), batch["x"], jnp.zeros((B,), jnp.int32),
        batch["cond"],
    )["params"]


@pytest.fixture
def interpret_kernels():
    """Force the kernel path (interpret) for the duration of a test."""
    ops.enable_pallas_interpret(True)
    ops.enable_pallas_train_block(True)
    ops.enable_pallas_sample_block(True)
    ops.enable_pallas_encoder_tail(True)
    yield
    ops.enable_pallas_interpret(False)
    ops.enable_pallas_train_block(None)
    ops.enable_pallas_sample_block(None)
    ops.enable_pallas_encoder_tail(None)


class TestSeedOffset:
    def test_linear_offset_mapping(self):
        """shard_seed_offset inside shard_map = shard_index * local_B, so
        per-cell kernel seeds (seed + offset + b_local) equal the
        single-device run's (seed + b_global)."""
        from jax.sharding import PartitionSpec as P

        mesh = mesh_mod.make_mesh()  # 8-way virtual CPU mesh

        def local(x):
            ops._set_shard_batch_axes(("data",))
            try:
                off = ops.shard_seed_offset(4)
            finally:
                ops._set_shard_batch_axes(None)
            return x + off.reshape(1)

        out = jax.shard_map(
            local, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        )(jnp.zeros(8, jnp.int32))
        np.testing.assert_array_equal(np.asarray(out), np.arange(8) * 4)

    def test_zero_outside_shard_map(self):
        assert int(ops.shard_seed_offset(16)) == 0


class TestTrainStepShardMap:
    def _run(self, step, state, batch, key):
        out = step(state, batch, key)
        state, metrics = out
        return state, {k: float(v) for k, v in metrics.items()}

    def test_sm_kernel_matches_single_device_kernel(self, interpret_kernels):
        """8-shard shard_map kernel step == single-device kernel step
        (rate 0: identical math, FP reduction order aside)."""
        model = _kernel_model()
        B, T = 8, 12
        batch = _batch(B, T, model)
        params = _init(model, batch)
        sched = Schedule.create("cosine", 10)
        config = TrainStepConfig(loss=LossConfig(), optim=OptimConfig(lr=1e-2))
        key = jax.random.PRNGKey(3)

        step_1dev = make_train_step(model.apply, sched, config,
                                    use_shardings=False)
        s1, m1 = self._run(step_1dev, create_train_state(params, config.optim),
                           batch, key)

        prev = mesh_mod._active_mesh
        try:
            mesh_mod.make_mesh()
            step_sm = make_train_step(model.apply, sched, config,
                                      shard_map_kernels=True)
            s8, m8 = self._run(step_sm,
                               create_train_state(params, config.optim),
                               batch, key)
        finally:
            mesh_mod._active_mesh = prev

        assert np.isfinite(m1["loss"]) and np.isfinite(m8["loss"])
        np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=1e-5)
        np.testing.assert_allclose(m1["grad_norm"], m8["grad_norm"], rtol=1e-4)
        for k in ("loss_q0", "loss_q1", "loss_q2", "loss_q3", "rot_mse"):
            np.testing.assert_allclose(m1[k], m8[k], rtol=1e-4, err_msg=k)
        # The Adam moments after one step are proportional to the raw grads
        # (mu = (1-b1)*g, nu = (1-b2)*g^2) — compare them instead of the
        # params, whose first Adam update is ~±lr*sign(g) and thus flips on
        # FP-noise sign changes of near-zero grads. Tolerances are relative
        # to the GLOBAL grad scale: leaves that are mathematically ~0 carry
        # only FP noise, which differs between reduction orders.
        flat1 = jax.tree_util.tree_leaves(s1.opt_state)
        flat8 = jax.tree_util.tree_leaves(s8.opt_state)
        assert len(flat1) == len(flat8) and flat1
        gmax = max(np.abs(np.asarray(a)).max()
                   for a in flat1 if np.asarray(a).ndim)
        assert gmax > 0
        for a, b in zip(flat1, flat8):
            a, b = np.asarray(a), np.asarray(b)
            if a.ndim == 0:  # step counters
                np.testing.assert_array_equal(a, b)
                continue
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5 * gmax)

    def test_sm_kernel_matches_gspmd_xla(self, interpret_kernels):
        """shard_map kernel path == the pre-r5 GSPMD XLA mesh path (the
        shipped multi-device semantics didn't change, only the speed)."""
        model = _kernel_model()
        B, T = 8, 12
        batch = _batch(B, T, model)
        params = _init(model, batch)
        sched = Schedule.create("cosine", 10)
        config = TrainStepConfig(loss=LossConfig(), optim=OptimConfig(lr=1e-2))
        key = jax.random.PRNGKey(5)

        prev = mesh_mod._active_mesh
        try:
            mesh_mod.make_mesh()
            step_sm = make_train_step(model.apply, sched, config,
                                      shard_map_kernels=True)
            _, m_sm = self._run(step_sm,
                                create_train_state(params, config.optim),
                                batch, key)
            ops.enable_pallas_train_block(False)  # GSPMD path: kernels off
            ops.enable_pallas_encoder_tail(False)
            step_xla = make_train_step(model.apply, sched, config,
                                       shard_map_kernels=False)
            _, m_xla = self._run(step_xla,
                                 create_train_state(params, config.optim),
                                 batch, key)
        finally:
            mesh_mod._active_mesh = prev

        np.testing.assert_allclose(m_sm["loss"], m_xla["loss"], rtol=1e-5)
        np.testing.assert_allclose(m_sm["rot_mse"], m_xla["rot_mse"], rtol=1e-5)

    def test_force_sm_on_tp_mesh_raises(self):
        prev = mesh_mod._active_mesh
        try:
            mesh_mod.make_mesh(model_parallel=2)
            with pytest.raises(ValueError, match="pure-DP"):
                make_train_step(
                    _kernel_model().apply, Schedule.create("cosine", 10),
                    TrainStepConfig(), shard_map_kernels=True,
                )
        finally:
            mesh_mod._active_mesh = prev

    def test_goal_loss_under_shard_map(self, interpret_kernels):
        """target_loss_builder rebuilt per shard from the local cond: the
        goal-conditioned loss survives the shard_map path."""
        from mdm_tpu.train.goal_cond import (
            goal_cond_modifier, make_target_loss_builder,
        )

        model = _kernel_model(njoints=263, multi_target_cond=True)
        B, T = 8, 12
        batch = _batch(B, T, model)
        mean = np.zeros(263, np.float32)
        std = np.ones(263, np.float32)
        host = goal_cond_modifier(
            {"x": np.asarray(batch["x"])}, np.random.default_rng(0),
            mean, std,
        )
        batch["cond"] = batch["cond"].replace(
            target_cond=jnp.asarray(host["target_cond"]),
            target_validity=jnp.asarray(host["target_validity"]),
        )
        # init AFTER attaching targets so embed_target_cond params exist
        params = _init(model, batch)
        sched = Schedule.create("cosine", 10)
        config = TrainStepConfig(
            loss=LossConfig(lambda_target_loc=1.0), optim=OptimConfig(lr=1e-2))
        builder = make_target_loss_builder(mean, std)
        key = jax.random.PRNGKey(11)

        step_1dev = make_train_step(model.apply, sched, config,
                                    target_loss_builder=builder,
                                    use_shardings=False)
        _, m1 = self._run(step_1dev, create_train_state(params, config.optim),
                          batch, key)
        prev = mesh_mod._active_mesh
        try:
            mesh_mod.make_mesh()
            step_sm = make_train_step(model.apply, sched, config,
                                      target_loss_builder=builder,
                                      shard_map_kernels=True)
            _, m8 = self._run(step_sm,
                              create_train_state(params, config.optim),
                              batch, key)
        finally:
            mesh_mod._active_mesh = prev
        assert m1["target_loc"] > 0
        np.testing.assert_allclose(m1["target_loc"], m8["target_loc"],
                                   rtol=1e-4)
        np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=1e-5)


class TestSamplingShardMap:
    def test_sm_kernel_sampling_matches_single_device(self, interpret_kernels):
        """DDIM (deterministic) sampling: 8-shard shard_map kernel path ==
        single-device kernel path, same key => same initial noise."""
        model = _kernel_model()
        B, T = 8, 12
        batch = _batch(B, T, model)
        params = {"params": _init(model, batch)}
        sched = Schedule.create("cosine", 1000, timestep_respacing="4")
        gcfg = GenerationConfig(guidance_scale=2.5, sampler="ddim")
        cond = batch["cond"]
        key = jax.random.PRNGKey(9)

        gen1 = MotionGenerator(model, params, sched, gcfg, "humanml")
        a = np.asarray(gen1.sample_features(cond, B, T, key))

        prev = mesh_mod._active_mesh
        try:
            mesh = mesh_mod.make_mesh()
            gen8 = MotionGenerator(model, params, sched, gcfg, "humanml",
                                   mesh=mesh)
            assert gen8._sm_axes, "interpret mode should enable sm sampling"
            b = np.asarray(gen8.sample_features(cond, B, T, key))
        finally:
            mesh_mod._active_mesh = prev
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)

    def test_sm_kernel_ar_matches_single_device(self, interpret_kernels):
        """DiP AR scan under shard_map: chunk_noise pinned + DDIM => fully
        deterministic; sharded == single-device."""
        ctx, pred = 4, 8
        model = _kernel_model(arch="trans_dec", context_len=ctx,
                              pred_len=pred)
        B = 8
        D = model.config.input_feats
        cond = Conditioning(
            text_embed=jnp.asarray(
                RNG.normal(size=(B, 512)).astype(np.float32)),
            prefix=jnp.asarray(
                RNG.normal(size=(B, ctx, D)).astype(np.float32)),
        )
        params = {"params": model.init(
            jax.random.PRNGKey(0), jnp.zeros((B, pred, D)),
            jnp.zeros((B,), jnp.int32),
            cond.replace(frames_mask=jnp.ones((B, pred), bool)),
        )["params"]}
        sched = Schedule.create("cosine", 1000, timestep_respacing="4")
        gcfg = GenerationConfig(guidance_scale=7.5, sampler="ddim",
                                autoregressive=True, context_len=ctx,
                                pred_len=pred)
        frames = 16
        n_iters = frames // pred
        chunk_noise = jnp.asarray(
            RNG.normal(size=(n_iters, B, pred, D)).astype(np.float32))
        key = jax.random.PRNGKey(21)

        gen1 = MotionGenerator(model, params, sched, gcfg, "humanml")
        a = np.asarray(gen1.sample_autoregressive(
            cond, B, key, required_frames=frames, chunk_noise=chunk_noise))
        prev = mesh_mod._active_mesh
        try:
            mesh = mesh_mod.make_mesh()
            gen8 = MotionGenerator(model, params, sched, gcfg, "humanml",
                                   mesh=mesh)
            b = np.asarray(gen8.sample_autoregressive(
                cond, B, key, required_frames=frames,
                chunk_noise=chunk_noise))
        finally:
            mesh_mod._active_mesh = prev
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)

    def test_nondivisible_batch_falls_back(self, interpret_kernels):
        """B % dp != 0: the plain (replicated) path still serves the call."""
        model = _kernel_model()
        B, T = 3, 12
        cond = Conditioning(
            frames_mask=jnp.ones((B, T), bool),
            text_embed=jnp.asarray(
                RNG.normal(size=(B, 512)).astype(np.float32)),
        )
        params = {"params": model.init(
            jax.random.PRNGKey(0), jnp.zeros((B, T, 26)),
            jnp.zeros((B,), jnp.int32), cond)["params"]}
        sched = Schedule.create("cosine", 1000, timestep_respacing="4")
        prev = mesh_mod._active_mesh
        try:
            mesh = mesh_mod.make_mesh()
            gen = MotionGenerator(
                model, params, sched,
                GenerationConfig(guidance_scale=1.0, sampler="ddim"),
                "humanml", mesh=mesh)
            assert not gen._sm_ok(B)
            out = gen.sample_features(cond, B, T, jax.random.PRNGKey(1))
            assert out.shape == (B, T, 26)
            assert np.isfinite(np.asarray(out)).all()
        finally:
            mesh_mod._active_mesh = prev
