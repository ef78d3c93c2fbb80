"""Training runtime: jitted DP train step on the 8-device CPU mesh,
EMA semantics, checkpoint round-trip, smoke loop."""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.diffusion import LossConfig, Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.parallel import make_mesh
from mdm_tpu.train import (
    LoopConfig,
    OptimConfig,
    TrainLoop,
    TrainStepConfig,
    create_train_state,
    make_train_step,
)
from mdm_tpu.train.resample import (
    LossAwareState,
    loss_aware_sample_t,
    loss_aware_update,
    uniform_sample_t,
)

B, T, D = 8, 16, 26


def setup_model():
    cfg = MDMConfig(njoints=D, nfeats=1, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4)
    model = MDM(cfg)
    x = jnp.zeros((B, T, D))
    t = jnp.zeros((B,), jnp.int32)
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.zeros((B, 512)),
    )
    params = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    return model, params


def make_batch(rng):
    return {
        "x": jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)),
        "mask": jnp.asarray(np.ones((B, T), bool)),
        "cond": Conditioning(
            text_embed=jnp.asarray(rng.normal(size=(B, 512)).astype(np.float32))
        ),
    }


class TestTrainStep:
    def test_sharded_step_runs_and_descends(self):
        make_mesh()  # 8 virtual CPU devices
        model, params = setup_model()
        sched = Schedule.create("cosine", 50)
        config = TrainStepConfig(
            loss=LossConfig(), optim=OptimConfig(lr=1e-3), cond_mask_prob=0.1
        )
        step = make_train_step(model.apply, sched, config)
        state = create_train_state(params, config.optim)

        rng = np.random.default_rng(0)
        losses = []
        key = jax.random.PRNGKey(1)
        batch = make_batch(rng)
        for i in range(12):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 12
        # On a fixed batch the loss must clearly decrease.
        assert np.mean(losses[-3:]) < np.mean(losses[:3])
        for k in ["grad_norm", "param_norm", "loss_q0", "loss_q3", "rot_mse"]:
            assert k in metrics

    def test_ema_matches_manual_update(self):
        model, params = setup_model()
        sched = Schedule.create("cosine", 10)
        decay = 0.9
        config = TrainStepConfig(optim=OptimConfig(lr=1e-3, ema_decay=decay))
        step = make_train_step(model.apply, sched, config, use_shardings=False)
        state = create_train_state(params, config.optim)
        ema_before = jax.tree_util.tree_map(np.asarray, state.ema_params)

        batch = make_batch(np.random.default_rng(1))
        state, _ = step(state, batch, jax.random.PRNGKey(2))

        def check(e0, p1, e1):
            np.testing.assert_allclose(
                np.asarray(e1), decay * e0 + (1 - decay) * np.asarray(p1), atol=1e-6
            )

        jax.tree_util.tree_map(check, ema_before, state.params, state.ema_params)


class TestResamplers:
    def test_uniform(self):
        t, w = uniform_sample_t(jax.random.PRNGKey(0), 1000, 50)
        assert t.shape == (1000,) and (np.asarray(t) < 50).all()
        np.testing.assert_allclose(np.asarray(w), 1.0)

    def test_loss_aware_warmup_then_weighted(self):
        state = LossAwareState.create(num_timesteps=10, history_per_term=2)
        key = jax.random.PRNGKey(0)
        t, w = loss_aware_sample_t(key, state, 64)
        np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-5)  # uniform during warmup
        # Feed skewed losses: high loss at t=0.
        for i in range(4):
            tt = jnp.asarray(np.arange(10).repeat(2))
            ll = jnp.asarray((np.arange(10) == 0).repeat(2) * 10.0 + 0.1)
            state = loss_aware_update(state, tt, ll)
        assert bool(state.warmed_up)
        t, w = loss_aware_sample_t(jax.random.PRNGKey(3), state, 2000)
        counts = np.bincount(np.asarray(t), minlength=10)
        assert counts[0] > counts[5] * 2  # t=0 oversampled


class TestLoopAndCheckpoints:
    def test_smoke_loop_with_save_and_resume(self, tmp_path):
        os.environ["MDM_TPU_TRAINING_TEST"] = "1"
        try:
            make_mesh()
            model, params = setup_model()
            sched = Schedule.create("cosine", 10)
            config = TrainStepConfig(optim=OptimConfig(lr=1e-3))
            step = make_train_step(model.apply, sched, config)
            state = create_train_state(params, config.optim)

            rng = np.random.default_rng(2)

            def data_gen():
                while True:
                    yield make_batch(rng)

            loop_cfg = LoopConfig(
                save_dir=str(tmp_path / "run"), num_steps=10,
                log_interval=2, save_interval=4,
            )
            loop = TrainLoop(
                step, state, data_gen(), loop_cfg, args={"dataset": "synthetic"}
            )
            loop.run()
            assert loop.step == 4  # stopped after first save (test hook)
            assert os.path.exists(tmp_path / "run" / "args.json")

            # Resume: a fresh loop picks up the checkpoint.
            state2 = create_train_state(params, config.optim)
            loop2 = TrainLoop(step, state2, data_gen(), loop_cfg)
            assert loop2.step == 4

            # Explicit --resume_checkpoint into an EMPTY save_dir
            # (reference training_loop.py:131 fallback).
            ckpt = os.path.join(str(tmp_path / "run"), "ckpt_000000004")
            loop_cfg3 = LoopConfig(
                save_dir=str(tmp_path / "run3"), num_steps=10,
                log_interval=2, save_interval=4,
                resume_checkpoint=ckpt,
            )
            state3 = create_train_state(params, config.optim)
            loop3 = TrainLoop(step, state3, data_gen(), loop_cfg3)
            assert loop3.step == 4
        finally:
            os.environ.pop("MDM_TPU_TRAINING_TEST", None)


class TestBitExactResume:
    """train(N) == train(k) + checkpoint + resume + train(N-k), bit for bit.

    The loop derives per-step keys with fold_in(base, step) and fast-forwards
    a data iterable exposing iter_from(step); the reference restores only
    weights and lets the torch RNG / DataLoader drift (training_loop.py:385).
    """

    class _StepData:
        """Deterministic stand-in with the iter_from contract."""

        def __iter__(self):
            return self.iter_from(0)

        def iter_from(self, start_step):
            def gen():
                i = start_step
                while True:
                    yield make_batch(np.random.default_rng(100 + i))
                    i += 1

            return gen()

    def test_resume_is_bit_exact(self, tmp_path):
        make_mesh()
        model, params = setup_model()
        sched = Schedule.create("cosine", 10)
        config = TrainStepConfig(optim=OptimConfig(lr=1e-3))
        step = make_train_step(model.apply, sched, config)

        def run(save_dir, num_steps):
            cfg = LoopConfig(
                save_dir=str(save_dir), num_steps=num_steps,
                log_interval=100, save_interval=3,
            )
            loop = TrainLoop(
                step, create_train_state(params, config.optim),
                self._StepData(), cfg, rng_seed=11,
            )
            loop.run()
            return loop

        straight = run(tmp_path / "a", 6)
        assert straight.step == 6

        interrupted = run(tmp_path / "b", 3)
        assert interrupted.step == 3
        resumed = run(tmp_path / "b", 6)  # picks up ckpt_000000003
        assert resumed.step == 6

        def same(p, q):
            np.testing.assert_array_equal(np.asarray(p), np.asarray(q))

        jax.tree_util.tree_map(same, straight.state.params, resumed.state.params)
        jax.tree_util.tree_map(same, straight.state.ema_params, resumed.state.ema_params)
        jax.tree_util.tree_map(
            lambda p, q: np.testing.assert_array_equal(np.asarray(p), np.asarray(q)),
            straight.state.opt_state, resumed.state.opt_state,
        )


class TestLossAwareTrainStep:
    def test_loss_aware_sampler_in_step(self):
        make_mesh()
        model, params = setup_model()
        sched = Schedule.create("cosine", 16)
        config = TrainStepConfig(
            optim=OptimConfig(lr=1e-3), schedule_sampler="loss-second-moment"
        )
        step = make_train_step(model.apply, sched, config)
        state = create_train_state(params, config.optim)
        sampler_state = LossAwareState.create(16, history_per_term=2)

        rng = np.random.default_rng(4)
        batch = make_batch(rng)
        key = jax.random.PRNGKey(5)
        for i in range(5):
            key, sub = jax.random.split(key)
            state, metrics, sampler_state = step(state, batch, sub, sampler_state)
        assert np.isfinite(float(metrics["loss"]))
        # history has been populated
        assert int(np.asarray(sampler_state.counts).sum()) > 0


class TestProfileTrace:
    def test_trace_capture(self, tmp_path):
        """--profile_trace_dir captures a jax.profiler trace of steps 2-6."""
        make_mesh()
        model, params = setup_model()
        sched = Schedule.create("cosine", 10)
        config = TrainStepConfig(optim=OptimConfig(lr=1e-3))
        step = make_train_step(model.apply, sched, config)

        rng = np.random.default_rng(3)

        def data_gen():
            while True:
                yield make_batch(rng)

        trace_dir = str(tmp_path / "trace")
        cfg = LoopConfig(
            save_dir=str(tmp_path / "run"), num_steps=8,
            log_interval=100, save_interval=100,
            profile_trace_dir=trace_dir,
        )
        TrainLoop(step, create_train_state(params, config.optim),
                  data_gen(), cfg).run()
        import glob
        assert glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                         recursive=True), os.listdir(trace_dir)
