"""2-D (data x model) mesh: tensor-parallel train step on the CPU mesh."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.diffusion import Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.parallel import make_mesh
from mdm_tpu.parallel.tp_rules import (
    param_shardings,
    shard_state,
    spec_for_param,
    state_shardings,
)
from mdm_tpu.train import OptimConfig, TrainStepConfig, create_train_state, make_train_step

B, T, D = 8, 16, 26


def test_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert spec_for_param("seqTransEncoder/layers_0/self_attn/q_proj/kernel", 2) == P(None, "model")
    assert spec_for_param("seqTransEncoder/layers_0/self_attn/out_proj/kernel", 2) == P("model", None)
    assert spec_for_param("seqTransEncoder/layers_0/linear1/kernel", 2) == P(None, "model")
    assert spec_for_param("seqTransEncoder/layers_0/linear2/kernel", 2) == P("model", None)
    assert spec_for_param("input_process/poseEmbedding/kernel", 2) == P()
    assert spec_for_param("seqTransEncoder/layers_0/norm1/scale", 1) == P()


def test_tp_train_step_runs_and_matches_dp():
    mesh_tp = make_mesh(model_parallel=2)  # 4 data x 2 model
    cfg = MDMConfig(njoints=D, nfeats=1, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4)
    model = MDM(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.asarray(rng.normal(size=(B, 512)).astype(np.float32)),
    )
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond)["params"]

    sched = Schedule.create("cosine", 10)
    config = TrainStepConfig(optim=OptimConfig(lr=1e-3), cond_mask_prob=0.0)
    batch = {"x": x, "mask": jnp.ones((B, T), bool), "cond": cond}

    # --- TP path
    state = create_train_state(params, config.optim)
    state = shard_state(state, mesh_tp)
    sh = state_shardings(state, mesh_tp)
    step_tp = make_train_step(model.apply, sched, config, state_shardings=sh)
    state_tp, metrics_tp = step_tp(state, batch, jax.random.PRNGKey(1))

    # param shardings survive the step (no silent re-replication)
    qk = state_tp.params["seqTransEncoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert "model" in str(qk.sharding.spec)

    # --- DP-only path for numeric comparison
    make_mesh(model_parallel=1)
    state2 = create_train_state(params, config.optim)
    step_dp = make_train_step(model.apply, sched, config)
    state_dp, metrics_dp = step_dp(state2, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(metrics_tp["loss"]), float(metrics_dp["loss"]), rtol=2e-4
    )
    # updated params agree between layouts
    a = np.asarray(state_tp.params["output_process"]["poseFinal"]["kernel"])
    b = np.asarray(state_dp.params["output_process"]["poseFinal"]["kernel"])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_sharded_batch_sampling():
    """The jitted sampler follows batch sharding across the mesh (multi-chip
    generation for eval/serving): sharded inputs -> sharded outputs, same
    numerics as single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mdm_tpu.diffusion import Schedule
    from mdm_tpu.sampling import GenerationConfig, MotionGenerator

    mesh = make_mesh(model_parallel=1)  # 8-way data parallel
    cfg = MDMConfig(njoints=D, nfeats=1, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4)
    model = MDM(cfg)
    Bs, Ts = 16, 12
    cond_host = Conditioning(
        frames_mask=jnp.ones((Bs, Ts), bool),
        text_embed=jnp.asarray(np.random.default_rng(0).normal(size=(Bs, 512)).astype(np.float32)),
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((Bs, Ts, D)),
                        jnp.zeros((Bs,), jnp.int32), cond_host)
    sched = Schedule.create("cosine", 1000, timestep_respacing="8")
    gen = MotionGenerator(model, params, sched, GenerationConfig(guidance_scale=2.5), "humanml")

    baseline = np.asarray(gen.sample_features(cond_host, Bs, Ts, jax.random.PRNGKey(1)))

    sh = NamedSharding(mesh, P("data"))
    cond_sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if x is not None else None, cond_host,
        is_leaf=lambda x: x is None,
    )
    out = gen.sample_features(cond_sharded, Bs, Ts, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), baseline, atol=2e-4)


def test_tensor_parallel_sampling_matches_single_device():
    """TP sampling (MotionGenerator on a data x model mesh): params are
    Megatron-sharded per tp_rules, the 50-step scan runs with XLA-inserted
    all-reduces, and the numerics match the unsharded sampler."""
    from mdm_tpu.diffusion import Schedule
    from mdm_tpu.sampling import GenerationConfig, MotionGenerator

    cfg = MDMConfig(njoints=D, nfeats=1, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4)
    model = MDM(cfg)
    Bs, Ts = 8, 12
    cond = Conditioning(
        frames_mask=jnp.ones((Bs, Ts), bool),
        text_embed=jnp.asarray(
            np.random.default_rng(3).normal(size=(Bs, 512)).astype(np.float32)),
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((Bs, Ts, D)),
                        jnp.zeros((Bs,), jnp.int32), cond)
    sched = Schedule.create("cosine", 1000, timestep_respacing="8")

    baseline = np.asarray(
        MotionGenerator(model, params, sched,
                        GenerationConfig(guidance_scale=2.5), "humanml")
        .sample_features(cond, Bs, Ts, jax.random.PRNGKey(1)))

    mesh_tp = make_mesh(model_parallel=2)  # 4 data x 2 model
    gen_tp = MotionGenerator(model, params, sched,
                             GenerationConfig(guidance_scale=2.5), "humanml",
                             mesh=mesh_tp)
    # q_proj kernels must actually be sharded over the model axis
    qk = gen_tp.params["params"]["seqTransEncoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert "model" in str(qk.sharding.spec)
    out = np.asarray(gen_tp.sample_features(cond, Bs, Ts, jax.random.PRNGKey(1)))

    # The DiP autoregressive scan also runs through the TP-sharded params.
    cfg_ar = GenerationConfig(guidance_scale=1.0, context_len=4, pred_len=4)
    cond_ar = cond.replace(
        frames_mask=jnp.ones((Bs, 4), bool),
        prefix=jnp.zeros((Bs, 4, D), jnp.float32),
    )
    ar_base = np.asarray(
        MotionGenerator(model, params, sched, cfg_ar, "humanml")
        .sample_autoregressive(cond_ar, Bs, jax.random.PRNGKey(2),
                               required_frames=8))
    ar_tp = np.asarray(
        MotionGenerator(model, params, sched, cfg_ar, "humanml", mesh=mesh_tp)
        .sample_autoregressive(cond_ar, Bs, jax.random.PRNGKey(2),
                               required_frames=8))
    make_mesh(model_parallel=1)  # restore default mesh for later tests
    np.testing.assert_allclose(out, baseline, atol=2e-4)
    np.testing.assert_allclose(ar_tp, ar_base, atol=2e-4)
