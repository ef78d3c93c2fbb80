"""Hybrid multi-slice mesh (SURVEY §5.8): ('slice', 'data', 'model').

The data axis lies within a slice (gradient all-reduce over ICI); the
slice axis crosses DCN. On the virtual 8-device CPU mesh we verify the
whole plumbing — mesh construction, combined ('slice','data') batch
sharding, the full train step (pure-DP and DP x TP), and sharded
generation — gives identical numerics to the flat data-parallel layout.
The genuinely multi-host parts (process-local `shard_batch` feeding via
jax.make_array_from_process_local_data) are single-process no-ops here and
documented in docs/DESIGN.md.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.diffusion import Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.parallel import batch_axes, batch_sharding, make_mesh, shard_batch
from mdm_tpu.train import (
    OptimConfig,
    TrainStepConfig,
    create_train_state,
    make_train_step,
)

B, T, D = 8, 16, 26


@pytest.fixture(autouse=True)
def _restore_flat_mesh():
    yield
    make_mesh(model_parallel=1)


def test_hybrid_mesh_axes_and_batch_spec():
    mesh = make_mesh(num_slices=2)
    assert mesh.axis_names == ("slice", "data", "model")
    assert mesh.shape["slice"] == 2
    assert mesh.shape["data"] == 4
    assert mesh.shape["model"] == 1
    assert batch_axes(mesh) == ("slice", "data")
    sh = batch_sharding(mesh)
    # a B=8 batch spreads one sample per device across slice x data
    arr = jax.device_put(jnp.arange(8.0), sh)
    assert len(arr.sharding.device_set) == 8


def test_hybrid_mesh_rejects_indivisible():
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(num_slices=3)


def _setup(cond_mask_prob=0.0):
    cfg = MDMConfig(njoints=D, nfeats=1, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4)
    model = MDM(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.asarray(rng.normal(size=(B, 512)).astype(np.float32)),
    )
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond
    )["params"]
    sched = Schedule.create("cosine", 10)
    config = TrainStepConfig(optim=OptimConfig(lr=1e-3), cond_mask_prob=cond_mask_prob)
    batch = {"x": x, "mask": jnp.ones((B, T), bool), "cond": cond}
    return model, params, sched, config, batch


def test_hybrid_train_step_matches_flat_dp():
    model, params, sched, config, batch = _setup()

    # flat 8-way DP
    make_mesh(model_parallel=1)
    state = create_train_state(params, config.optim)
    step = make_train_step(model.apply, sched, config)
    _, metrics_flat = step(state, shard_batch(batch), jax.random.PRNGKey(1))

    # hybrid 2 slices x 4 data
    mesh = make_mesh(num_slices=2)
    state2 = create_train_state(params, config.optim)
    step_h = make_train_step(model.apply, sched, config)
    sharded = shard_batch(batch, mesh)
    assert len(sharded["x"].sharding.device_set) == 8
    state_h, metrics_h = step_h(state2, sharded, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(metrics_h["loss"]), float(metrics_flat["loss"]), rtol=2e-4
    )


def test_hybrid_with_tensor_parallel():
    from mdm_tpu.parallel.tp_rules import shard_state, state_shardings

    model, params, sched, config, batch = _setup()

    # flat DP baseline
    make_mesh(model_parallel=1)
    state = create_train_state(params, config.optim)
    step = make_train_step(model.apply, sched, config)
    state_dp, metrics_flat = step(state, shard_batch(batch), jax.random.PRNGKey(1))

    # 2 slices x 2 data x 2 model
    mesh = make_mesh(num_slices=2, model_parallel=2)
    assert mesh.shape["data"] == 2
    state2 = create_train_state(params, config.optim)
    state2 = shard_state(state2, mesh)
    sh = state_shardings(state2, mesh)
    step_h = make_train_step(model.apply, sched, config, state_shardings=sh)
    state_h, metrics_h = step_h(state2, shard_batch(batch, mesh), jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(metrics_h["loss"]), float(metrics_flat["loss"]), rtol=2e-4
    )
    a = np.asarray(state_h.params["output_process"]["poseFinal"]["kernel"])
    b = np.asarray(state_dp.params["output_process"]["poseFinal"]["kernel"])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_hybrid_sharded_sampling():
    """MotionGenerator's batch sharding follows the combined
    ('slice','data') axes on a hybrid mesh, numerics unchanged."""
    from mdm_tpu.sampling import GenerationConfig, MotionGenerator

    cfg = MDMConfig(njoints=D, nfeats=1, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4)
    model = MDM(cfg)
    Bs, Ts = 16, 12
    cond = Conditioning(
        frames_mask=jnp.ones((Bs, Ts), bool),
        text_embed=jnp.asarray(
            np.random.default_rng(0).normal(size=(Bs, 512)).astype(np.float32)
        ),
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((Bs, Ts, D)),
                        jnp.zeros((Bs,), jnp.int32), cond)
    sched = Schedule.create("cosine", 1000, timestep_respacing="8")

    gen = MotionGenerator(model, params, sched,
                          GenerationConfig(guidance_scale=2.5), "humanml")
    baseline = np.asarray(gen.sample_features(cond, Bs, Ts, jax.random.PRNGKey(1)))

    mesh = make_mesh(num_slices=2)
    gen_h = MotionGenerator(model, params, sched,
                            GenerationConfig(guidance_scale=2.5), "humanml",
                            mesh=mesh)
    out = np.asarray(gen_h.sample_features(cond, Bs, Ts, jax.random.PRNGKey(1)))
    np.testing.assert_allclose(out, baseline, atol=2e-4)
