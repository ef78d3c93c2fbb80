"""Train step with DiP target-conditioning loss enabled end-to-end."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.core.goals import extended_goal_names
from mdm_tpu.diffusion import LossConfig, Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.parallel import make_mesh
from mdm_tpu.sampling.pipeline import load_norm_stats
from mdm_tpu.train import OptimConfig, TrainStepConfig, create_train_state, make_train_step
from mdm_tpu.train.goal_cond import goal_cond_modifier, make_target_loss_builder

B, T, D = 8, 16, 263


def test_target_loss_training_step():
    make_mesh()
    G = len(extended_goal_names())
    cfg = MDMConfig(njoints=D, nfeats=1, latent_dim=32, ff_size=64, num_layers=2,
                    num_heads=4, multi_target_cond=True, num_goal_joints=G - 2)
    model = MDM(cfg)
    mean, std = load_norm_stats("humanml")
    rng = np.random.default_rng(0)

    raw = {
        "x": rng.normal(size=(B, T, D)).astype(np.float32),
        "mask": np.ones((B, T), bool),
    }
    raw = goal_cond_modifier(raw, rng, mean, std)
    assert raw["target_cond"].shape == (B, G, 3)

    cond = Conditioning(
        frames_mask=jnp.asarray(raw["mask"]),
        text_embed=jnp.asarray(rng.normal(size=(B, 512)).astype(np.float32)),
        target_cond=jnp.asarray(raw["target_cond"]),
        target_validity=jnp.asarray(raw["target_validity"]),
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(raw["x"]),
        jnp.zeros((B,), jnp.int32), cond,
    )["params"]

    sched = Schedule.create("cosine", 20)
    config = TrainStepConfig(
        loss=LossConfig(lambda_target_loc=1.0),
        optim=OptimConfig(lr=1e-3),
    )
    step = make_train_step(
        model.apply, sched, config,
        target_loss_builder=make_target_loss_builder(mean, std),
    )
    state = create_train_state(params, config.optim)
    batch = {"x": jnp.asarray(raw["x"]), "mask": jnp.asarray(raw["mask"]), "cond": cond}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert "target_loc" in metrics
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["target_loc"]) > 0
