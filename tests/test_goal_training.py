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


def test_geometric_losses_with_smpl_in_train_step():
    """rcxyz + fc losses through a (synthetic) SMPL decode in the jitted
    train step — the differentiable-FK-inside-loss-graph capability."""
    from mdm_tpu.smpl import Rot2XYZConfig, SMPLModel, rot2xyz

    rng = np.random.default_rng(7)
    V, J = 40, 24
    parents = np.array(
        [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21]
    )
    jr = rng.random((J, V)) ** 4
    w = rng.random((V, J)) ** 4
    smpl = SMPLModel(
        v_template=rng.normal(size=(V, 3)).astype(np.float32),
        shapedirs=(rng.normal(size=(V, 3, 10)) * 0.01).astype(np.float32),
        posedirs=(rng.normal(size=((J - 1) * 9, V * 3)) * 0.001).astype(np.float32),
        j_regressor=(jr / jr.sum(1, keepdims=True)).astype(np.float32),
        parents=parents,
        lbs_weights=(w / w.sum(1, keepdims=True)).astype(np.float32),
        extra_vertex_ids=np.arange(21, dtype=np.int32),
    )
    r2x = Rot2XYZConfig(jointstype="smpl", vertstrans=False)

    def get_xyz(feats):
        r6 = feats.reshape(feats.shape[0], feats.shape[1], 25, 6)
        return rot2xyz(smpl, r6, r2x)

    make_mesh()
    Ba, Ta, Da = 8, 10, 150
    cfg = MDMConfig(njoints=25, nfeats=6, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4, data_rep="rot6d",
                    cond_mode="action", num_actions=12)
    model = MDM(cfg)
    cond = Conditioning(frames_mask=jnp.ones((Ba, Ta), bool),
                        action=jnp.asarray(rng.integers(0, 12, Ba)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((Ba, Ta, Da)),
                        jnp.zeros((Ba,), jnp.int32), cond)["params"]
    sched = Schedule.create("cosine", 16)
    config = TrainStepConfig(
        loss=LossConfig(lambda_rcxyz=1.0, lambda_fc=1.0, lambda_vel=1.0,
                        vel_drop_last_feats=6),
        optim=OptimConfig(lr=1e-3),
    )
    step = make_train_step(model.apply, sched, config, get_xyz=get_xyz)
    state = create_train_state(params, config.optim)
    batch = {
        "x": jnp.asarray(rng.normal(size=(Ba, Ta, Da)).astype(np.float32)),
        "mask": jnp.ones((Ba, Ta), bool),
        "cond": cond,
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("rcxyz_mse", "fc", "vel_mse"):
        assert k in metrics and np.isfinite(float(metrics[k])), k


def test_deferred_target_extraction_matches_precomputed():
    """compute_target=False + make_train_step(target_cond_fn=...) must give
    the SAME step metrics as the eager host-side extraction (the CLI path
    defers to keep the input pipeline free of device round-trips)."""
    from mdm_tpu.train.goal_cond import make_target_cond_fn

    make_mesh()
    G = len(extended_goal_names())
    cfg = MDMConfig(njoints=D, nfeats=1, latent_dim=32, ff_size=64, num_layers=2,
                    num_heads=4, multi_target_cond=True, num_goal_joints=G - 2)
    model = MDM(cfg)
    mean, std = load_norm_stats("humanml")

    raw = {
        "x": np.random.default_rng(1).normal(size=(B, T, D)).astype(np.float32),
        "mask": np.ones((B, T), bool),
    }
    eager = goal_cond_modifier(dict(raw), np.random.default_rng(3), mean, std)
    lazy = goal_cond_modifier(dict(raw), np.random.default_rng(3), mean, std,
                              compute_target=False)
    assert "target_cond" not in lazy
    np.testing.assert_array_equal(eager["target_validity"],
                                  lazy["target_validity"])

    text = np.random.default_rng(2).normal(size=(B, 512)).astype(np.float32)

    def build(batch_raw, with_target):
        kw = dict(
            frames_mask=jnp.asarray(batch_raw["mask"]),
            text_embed=jnp.asarray(text),
            target_validity=jnp.asarray(batch_raw["target_validity"]),
        )
        if with_target:
            kw["target_cond"] = jnp.asarray(batch_raw["target_cond"])
        return Conditioning(**kw)

    cond_e = build(eager, True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(raw["x"]),
                        jnp.zeros((B,), jnp.int32), cond_e)["params"]
    sched = Schedule.create("cosine", 20)
    config = TrainStepConfig(loss=LossConfig(lambda_target_loc=1.0),
                             optim=OptimConfig(lr=1e-3), cond_mask_prob=0.1)

    def run(cond, target_cond_fn):
        step = make_train_step(
            model.apply, sched, config,
            target_loss_builder=make_target_loss_builder(mean, std),
            target_cond_fn=target_cond_fn,
        )
        state = create_train_state(params, config.optim)
        batch = {"x": jnp.asarray(raw["x"]), "mask": jnp.asarray(raw["mask"]),
                 "cond": cond}
        _, metrics = step(state, batch, jax.random.PRNGKey(5))
        return {k: float(v) for k, v in metrics.items()}

    m_eager = run(cond_e, None)
    m_lazy = run(build(lazy, False), make_target_cond_fn(mean, std))
    for k in ("loss", "target_loc", "rot_mse"):
        np.testing.assert_allclose(m_lazy[k], m_eager[k], rtol=1e-5,
                                   err_msg=k)
