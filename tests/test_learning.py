"""End-to-end learning test: the full train->sample path must actually learn.

Trains a tiny MDM on a synthetic motion distribution (smooth sinusoids with
condition-dependent amplitude) and checks that ancestral samples reproduce
the distribution's statistics — the kind of sign/coefficient bug that parity
tests on frozen tensors cannot catch shows up here as garbage samples.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.diffusion import Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.parallel import make_mesh
from mdm_tpu.sampling import GenerationConfig, MotionGenerator
from mdm_tpu.train import OptimConfig, TrainStepConfig, create_train_state, make_train_step

B, T, D = 32, 24, 8


def synth_batch(rng):
    """Smooth sinusoid motions; amplitude keyed by a binary 'text' condition."""
    amp = rng.choice([0.3, 1.2], size=(B, 1, 1))
    phase = rng.uniform(0, 2 * np.pi, size=(B, 1, D))
    tgrid = np.linspace(0, 2 * np.pi, T)[None, :, None]
    x = (amp * np.sin(tgrid + phase)).astype(np.float32)
    text_embed = np.zeros((B, 512), np.float32)
    text_embed[:, :64] = (amp[:, 0, 0] > 0.5).astype(np.float32)[:, None]
    return x, text_embed


@pytest.mark.slow
def test_train_then_sample_matches_distribution():
    make_mesh()
    cfg = MDMConfig(njoints=D, nfeats=1, latent_dim=64, ff_size=128,
                    num_layers=3, num_heads=4, dropout=0.0)
    model = MDM(cfg)
    rng = np.random.default_rng(0)
    x0, te0 = synth_batch(rng)
    cond0 = Conditioning(frames_mask=jnp.ones((B, T), bool),
                         text_embed=jnp.asarray(te0))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x0),
                        jnp.zeros((B,), jnp.int32), cond0)["params"]

    sched = Schedule.create("cosine", 32)
    config = TrainStepConfig(optim=OptimConfig(lr=1e-3, use_ema=True, ema_decay=0.995),
                             cond_mask_prob=0.1)
    step = make_train_step(model.apply, sched, config)
    state = create_train_state(params, config.optim)

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(1500):
        x, te = synth_batch(rng)
        batch = {
            "x": jnp.asarray(x),
            "mask": jnp.ones((B, T), bool),
            "cond": Conditioning(text_embed=jnp.asarray(te)),
        }
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    # Predict-x0 loss has an irreducible floor at high t; 1500 steps reach
    # ~0.12 from ~0.39 on this task.
    assert np.mean(losses[-50:]) < np.mean(losses[:50]) * 0.5, "loss did not drop"

    # Sample with the trained EMA weights, conditioned on high amplitude.
    gen = MotionGenerator(
        model, {"params": state.ema_params}, sched,
        GenerationConfig(guidance_scale=1.0), "humanact12",  # no hml decode
    )
    te_hi = np.zeros((B, 512), np.float32)
    te_hi[:, :64] = 1.0
    cond_hi = Conditioning(frames_mask=jnp.ones((B, T), bool),
                           text_embed=jnp.asarray(te_hi))
    samples_hi = np.asarray(gen.sample_features(cond_hi, B, T, jax.random.PRNGKey(2)))
    te_lo = np.zeros((B, 512), np.float32)
    cond_lo = Conditioning(frames_mask=jnp.ones((B, T), bool),
                           text_embed=jnp.asarray(te_lo))
    samples_lo = np.asarray(gen.sample_features(cond_lo, B, T, jax.random.PRNGKey(3)))

    assert np.isfinite(samples_hi).all()
    # The data std: high-amp sinusoids have std ~ 1.2/sqrt(2)=0.85,
    # low-amp ~ 0.21. Samples must separate clearly by condition.
    std_hi = samples_hi.std()
    std_lo = samples_lo.std()
    # data stds: 1.2/sqrt(2)=0.85 (hi) and 0.21 (lo); measured 0.82/0.21
    assert std_hi > 2.0 * std_lo, f"conditioning not learned: {std_hi} vs {std_lo}"
    # and land near the data scale for the high condition
    assert 0.4 < std_hi < 1.4, std_hi
