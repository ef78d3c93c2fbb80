"""Serving wrapper smoke: setup -> warm -> predict (reference sample/predict.py)."""
import numpy as np
import pytest

pytest.importorskip("jax")

from mdm_tpu.serving import Predictor, PredictorConfig


def test_predictor_setup_and_predict():
    cfg = PredictorConfig(
        num_diffusion_steps=20, respacing="5", max_frames=24,
        latent_dim=32, layers=2, compute_dtype="float32",
    )
    p = Predictor(cfg)
    p.setup()
    out = p.predict("a person walks forward", motion_length_sec=1.0, seed=3)
    joints = np.asarray(out["joints"][0])
    assert joints.shape == (1, 20, 22, 3)  # 1.0s * 20fps, t2m skeleton
    assert np.isfinite(joints).all()
    assert out["prompt"] == "a person walks forward"

    # determinism: same seed -> same motion
    out2 = p.predict("a person walks forward", motion_length_sec=1.0, seed=3)
    np.testing.assert_allclose(joints, np.asarray(out2["joints"][0]), atol=1e-5)


def test_predictor_fast_sampler():
    """Serving with the dpmpp_2m fast solver (production latency config)."""
    cfg = PredictorConfig(
        num_diffusion_steps=20, respacing="5", max_frames=24,
        latent_dim=32, layers=2, compute_dtype="float32",
        sampler="dpmpp_2m",
    )
    p = Predictor(cfg)
    p.setup()
    out = p.predict("a person jumps", motion_length_sec=1.0, seed=1)
    joints = np.asarray(out["joints"][0])
    assert joints.shape == (1, 20, 22, 3)
    assert np.isfinite(joints).all()
