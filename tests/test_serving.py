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


def test_predictor_hik_output(monkeypatch):
    """output_format='hik' returns the HumanIK JSON dict (reference
    predict.py:143-145 via motions2hik), on the synthetic SMPL."""
    import mdm_tpu.visualize.joints2smpl as j2s
    from test_visualize import synthetic_model

    model = synthetic_model()
    monkeypatch.setattr(j2s.SMPLModel, "load", classmethod(lambda cls, *a, **k: model))

    cfg = PredictorConfig(
        num_diffusion_steps=10, respacing="3", max_frames=16,
        latent_dim=32, layers=2, compute_dtype="float32",
    )
    p = Predictor(cfg)
    p.setup()
    out = p.predict("a person waves", motion_length_sec=0.5, seed=2,
                    output_format="hik")
    assert "thetas" in out and "root_translation" in out and "joint_map" in out


def test_predictor_tensor_parallel():
    """tensor_parallel=2 serves through a Megatron-sharded denoiser on the
    virtual mesh with the same numerics as the unsharded predictor."""
    base = PredictorConfig(
        num_diffusion_steps=20, respacing="5", max_frames=24,
        latent_dim=32, layers=2, compute_dtype="float32",
    )
    p1 = Predictor(base)
    p1.setup()
    ref = np.asarray(p1.predict("a person waves", motion_length_sec=1.0,
                                seed=5)["joints"][0])

    import dataclasses

    p2 = Predictor(dataclasses.replace(base, tensor_parallel=2))
    p2.setup()
    out = np.asarray(p2.predict("a person waves", motion_length_sec=1.0,
                                seed=5)["joints"][0])
    from mdm_tpu.parallel import make_mesh

    make_mesh(model_parallel=1)  # restore default mesh for later tests
    np.testing.assert_allclose(out, ref, atol=2e-4)
