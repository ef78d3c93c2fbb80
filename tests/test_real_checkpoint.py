"""Guarded published-checkpoint parity test.

Skipped unless a REAL released reference checkpoint is mounted (the zips
from README.md:304-345, e.g. `humanml-encoder-512-50steps`). Activates the
moment assets land: converts the .pt, checks forward parity against the
reference torch model built from the run's args.json, and samples a short
motion. Runbook: docs/REAL_CHECKPOINTS.md.

Point MDM_TPU_REAL_CKPT at a model*.pt (or place the unzipped run at
./save/humanml_trans_enc_512/model000475000.pt).
"""
import glob
import json
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def _find_real_ckpt():
    env = os.environ.get("MDM_TPU_REAL_CKPT")
    if env and os.path.exists(env):
        return env
    for pat in ("save/*/model*.pt", "save/*/*.pt"):
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    return None


CKPT = _find_real_ckpt()

pytestmark = pytest.mark.skipif(
    CKPT is None,
    reason="no published reference checkpoint mounted "
    "(set MDM_TPU_REAL_CKPT or unzip a release under ./save/); "
    "see docs/REAL_CHECKPOINTS.md",
)


@pytest.fixture(scope="module")
def run_args():
    args_path = os.path.join(os.path.dirname(CKPT), "args.json")
    assert os.path.exists(args_path), (
        f"published runs ship args.json next to the .pt ({args_path} missing)"
    )
    with open(args_path) as f:
        return json.load(f)


def test_convert_and_forward_parity(reference_path, run_args):
    """Converted real weights produce the reference's forward output."""
    import torch

    from tests.test_checkpoint_conversion import ref_mdm_cls  # fixture import

    # Build the reference model exactly as utils/model_util.py does for the
    # published runs (load-tolerance surface: model_util.py:118-132).
    sys.path.append(reference_path)
    import types

    import torch.nn as nn

    clip_stub = types.ModuleType("clip")
    clip_stub.load = lambda *a, **k: (nn.Linear(1, 1), None)
    clip_stub.tokenize = lambda *a, **k: None
    sys.modules.setdefault("clip", clip_stub)
    rot_stub = types.ModuleType("model.rotation2xyz")

    class _FakeSMPL:
        def _apply(self, fn):
            return self

        def train(self, *a, **k):
            return self

    rot_stub.Rotation2xyz = type(
        "Rotation2xyz", (), {"__init__": lambda self, *a, **k: setattr(self, "smpl_model", _FakeSMPL())}
    )
    sys.modules["model.rotation2xyz"] = rot_stub
    from model.mdm import MDM as RefMDM

    from mdm_tpu.models import MDM, Conditioning
    from mdm_tpu.models.convert import convert_mdm_state_dict, load_torch_checkpoint
    from mdm_tpu.utils.factory import get_model_config

    a = dict(run_args)
    njoints = 263 if a.get("dataset", "humanml") == "humanml" else 251
    ref = RefMDM(
        modeltype="", njoints=njoints, nfeats=1, num_actions=1, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True,
        latent_dim=a["latent_dim"], ff_size=1024, num_layers=a["layers"],
        num_heads=4, dropout=0.1, data_rep="hml_vec", cond_mode="text",
        cond_mask_prob=a.get("cond_mask_prob", 0.1), arch=a.get("arch", "trans_enc"),
        emb_trans_dec=a.get("emb_trans_dec", False), clip_version="ViT-B/32",
        dataset=a.get("dataset", "humanml"),
        text_encoder_type=a.get("text_encoder_type", "clip"),
    )
    sd_raw = load_torch_checkpoint(CKPT, use_ema=False)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd_raw.items()}, strict=False
    )
    # reference load_model_wo_clip tolerance: only clip/PE keys may be missing
    assert all(k.startswith("clip_model.") or k.endswith(".pe") for k in missing)
    ref.eval()

    ns = types.SimpleNamespace(**{**a, "dataset": a.get("dataset", "humanml")})
    cfg = get_model_config(ns)
    params = convert_mdm_state_dict(sd_raw, cfg)

    B, T = 2, 60
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, njoints)).astype(np.float32)
    t = np.array([10, 40])
    emb = rng.normal(size=(B, 512)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(np.transpose(x, (0, 2, 1))[:, :, None]),
            torch.from_numpy(t),
            {"text_embed": torch.from_numpy(emb),
             "mask": torch.ones(B, 1, 1, T, dtype=torch.bool)},
        ).numpy()
    out = MDM(cfg).apply(
        params, jnp.asarray(x), jnp.asarray(t),
        Conditioning(frames_mask=jnp.ones((B, T), bool), text_embed=jnp.asarray(emb)),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(out_ref[:, :, 0], (0, 2, 1)), atol=2e-4
    )


def test_sample_from_real_checkpoint(run_args):
    """Converted real weights produce finite, non-degenerate motions."""
    import types

    from mdm_tpu.diffusion import Schedule
    from mdm_tpu.models import MDM, Conditioning
    from mdm_tpu.models.convert import convert_mdm_state_dict, load_torch_checkpoint
    from mdm_tpu.sampling import GenerationConfig, MotionGenerator
    from mdm_tpu.utils.factory import get_model_config

    a = dict(run_args)
    ns = types.SimpleNamespace(**a)
    cfg = get_model_config(ns)
    sd = load_torch_checkpoint(CKPT, use_ema=True)
    params = convert_mdm_state_dict(sd, cfg)
    sched = Schedule.create(
        a.get("noise_schedule", "cosine"), a.get("diffusion_steps", 1000),
        timestep_respacing="20",
    )
    gen = MotionGenerator(
        MDM(cfg), params, sched, GenerationConfig(guidance_scale=2.5),
        a.get("dataset", "humanml"),
    )
    B, T = 2, 60
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.zeros((B, 512), jnp.float32),
    )
    out = gen.generate(cond, B, T, jax.random.PRNGKey(0))
    joints = np.asarray(out["joints"])
    assert np.isfinite(joints).all()
    assert joints.std() > 1e-3  # not collapsed
