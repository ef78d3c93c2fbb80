"""End-to-end golden test: reference torch MDM + reference DDIM loop vs
converted Flax MDM + our scan sampler — identical deterministic outputs.

This is the integration guarantee that a user switching from the reference
gets the same motions (up to float noise) from published checkpoints.
"""
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.diffusion import SamplerConfig, Schedule, ddim_sample_loop
from mdm_tpu.models import Conditioning, MDM, MDMConfig, cfg_denoiser
from mdm_tpu.models.convert import convert_mdm_state_dict

RNG = np.random.default_rng(71)


@pytest.fixture(scope="module")
def ref_env(reference_path):
    import torch.nn as nn

    clip_stub = types.ModuleType("clip")
    clip_stub.load = lambda *a, **k: (nn.Linear(1, 1), None)
    clip_stub.model = types.SimpleNamespace(convert_weights=lambda m: None)
    clip_stub.tokenize = lambda *a, **k: None
    sys.modules.setdefault("clip", clip_stub)

    rot_stub = types.ModuleType("model.rotation2xyz")

    class _FakeSMPL:
        def _apply(self, fn):
            return self

        def train(self, *a, **k):
            return self

    class Rotation2xyz:
        def __init__(self, *a, **k):
            self.smpl_model = _FakeSMPL()

    rot_stub.Rotation2xyz = Rotation2xyz
    sys.modules["model.rotation2xyz"] = rot_stub

    from model.mdm import MDM as RefMDM
    import diffusion.gaussian_diffusion as gd
    from diffusion.respace import SpacedDiffusion, space_timesteps as ref_space

    return RefMDM, gd, SpacedDiffusion, ref_space


def test_ddim_pipeline_parity(ref_env):
    import torch

    RefMDM, gd, SpacedDiffusion, ref_space = ref_env
    torch.manual_seed(0)
    d = 32
    ref_model = RefMDM(
        modeltype="", njoints=26, nfeats=1, num_actions=1, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=d, ff_size=64,
        num_layers=2, num_heads=4, dropout=0.0, data_rep="hml_vec",
        cond_mode="text", cond_mask_prob=0.1, arch="trans_enc",
        emb_trans_dec=False, clip_version="x", dataset="humanml",
        text_encoder_type="clip",
    )
    ref_model.eval()

    # Reference diffusion: cosine 100 steps respaced to 10, DDIM eta=0.
    betas = gd.get_named_beta_schedule("cosine", 100)
    ref_diff = SpacedDiffusion(
        use_timesteps=ref_space(100, "10"), betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
    )

    B, T, D = 2, 16, 26
    noise = RNG.normal(size=(B, T, D)).astype(np.float32)
    text_embed = RNG.normal(size=(B, 512)).astype(np.float32)
    guidance = 2.5

    # ---- reference side: CFG wrapper semantics inlined (two forwards).
    class RefCFG(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.model = m

        def forward(self, x, t, y=None):
            out = self.model(x, t, dict(y))
            y_un = dict(y)
            y_un["uncond"] = True
            out_un = self.model(x, t, y_un)
            return out_un + guidance * (out - out_un)

    y = {
        "text_embed": torch.from_numpy(text_embed).unsqueeze(0),
        "mask": torch.ones(B, 1, 1, T, dtype=torch.bool),
    }
    noise_ref = torch.from_numpy(noise.transpose(0, 2, 1)[:, :, None, :])
    with torch.no_grad():
        theirs = ref_diff.ddim_sample_loop(
            RefCFG(ref_model), (B, D, 1, T), noise=noise_ref,
            clip_denoised=False, model_kwargs={"y": y}, eta=0.0, device="cpu",
        ).numpy()[:, :, 0].transpose(0, 2, 1)

    # ---- our side: converted weights + fused CFG + scan sampler.
    cfg = MDMConfig(njoints=26, nfeats=1, latent_dim=d, ff_size=64,
                    num_layers=2, num_heads=4, dropout=0.0, arch="trans_enc")
    model = MDM(cfg)
    params = convert_mdm_state_dict(
        {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}, cfg
    )
    sched = Schedule.create("cosine", 100, timestep_respacing="10")
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool), text_embed=jnp.asarray(text_embed)
    )
    fn = cfg_denoiser(lambda p, x, t, c: model.apply(p, x, t, c), params, guidance)
    ours = ddim_sample_loop(
        lambda x, t: fn(x, t, cond), sched, jnp.asarray(noise),
        jax.random.PRNGKey(0), SamplerConfig(clip_denoised=False),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)
