"""Flagship-scale end-to-end sampling parity vs the reference.

test_end_to_end_parity.py proves composed-pipeline identity at a 2-layer
d=32 toy; these tests run the PUBLISHED config — 512-d / 8-layer trans_enc,
cosine 1000 steps respaced to 50, CFG guidance 2.5 (reference README
flagship `humanml-encoder-512-50steps`) — through converted weights for
both DDPM (matched per-step noise) and DDIM, plus the DiP path (trans_dec
+ 20/40 prefix completion, 10 steps, guidance 7.5) against the reference
`AutoRegressiveSampler` (utils/sampler_util.py:41-81). This is the
strongest quality-parity statement available without the released
checkpoints: float drift across the full-size 50-step loop is bounded
here, so converted real weights traverse an identical pipeline.
"""
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.diffusion import (
    SamplerConfig,
    Schedule,
    ddim_sample_loop,
    p_sample_loop,
)
from mdm_tpu.models import Conditioning, MDM, MDMConfig, cfg_denoiser
from mdm_tpu.models.convert import convert_mdm_state_dict

RNG = np.random.default_rng(11)

FLAGSHIP = dict(latent_dim=512, ff_size=1024, num_layers=8, num_heads=4)
GUIDANCE = 2.5


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


def build_flagship(ref_mdm_cls, arch="trans_enc", njoints=263, **extra):
    import torch

    torch.manual_seed(3)
    ref = ref_mdm_cls(
        modeltype="", njoints=njoints, nfeats=1, num_actions=1,
        translation=True, pose_rep="rot6d", glob=True, glob_rot=True,
        ff_size=FLAGSHIP["ff_size"], latent_dim=FLAGSHIP["latent_dim"],
        num_layers=FLAGSHIP["num_layers"], num_heads=FLAGSHIP["num_heads"],
        dropout=0.0, data_rep="hml_vec", cond_mode="text",
        cond_mask_prob=0.1, arch=arch, emb_trans_dec=False,
        clip_version="ViT-B/32", dataset="humanml",
        text_encoder_type="clip", **extra,
    )
    ref.eval()
    cfg = MDMConfig(
        njoints=njoints, nfeats=1, dropout=0.0, data_rep="hml_vec",
        arch=arch, cond_mode="text", text_dim=512, **FLAGSHIP,
        **{k: v for k, v in extra.items() if k in MDMConfig.__dataclass_fields__},
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_mdm_state_dict(sd, cfg)
    return ref, MDM(cfg), params


class _RefCFG:
    """Reference ClassifierFreeSampleModel semantics (sampler_util.py:27-34)."""

    def __init__(self, m, scale):
        self.model = m
        self.scale = scale

    def __call__(self, x, t, y=None):
        out = self.model(x, t, dict(y))
        y_un = dict(y)
        y_un["uncond"] = True
        out_un = self.model(x, t, y_un)
        return out_un + self.scale * (out - out_un)

    def __getattr__(self, name):
        return getattr(self.__dict__["model"], name)


def _make_ref_diffusion(gd, SpacedDiffusion, ref_space, steps=1000, respace="50"):
    betas = gd.get_named_beta_schedule("cosine", steps)
    return SpacedDiffusion(
        use_timesteps=ref_space(steps, respace), betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
    )


@pytest.fixture(scope="module")
def flagship_pair(ref_env):
    RefMDM = ref_env[0]
    return build_flagship(RefMDM)


def _flagship_inputs(B, T, D):
    noise = RNG.normal(size=(B, T, D)).astype(np.float32)
    text_embed = RNG.normal(size=(B, 512)).astype(np.float32)
    return noise, text_embed


@pytest.mark.slow
def test_flagship_ddim_50step_parity(ref_env, flagship_pair):
    import torch

    _, gd, SpacedDiffusion, ref_space = ref_env
    ref_model, model, params = flagship_pair
    ref_diff = _make_ref_diffusion(gd, SpacedDiffusion, ref_space)

    B, T, D = 1, 196, 263
    noise, text_embed = _flagship_inputs(B, T, D)

    y = {
        "text_embed": torch.from_numpy(text_embed).unsqueeze(0),
        "mask": torch.ones(B, 1, 1, T, dtype=torch.bool),
    }
    noise_ref = torch.from_numpy(noise.transpose(0, 2, 1)[:, :, None, :])
    with torch.no_grad():
        theirs = ref_diff.ddim_sample_loop(
            _RefCFG(ref_model, GUIDANCE), (B, D, 1, T), noise=noise_ref,
            clip_denoised=False, model_kwargs={"y": y}, eta=0.0, device="cpu",
        ).numpy()[:, :, 0].transpose(0, 2, 1)

    sched = Schedule.create("cosine", 1000, timestep_respacing="50")
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool), text_embed=jnp.asarray(text_embed)
    )
    fn = cfg_denoiser(lambda p, x, t, c: model.apply(p, x, t, c), params, GUIDANCE)
    ours = np.asarray(
        ddim_sample_loop(
            lambda x, t: fn(x, t, cond), sched, jnp.asarray(noise),
            jax.random.PRNGKey(0), SamplerConfig(clip_denoised=False),
        )
    )
    drift = np.abs(ours - theirs).max()
    print(f"flagship ddim 50-step max drift: {drift:.2e}")
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.slow
def test_flagship_ddpm_50step_parity(ref_env, flagship_pair, monkeypatch):
    """Ancestral sampling with IDENTICAL per-step transition noise on both
    sides: th.randn_like is replaced by a queue of pre-drawn noises and our
    scan consumes the same array via `step_noise`."""
    import torch

    _, gd, SpacedDiffusion, ref_space = ref_env
    ref_model, model, params = flagship_pair
    ref_diff = _make_ref_diffusion(gd, SpacedDiffusion, ref_space)

    B, T, D = 1, 196, 263
    noise, text_embed = _flagship_inputs(B, T, D)
    steps = 50
    step_noise = RNG.normal(size=(steps, B, T, D)).astype(np.float32)

    queue = [
        torch.from_numpy(step_noise[s].transpose(0, 2, 1)[:, :, None, :])
        for s in range(steps)
    ]

    def fake_randn_like(x):
        assert queue, "reference drew more noises than the 50 steps"
        n = queue.pop(0)
        assert n.shape == x.shape
        return n

    monkeypatch.setattr(gd.th, "randn_like", fake_randn_like)

    y = {
        "text_embed": torch.from_numpy(text_embed).unsqueeze(0),
        "mask": torch.ones(B, 1, 1, T, dtype=torch.bool),
    }
    noise_ref = torch.from_numpy(noise.transpose(0, 2, 1)[:, :, None, :])
    with torch.no_grad():
        theirs = ref_diff.p_sample_loop(
            _RefCFG(ref_model, GUIDANCE), (B, D, 1, T), noise=noise_ref,
            clip_denoised=False, model_kwargs={"y": y}, device="cpu",
        ).numpy()[:, :, 0].transpose(0, 2, 1)
    assert not queue, "reference consumed fewer noises than expected"

    sched = Schedule.create("cosine", 1000, timestep_respacing="50")
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool), text_embed=jnp.asarray(text_embed)
    )
    fn = cfg_denoiser(lambda p, x, t, c: model.apply(p, x, t, c), params, GUIDANCE)
    ours = np.asarray(
        p_sample_loop(
            lambda x, t: fn(x, t, cond), sched, jnp.asarray(noise),
            jax.random.PRNGKey(0), SamplerConfig(clip_denoised=False),
            step_noise=jnp.asarray(step_noise),
        )
    )
    drift = np.abs(ours - theirs).max()
    print(f"flagship ddpm 50-step max drift: {drift:.2e}")
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.slow
def test_dip_autoregressive_parity(ref_env):
    """DiP: trans_dec + 20-frame context / 40-frame prediction, 10 steps,
    guidance 7.5, 196 required frames (5 chunks) — reference
    AutoRegressiveSampler host loop vs our single-scan AR sampler. DDIM
    eta=0 keeps the loop deterministic; the per-chunk init noise is pinned
    equal on both sides (the reference reuses kargs['noise'] every chunk,
    ours via `chunk_noise`)."""
    import torch

    RefMDM, gd, SpacedDiffusion, ref_space = ref_env
    ctx, pred, steps, guidance = 20, 40, 10, 7.5
    ref_model, model, params = build_flagship(
        RefMDM, arch="trans_dec", context_len=ctx, pred_len=pred
    )
    ref_diff = _make_ref_diffusion(gd, SpacedDiffusion, ref_space, respace="10")

    B, D, req = 1, 263, 196
    n_iters = (req // pred) + int(req % pred > 0)
    chunk_noise0 = RNG.normal(size=(B, pred, D)).astype(np.float32)
    prefix = RNG.normal(size=(B, ctx, D)).astype(np.float32)
    text_embed = RNG.normal(size=(B, 512)).astype(np.float32)

    # ---- reference: AutoRegressiveSampler over ddim_sample_loop
    from utils.sampler_util import AutoRegressiveSampler

    args = types.SimpleNamespace(
        pred_len=pred, context_len=ctx, autoregressive_include_prefix=False
    )

    def sample_fn(mdl, shape, **kargs):
        return ref_diff.ddim_sample_loop(mdl, tuple(shape), eta=0.0, **kargs)

    ar = AutoRegressiveSampler(args, sample_fn, required_frames=req)
    y = {
        "text_embed": torch.from_numpy(text_embed).unsqueeze(0),
        "mask": torch.ones(B, 1, 1, pred, dtype=torch.bool),
        "text": ["a person walks"] * B,
        "prefix": torch.from_numpy(prefix.transpose(0, 2, 1)[:, :, None, :]),
    }
    with torch.no_grad():
        theirs = ar.sample(
            _RefCFG(ref_model, guidance), (B, D, 1, pred),
            noise=torch.from_numpy(chunk_noise0.transpose(0, 2, 1)[:, :, None, :]),
            clip_denoised=False, model_kwargs={"y": y}, device="cpu",
        ).numpy()[:, :, 0].transpose(0, 2, 1)

    # ---- ours: one jitted scan over chunks
    from mdm_tpu.sampling import GenerationConfig, MotionGenerator

    sched = Schedule.create("cosine", 1000, timestep_respacing="10")
    gen = MotionGenerator(
        model, params, sched,
        GenerationConfig(
            guidance_scale=guidance, sampler="ddim", autoregressive=True,
            context_len=ctx, pred_len=pred,
        ),
        "humanml",
    )
    cond = Conditioning(
        frames_mask=jnp.ones((B, pred), bool),
        text_embed=jnp.asarray(text_embed),
        prefix=jnp.asarray(prefix),
    )
    ours = np.asarray(
        gen.sample_autoregressive(
            cond, B, jax.random.PRNGKey(0), required_frames=req,
            chunk_noise=jnp.broadcast_to(
                jnp.asarray(chunk_noise0), (n_iters,) + chunk_noise0.shape
            ),
        )
    )
    drift = np.abs(ours - theirs).max()
    print(f"DiP AR 10-step x5-chunk max drift: {drift:.2e}")
    assert ours.shape == theirs.shape == (B, req, D)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.slow
def test_flagship_training_loss_and_grad_parity(ref_env, flagship_pair):
    """Training-path parity at published scale: the reference's
    training_losses + torch autograd vs our loss fn + jax.grad through
    converted weights — per-sample losses AND parameter gradients agree.
    The sampling-side flagship tests bound forward drift; this bounds the
    backward pass (what 600k training steps actually accumulate)."""
    import torch

    from mdm_tpu.diffusion import gaussian as G
    from mdm_tpu.diffusion.losses import LossConfig, training_losses

    _, gd, SpacedDiffusion, ref_space = ref_env
    ref_model, model, params = flagship_pair
    ref_diff = _make_ref_diffusion(gd, SpacedDiffusion, ref_space,
                                   respace="1000")  # full process

    B, T, D = 2, 196, 263
    x_start = RNG.normal(size=(B, T, D)).astype(np.float32)
    noise = RNG.normal(size=(B, T, D)).astype(np.float32)
    text_embed = RNG.normal(size=(B, 512)).astype(np.float32)
    t = np.array([37, 811])

    # ---- reference: training_losses + autograd
    ref_model.train()
    ref_model.zero_grad()
    y = {
        "text_embed": torch.from_numpy(text_embed).unsqueeze(0),
        "mask": torch.ones(B, 1, 1, T, dtype=torch.bool),
    }
    x_ref = torch.from_numpy(x_start.transpose(0, 2, 1)[:, :, None, :])
    n_ref = torch.from_numpy(noise.transpose(0, 2, 1)[:, :, None, :])
    terms_ref = ref_diff.training_losses(
        ref_model, x_ref, torch.from_numpy(t), model_kwargs={"y": y},
        noise=n_ref,
    )
    loss_ref = terms_ref["loss"].mean()
    loss_ref.backward()
    g_ref = ref_model.input_process.poseEmbedding.weight.grad.numpy()

    # ---- ours: same q_sample + model forward + masked_l2 under jax.grad
    sched = Schedule.create("cosine", 1000)
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool), text_embed=jnp.asarray(text_embed)
    )
    xs = jnp.asarray(x_start)
    ns = jnp.asarray(noise)
    tj = jnp.asarray(t)
    x_t = G.q_sample(sched, xs, tj, ns)

    def loss_fn(p):
        out = model.apply(p, x_t, tj, cond)
        terms = training_losses(
            sched, out, xs, x_t, tj, ns,
            jnp.ones((B, T, 1), jnp.float32), LossConfig(),
        )
        return jnp.mean(terms["loss"]), terms

    (loss_ours, terms_ours), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(
        np.asarray(terms_ours["loss"]), terms_ref["loss"].detach().numpy(),
        rtol=1e-4,
    )
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), rtol=1e-4)
    # converted layout: ours [in, out] vs torch [out, in]
    g_ours = np.asarray(
        grads["params"]["input_process"]["poseEmbedding"]["kernel"]
    ).T
    drift = np.abs(g_ours - g_ref).max()
    print(f"flagship grad parity max drift: {drift:.2e} "
          f"(grad scale {np.abs(g_ref).max():.2e})")
    np.testing.assert_allclose(g_ours, g_ref, atol=2e-5)
