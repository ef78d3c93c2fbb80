"""Full-model parity: reference torch MDM forward vs converted Flax MDM.

Imports the REAL reference model/mdm.py with its unavailable deps (clip,
smplx-backed rotation2xyz) stubbed out, runs a forward with cached text
embeddings, converts the state_dict, and requires the Flax model to produce
the same output — the end-to-end guarantee behind published-checkpoint
loading.
"""
import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.models.convert import convert_mdm_state_dict

RNG = np.random.default_rng(51)


@pytest.fixture(scope="module")
def ref_mdm_cls(reference_path):
    import torch.nn as nn

    # Stub the reference's heavy deps before importing model.mdm.
    clip_stub = types.ModuleType("clip")

    def fake_load(version, device="cpu", jit=False):
        return nn.Linear(1, 1), None

    clip_stub.load = fake_load
    clip_stub.model = types.SimpleNamespace(convert_weights=lambda m: None)
    clip_stub.tokenize = lambda *a, **k: None
    sys.modules.setdefault("clip", clip_stub)

    rot_stub = types.ModuleType("model.rotation2xyz")

    class _FakeSMPL:
        def _apply(self, fn):
            return self

        def train(self, *a, **k):
            return self

        def eval(self):
            return self

    class Rotation2xyz:
        def __init__(self, *a, **k):
            self.smpl_model = _FakeSMPL()

    rot_stub.Rotation2xyz = Rotation2xyz
    sys.modules["model.rotation2xyz"] = rot_stub

    from model.mdm import MDM as RefMDM

    return RefMDM


def build_pair(ref_mdm_cls, arch="trans_enc", **extra):
    import torch

    torch.manual_seed(0)
    d = 32
    ref = ref_mdm_cls(
        modeltype="", njoints=26, nfeats=1, num_actions=1, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=d, ff_size=64,
        num_layers=2, num_heads=4, dropout=0.0, data_rep="hml_vec",
        cond_mode="text", cond_mask_prob=0.1, arch=arch, emb_trans_dec=False,
        clip_version="ViT-B/32", dataset="humanml",
        text_encoder_type="clip", **extra,
    )
    # reference MDM.train() override returns None, so .eval() can't chain
    ref.eval()

    cfg = MDMConfig(
        njoints=26, nfeats=1, latent_dim=d, ff_size=64, num_layers=2,
        num_heads=4, dropout=0.0, data_rep="hml_vec", arch=arch,
        cond_mode="text", text_dim=512,
        **{k: v for k, v in extra.items() if k in MDMConfig.__dataclass_fields__},
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_mdm_state_dict(sd, cfg)
    return ref, MDM(cfg), params


@pytest.mark.parametrize("arch", ["trans_enc", "trans_dec", "gru"])
def test_full_forward_parity(ref_mdm_cls, arch):
    import torch

    ref, ours, params = build_pair(ref_mdm_cls, arch=arch)
    B, T, D = 3, 14, 26
    x = RNG.normal(size=(B, T, D)).astype(np.float32)
    t = np.array([5, 100, 900])
    text_embed = RNG.normal(size=(B, 512)).astype(np.float32)

    with torch.no_grad():
        y = {
            "text_embed": torch.from_numpy(text_embed).unsqueeze(0),  # [1, B, 512]
            "mask": torch.ones(B, 1, 1, T, dtype=torch.bool),
        }
        # reference layout [B, njoints, nfeats, T]
        x_ref = torch.from_numpy(x.transpose(0, 2, 1)[:, :, None, :])
        out_ref = ref(x_ref, torch.from_numpy(t), y).numpy()  # [B, J, 1, T]
    theirs = out_ref[:, :, 0].transpose(0, 2, 1)  # -> [B, T, D]

    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.asarray(text_embed),
    )
    got = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(t), cond))
    np.testing.assert_allclose(got, theirs, atol=3e-5)


def test_prefix_completion_parity(ref_mdm_cls):
    import torch

    ctx, pred = 4, 10
    ref, ours, params = build_pair(
        ref_mdm_cls, arch="trans_enc", context_len=ctx, pred_len=pred
    )
    B, D = 2, 26
    x = RNG.normal(size=(B, pred, D)).astype(np.float32)
    prefix = RNG.normal(size=(B, ctx, D)).astype(np.float32)
    t = np.array([10, 20])
    text_embed = RNG.normal(size=(B, 512)).astype(np.float32)

    with torch.no_grad():
        y = {
            "text_embed": torch.from_numpy(text_embed).unsqueeze(0),
            "mask": torch.ones(B, 1, 1, pred, dtype=torch.bool),
            "prefix": torch.from_numpy(prefix.transpose(0, 2, 1)[:, :, None, :]),
        }
        x_ref = torch.from_numpy(x.transpose(0, 2, 1)[:, :, None, :])
        theirs = ref(x_ref, torch.from_numpy(t), y).numpy()[:, :, 0].transpose(0, 2, 1)

    cond = Conditioning(
        frames_mask=jnp.ones((B, pred), bool),
        text_embed=jnp.asarray(text_embed),
        prefix=jnp.asarray(prefix),
    )
    got = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(t), cond))
    np.testing.assert_allclose(got, theirs, atol=3e-5)


def test_load_torch_checkpoint_formats(tmp_path):
    """All three reference save formats load correctly."""
    import torch

    from mdm_tpu.models.convert import load_torch_checkpoint

    raw = {"embed_timestep.sequence_pos_encoder.pe": torch.zeros(3),
           "input_process.poseEmbedding.weight": torch.ones(2, 2)}
    torch.save(raw, tmp_path / "raw.pt")
    out = load_torch_checkpoint(str(tmp_path / "raw.pt"))
    assert "input_process.poseEmbedding.weight" in out

    wrapped = {"model": dict(raw), "model_avg": {
        "input_process.poseEmbedding.weight": torch.full((2, 2), 5.0)}}
    torch.save(wrapped, tmp_path / "w.pt")
    ema = load_torch_checkpoint(str(tmp_path / "w.pt"), use_ema=True)
    assert ema["input_process.poseEmbedding.weight"][0, 0] == 5.0
    noema = load_torch_checkpoint(str(tmp_path / "w.pt"), use_ema=False)
    assert noema["input_process.poseEmbedding.weight"][0, 0] == 1.0

    torch.save({"model": dict(raw)}, tmp_path / "m.pt")
    m = load_torch_checkpoint(str(tmp_path / "m.pt"), use_ema=True)
    assert m["input_process.poseEmbedding.weight"][0, 0] == 1.0


def test_convert_checkpoint_cli_then_generate(ref_mdm_cls, tmp_path):
    """cli.convert_checkpoint: published-format .pt -> orbax run dir that
    the generate CLI can sample from directly (the README conversion flow,
    reference utils/model_util.py:118-132 load-tolerance surface)."""
    import torch

    from mdm_tpu.cli import convert_checkpoint as conv_cli
    from mdm_tpu.cli import generate as gen_cli

    torch.manual_seed(1)
    d = 32
    ref = ref_mdm_cls(
        modeltype="", njoints=263, nfeats=1, num_actions=1, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=d, ff_size=64,
        num_layers=2, num_heads=4, dropout=0.1, data_rep="hml_vec",
        cond_mode="text", cond_mask_prob=0.1, arch="trans_enc",
        emb_trans_dec=False, clip_version="ViT-B/32", dataset="humanml",
        text_encoder_type="clip",
    )
    ref.eval()
    sd = ref.state_dict()
    pt_path = str(tmp_path / "model000000123.pt")
    # EMA dict format (training_loop.py:419-423)
    torch.save({"model": sd, "model_avg": sd}, pt_path)

    out_dir = str(tmp_path / "converted")
    conv_cli.main([
        "--torch_ckpt", pt_path, "--out_dir", out_dir,
        "--latent_dim", "32", "--layers", "2", "--ff_size", "64",
    ])
    assert os.path.exists(os.path.join(out_dir, "args.json"))
    ckpts = [f for f in os.listdir(out_dir) if f.startswith("ckpt_")]
    assert ckpts and ckpts[0].endswith("123")

    samples = str(tmp_path / "conv_samples")
    gen_cli.main([
        "--model_path", os.path.join(out_dir, ckpts[0]),
        "--text_prompt", "a person walks", "--num_samples", "1",
        "--num_repetitions", "1", "--motion_length", "1.0",
        "--output_dir", samples, "--seed", "7", "--ff_size", "64",
    ])
    results = np.load(os.path.join(samples, "results.npy"), allow_pickle=True).item()
    assert np.isfinite(results["motion"]).all()
