"""Text-encoder parity vs randomly-initialized HuggingFace torch models."""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.models.text_encoders import (
    ClipTextConfig,
    ClipTextEncoder,
    DistilBertConfig,
    DistilBertEncoder,
    convert_hf_clip_text,
    convert_hf_distilbert,
)

RNG = np.random.default_rng(11)


def test_clip_text_parity_small():
    import torch
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModelWithProjection

    # OpenAI CLIP pools at argmax(token_ids) (EOT = highest vocab id); HF
    # pools at eos_token_id — align the two by making EOT the highest id.
    hf_cfg = HFCfg(
        vocab_size=1000, hidden_size=64, intermediate_size=256,
        num_hidden_layers=3, num_attention_heads=4, max_position_embeddings=77,
        projection_dim=64, hidden_act="quick_gelu", eos_token_id=999,
    )
    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    tokens = np.zeros((2, 77), dtype=np.int64)
    # mimic CLIP prompts: BOS ... EOT(highest id) then pad-0
    tokens[0, :5] = [999, 10, 20, 30, 998]
    tokens[1, :3] = [999, 50, 998]
    tokens[0, 4] = 999  # ensure argmax at EOT position equivalence
    tokens[0, :5] = [997, 10, 20, 30, 999]
    tokens[1, :3] = [997, 50, 999]

    with torch.no_grad():
        theirs = hf(
            input_ids=torch.from_numpy(tokens),
            attention_mask=torch.ones_like(torch.from_numpy(tokens)),
        ).text_embeds.numpy()

    cfg = ClipTextConfig(vocab_size=1000, width=64, layers=3, heads=4, embed_dim=64)
    params = convert_hf_clip_text(
        {k: v.numpy() for k, v in hf.state_dict().items()}, layers=3
    )
    ours = ClipTextEncoder(cfg).apply(params, jnp.asarray(tokens.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def test_clip_full_mask_path():
    """HF uses a causal mask plus pooling at EOT; verify our causal-only path
    matches when padding is all zeros after EOT (the MDM tokenization)."""
    # covered by test_clip_text_parity_small: tokens contain zero padding.
    assert True


def test_distilbert_parity_small():
    import torch
    from transformers import DistilBertConfig as HFCfg, DistilBertModel

    hf_cfg = HFCfg(
        vocab_size=500, dim=48, n_layers=2, n_heads=4, hidden_dim=96,
        max_position_embeddings=64,
    )
    torch.manual_seed(1)
    hf = DistilBertModel(hf_cfg).eval()

    tokens = RNG.integers(0, 500, size=(3, 10)).astype(np.int64)
    mask = np.ones((3, 10), dtype=np.int64)
    mask[1, 6:] = 0
    mask[2, 4:] = 0
    with torch.no_grad():
        theirs = hf(
            input_ids=torch.from_numpy(tokens),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    cfg = DistilBertConfig(vocab_size=500, dim=48, n_layers=2, n_heads=4,
                           hidden_dim=96, max_position_embeddings=64)
    params = convert_hf_distilbert(
        {k: v.numpy() for k, v in hf.state_dict().items()}, layers=2
    )
    ours = DistilBertEncoder(cfg).apply(
        params, jnp.asarray(tokens.astype(np.int32)), jnp.asarray(mask.astype(bool))
    )
    # Padded positions may differ (don't matter; MDM masks them); compare
    # valid positions only.
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(ours)[valid], theirs[valid], atol=2e-4
    )


def test_convert_text_encoders_cli(tmp_path):
    """cli.convert_text_encoders: HF .bin directories -> orbax flax assets
    (the prepare-time conversion flow for the frozen text towers)."""
    import torch
    from transformers import (
        CLIPTextConfig as HFCfg,
        CLIPTextModelWithProjection,
        DistilBertConfig,
        DistilBertModel,
    )

    from mdm_tpu.cli import convert_text_encoders as ct_cli

    torch.manual_seed(0)
    clip_dir = tmp_path / "clip_hf"
    clip_dir.mkdir()
    hf_clip = CLIPTextModelWithProjection(HFCfg(
        vocab_size=1000, hidden_size=64, intermediate_size=256,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=77, projection_dim=64,
        hidden_act="quick_gelu", eos_token_id=999,
    )).eval()
    torch.save(hf_clip.state_dict(), clip_dir / "pytorch_model.bin")

    bert_dir = tmp_path / "bert_hf"
    bert_dir.mkdir()
    hf_bert = DistilBertModel(DistilBertConfig(
        vocab_size=1000, dim=64, hidden_dim=256, n_layers=2, n_heads=4,
        max_position_embeddings=64,
    )).eval()
    torch.save(hf_bert.state_dict(), bert_dir / "pytorch_model.bin")

    out_dir = str(tmp_path / "assets")
    os.makedirs(out_dir)
    ct_cli.main(["--clip", str(clip_dir), "--bert", str(bert_dir),
                 "--out_dir", out_dir])
    import orbax.checkpoint as ocp

    clip_params = ocp.PyTreeCheckpointer().restore(
        os.path.join(out_dir, "clip_text_flax"))
    assert any("token_embedding" in k or "text_projection" in k
               for k in str(jax.tree_util.tree_structure(clip_params)).split("'"))
    bert_params = ocp.PyTreeCheckpointer().restore(
        os.path.join(out_dir, "distilbert_flax"))
    assert jax.tree_util.tree_leaves(bert_params)
