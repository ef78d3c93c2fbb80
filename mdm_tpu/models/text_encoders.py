"""Frozen text encoders: CLIP text tower and DistilBERT, in Flax.

The reference conditions MDM on either OpenAI CLIP ViT-B/32's pooled text
embedding (model/mdm.py:140-178) or DistilBERT token states
(model/BERT/BERT_encoder.py). Both towers are reimplemented here as Flax
modules with weight converters from (a) OpenAI `clip` checkpoints and
(b) HuggingFace torch checkpoints, so published MDM pipelines can be
reproduced without torch at runtime.

TPU notes: encoders run ONCE per batch (the embedding is cached in the
conditioning pytree and reused across all diffusion steps — the reference's
"2x speedup" trick, generate.py:130-132, is the only mode here). Shapes are
static: CLIP context is always 77; BERT token length is padded to a fixed
max.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import MultiHeadAttention


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# CLIP text tower (ViT-B/32 defaults: width 512, 12 layers, 8 heads, ctx 77)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    embed_dim: int = 512  # projection output


class ClipResBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, causal_bias):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        h = MultiHeadAttention(self.heads, self.width, name="attn")(
            h, h, h, attn_bias=causal_bias
        )
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name="c_proj")(h)
        return x + h


class ClipTextEncoder(nn.Module):
    """tokens [B, 77] int32 -> pooled embedding [B, embed_dim].

    Pooling follows CLIP: the hidden state at argmax(tokens) (the EOT token,
    which has the highest id) through the text projection. The reference's
    tokenize-to-22-then-zero-pad-to-77 trick (mdm.py:166-175) is upstream of
    this module and does not change the argmax.
    """

    config: ClipTextConfig = ClipTextConfig()

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B, L = tokens.shape
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.width)
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = tok_emb[tokens] + pos_emb[None, :L]

        causal = jnp.triu(jnp.full((L, L), -1e9, dtype=jnp.float32), k=1)[None, None]
        for i in range(cfg.layers):
            x = ClipResBlock(cfg.width, cfg.heads, name=f"resblocks_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)

        proj = self.param(
            "text_projection", nn.initializers.normal(0.02), (cfg.width, cfg.embed_dim)
        )
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(B), eot]
        return pooled @ proj


def _infer_layers(sd, prefix: str) -> int:
    """Transformer depth from numbered state-dict keys (prefix.<i>. ...)."""
    import re as _re

    idx = {int(m.group(1)) for k in sd
           if (m := _re.match(_re.escape(prefix) + r"(\d+)\.", k))}
    if not idx:
        raise KeyError(f"no layers found under {prefix!r}")
    return max(idx) + 1


def convert_openai_clip_text(sd: Mapping[str, np.ndarray], layers: int = 0) -> Dict:
    """OpenAI `clip` checkpoint (text tower keys) -> flax params.

    layers=0 infers the transformer depth from the state-dict keys."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    layers = layers or _infer_layers(sd, "transformer.resblocks.")
    t = lambda w: np.ascontiguousarray(w.T)
    params: Dict = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "text_projection": sd["text_projection"],
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        w = sd[f"{p}.attn.in_proj_weight"]
        b = sd[f"{p}.attn.in_proj_bias"]
        d = w.shape[1]
        params[f"resblocks_{i}"] = {
            "ln_1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
            "ln_2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
            "attn": {
                "q_proj": {"kernel": t(w[:d]), "bias": b[:d]},
                "k_proj": {"kernel": t(w[d : 2 * d]), "bias": b[d : 2 * d]},
                "v_proj": {"kernel": t(w[2 * d :]), "bias": b[2 * d :]},
                "out_proj": {"kernel": t(sd[f"{p}.attn.out_proj.weight"]),
                             "bias": sd[f"{p}.attn.out_proj.bias"]},
            },
            "c_fc": {"kernel": t(sd[f"{p}.mlp.c_fc.weight"]), "bias": sd[f"{p}.mlp.c_fc.bias"]},
            "c_proj": {"kernel": t(sd[f"{p}.mlp.c_proj.weight"]), "bias": sd[f"{p}.mlp.c_proj.bias"]},
        }
    return {"params": params}


def convert_hf_clip_text(sd: Mapping[str, np.ndarray], layers: int = 0) -> Dict:
    """HuggingFace CLIPTextModelWithProjection state_dict -> flax params.

    layers=0 infers the transformer depth from the state-dict keys."""
    sd = {k.removeprefix("text_model."): np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    layers = layers or _infer_layers(sd, "encoder.layers.")
    t = lambda w: np.ascontiguousarray(w.T)
    params: Dict = {
        "token_embedding": sd["embeddings.token_embedding.weight"],
        "positional_embedding": sd["embeddings.position_embedding.weight"],
        "text_projection": t(sd["text_projection.weight"]) if "text_projection.weight" in sd
        else np.eye(sd["final_layer_norm.weight"].shape[0], dtype=np.float32),
        "ln_final": {"scale": sd["final_layer_norm.weight"], "bias": sd["final_layer_norm.bias"]},
    }
    for i in range(layers):
        p = f"encoder.layers.{i}"
        params[f"resblocks_{i}"] = {
            "ln_1": {"scale": sd[f"{p}.layer_norm1.weight"], "bias": sd[f"{p}.layer_norm1.bias"]},
            "ln_2": {"scale": sd[f"{p}.layer_norm2.weight"], "bias": sd[f"{p}.layer_norm2.bias"]},
            "attn": {
                "q_proj": {"kernel": t(sd[f"{p}.self_attn.q_proj.weight"]), "bias": sd[f"{p}.self_attn.q_proj.bias"]},
                "k_proj": {"kernel": t(sd[f"{p}.self_attn.k_proj.weight"]), "bias": sd[f"{p}.self_attn.k_proj.bias"]},
                "v_proj": {"kernel": t(sd[f"{p}.self_attn.v_proj.weight"]), "bias": sd[f"{p}.self_attn.v_proj.bias"]},
                "out_proj": {"kernel": t(sd[f"{p}.self_attn.out_proj.weight"]), "bias": sd[f"{p}.self_attn.out_proj.bias"]},
            },
            "c_fc": {"kernel": t(sd[f"{p}.mlp.fc1.weight"]), "bias": sd[f"{p}.mlp.fc1.bias"]},
            "c_proj": {"kernel": t(sd[f"{p}.mlp.fc2.weight"]), "bias": sd[f"{p}.mlp.fc2.bias"]},
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# DistilBERT (6 layers, 768, post-LN, learned positions)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DistilBertConfig:
    vocab_size: int = 30522
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    max_position_embeddings: int = 512


class DistilBertLayer(nn.Module):
    dim: int
    n_heads: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x, attn_bias):
        h = MultiHeadAttention(self.n_heads, self.dim, name="attention")(
            x, x, x, attn_bias=attn_bias
        )
        x = nn.LayerNorm(epsilon=1e-12, name="sa_layer_norm")(x + h)
        h = nn.Dense(self.hidden_dim, name="ffn_lin1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="ffn_lin2")(h)
        return nn.LayerNorm(epsilon=1e-12, name="output_layer_norm")(x + h)


class DistilBertEncoder(nn.Module):
    """(tokens [B, L], attention_mask [B, L]) -> last hidden state [B, L, 768]."""

    config: DistilBertConfig = DistilBertConfig()

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B, L = tokens.shape
        word = self.param(
            "word_embeddings", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.dim)
        )
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.dim),
        )
        x = word[tokens] + pos[None, :L]
        x = nn.LayerNorm(epsilon=1e-12, name="emb_layer_norm")(x)

        bias = jnp.where(attention_mask[:, None, None, :], 0.0, -1e9)
        for i in range(cfg.n_layers):
            x = DistilBertLayer(cfg.dim, cfg.n_heads, cfg.hidden_dim, name=f"layer_{i}")(
                x, bias
            )
        return x


def convert_hf_distilbert(sd: Mapping[str, np.ndarray], layers: int = 0) -> Dict:
    """HuggingFace DistilBertModel state_dict -> flax params.

    layers=0 infers the transformer depth from the state-dict keys."""
    sd = {k.removeprefix("distilbert."): np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    layers = layers or _infer_layers(sd, "transformer.layer.")
    t = lambda w: np.ascontiguousarray(w.T)
    lin = lambda p: {"kernel": t(sd[f"{p}.weight"]), "bias": sd[f"{p}.bias"]}
    ln = lambda p: {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}
    params: Dict = {
        "word_embeddings": sd["embeddings.word_embeddings.weight"],
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "emb_layer_norm": ln("embeddings.LayerNorm"),
    }
    for i in range(layers):
        p = f"transformer.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "q_proj": lin(f"{p}.attention.q_lin"),
                "k_proj": lin(f"{p}.attention.k_lin"),
                "v_proj": lin(f"{p}.attention.v_lin"),
                "out_proj": lin(f"{p}.attention.out_lin"),
            },
            "sa_layer_norm": ln(f"{p}.sa_layer_norm"),
            "ffn_lin1": lin(f"{p}.ffn.lin1"),
            "ffn_lin2": lin(f"{p}.ffn.lin2"),
            "output_layer_norm": ln(f"{p}.output_layer_norm"),
        }
    return {"params": params}
