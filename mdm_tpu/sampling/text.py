"""Text -> conditioning embeddings (host tokenize, jitted frozen encoder).

The encoder runs ONCE per prompt batch; its output is cached in the
Conditioning pytree and reused by all diffusion steps and CFG branches
(reference's one-time-CLIP 2x trick, generate.py:130-132 — here it is the
only mode).

Assets (downloaded via prepare tooling, same contract as the reference):
- CLIP: converted flax weights (.npz/orbax) + bpe_simple_vocab_16e6.txt.gz
- BERT: converted flax weights + vocab.txt
When assets are missing, `make_text_embedder` returns None and callers fall
back to zero embeddings (dev/smoke mode).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np

DEFAULT_ASSETS = os.path.join(os.path.dirname(__file__), "..", "..", "assets", "text")

MAX_TEXT_LEN = 20  # humanml/kit hardcoded cap (reference mdm.py:166)


class ClipTextEmbedder:
    def __init__(self, params, bpe_path: str, config=None):
        import jax

        from ..models.text_encoders import ClipTextConfig, ClipTextEncoder
        from ..data.tokenizers import ClipTokenizer

        self.tokenizer = ClipTokenizer(bpe_path)
        self.encoder = ClipTextEncoder(config or ClipTextConfig())
        self.params = params
        self._encode = jax.jit(lambda tokens: self.encoder.apply(self.params, tokens))

    def __call__(self, texts: List[str]) -> Dict[str, np.ndarray]:
        tokens = self.tokenizer.tokenize(
            texts, context_length=MAX_TEXT_LEN + 2, pad_to=77
        )
        return {"text_embed": np.asarray(self._encode(tokens))}


class BertTextEmbedder:
    def __init__(self, params, vocab_path: str, config=None, max_len: int = 64):
        import jax

        from ..models.text_encoders import DistilBertConfig, DistilBertEncoder
        from ..data.tokenizers import WordPieceTokenizer

        self.tokenizer = WordPieceTokenizer(vocab_path)
        self.encoder = DistilBertEncoder(config or DistilBertConfig())
        self.params = params
        self.max_len = max_len
        self._encode = jax.jit(
            lambda tokens, mask: self.encoder.apply(self.params, tokens, mask)
        )

    def __call__(self, texts: List[str]) -> Dict[str, np.ndarray]:
        tokens, mask = self.tokenizer.tokenize(texts, self.max_len)
        hidden = np.asarray(self._encode(tokens, mask))
        return {"text_embed": hidden, "text_tokens_mask": mask}


class HashTextEmbedder:
    """Deterministic, asset-free text embedding (beyond-reference).

    Each lowercase word maps to a fixed pseudo-random 512-d vector seeded by
    a stable hash of the word; a caption embeds as the L2-normalized mean.
    NOT semantically meaningful — distinct captions get distinct, reusable
    embeddings, which is exactly what text-conditioned training needs when
    the CLIP/BERT assets are unavailable: smoke runs, integration
    rehearsals (scripts/synthetic_quality_rehearsal.py), and bootstrapping
    a new dataset before converting a real encoder. Stable across processes
    (zlib.crc32, not Python's randomized hash).
    """

    def __init__(self, dim: int = 512):
        self.dim = dim
        self._cache: Dict[str, np.ndarray] = {}

    def _word_vec(self, word: str) -> np.ndarray:
        v = self._cache.get(word)
        if v is None:
            import zlib

            rng = np.random.default_rng(zlib.crc32(word.encode()))
            v = rng.normal(size=self.dim).astype(np.float32)
            self._cache[word] = v
        return v

    def __call__(self, texts: List[str]) -> Dict[str, np.ndarray]:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            words = [w for w in "".join(
                c if c.isalnum() else " " for c in text.lower()).split() if w]
            if not words:
                continue
            emb = np.mean([self._word_vec(w) for w in words], axis=0)
            out[i] = emb / max(float(np.linalg.norm(emb)), 1e-8)
        return {"text_embed": out}


def make_text_embedder(
    encoder_type: str = "clip", assets_dir: Optional[str] = None
) -> Optional[Callable[[List[str]], Dict[str, np.ndarray]]]:
    """Build an embedder from converted-weight assets; None if absent."""
    assets_dir = assets_dir or DEFAULT_ASSETS
    if encoder_type == "hash":
        return HashTextEmbedder()
    try:
        import orbax.checkpoint as ocp

        if encoder_type == "clip":
            bpe = os.path.join(assets_dir, "bpe_simple_vocab_16e6.txt.gz")
            wpath = os.path.join(assets_dir, "clip_text_flax")
            if not (os.path.exists(bpe) and os.path.exists(wpath)):
                return None
            params = ocp.PyTreeCheckpointer().restore(os.path.abspath(wpath))
            return ClipTextEmbedder(params, bpe)
        if encoder_type == "bert":
            vocab = os.path.join(assets_dir, "bert_vocab.txt")
            wpath = os.path.join(assets_dir, "distilbert_flax")
            if not (os.path.exists(vocab) and os.path.exists(wpath)):
                return None
            params = ocp.PyTreeCheckpointer().restore(os.path.abspath(wpath))
            return BertTextEmbedder(params, vocab)
    except Exception as e:  # pragma: no cover - asset problems surface loudly
        print(f"text embedder unavailable ({e}); falling back to zero embeddings")
        return None
    raise ValueError(encoder_type)
