"""Tokenizers: CLIP BPE over a synthetic merges file, wordpiece over a
synthetic vocab (the real assets are downloads; the algorithms are tested
here, exact-vocab parity holds by construction of the file format)."""
import gzip

import numpy as np
import pytest

from mdm_tpu.data.tokenizers import ClipTokenizer, WordPieceTokenizer, bytes_to_unicode


@pytest.fixture()
def bpe_path(tmp_path):
    # Build a tiny merges file in the CLIP format: first line is a header,
    # then "a b" merge pairs over byte-unicode symbols.
    merges = [
        "#version tiny",
        "h e",
        "l l",
        "he ll",
        "hell o</w>",
        "w a",
        "wa l",
        "wal k</w>",
    ]
    p = tmp_path / "bpe.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(merges))
    return str(p)


class TestClipBPE:
    def test_encode_merges(self, bpe_path):
        tok = ClipTokenizer(bpe_path)
        ids = tok.encode("hello walk")
        # both words should have merged into single tokens present in vocab
        assert tok.decoder[ids[0]] == "hello</w>"
        assert tok.decoder[ids[1]] == "walk</w>"

    def test_tokenize_mdm_padding(self, bpe_path):
        tok = ClipTokenizer(bpe_path)
        out = tok.tokenize(["hello walk", "walk"], context_length=6, pad_to=77)
        assert out.shape == (2, 77)
        sot = tok.encoder["<|startoftext|>"]
        eot = tok.encoder["<|endoftext|>"]
        assert out[0, 0] == sot
        assert eot in out[0]
        # zero padding after EOT; argmax(token ids) is the EOT position
        assert out[0, 6:].sum() == 0
        assert out[0].argmax() == list(out[0]).index(eot)

    def test_truncation(self, bpe_path):
        tok = ClipTokenizer(bpe_path)
        out = tok.tokenize(["hello hello hello hello"], context_length=4)
        eot = tok.encoder["<|endoftext|>"]
        assert out[0, 3] == eot  # truncated, EOT forced at the end

    def test_byte_coverage(self):
        enc = bytes_to_unicode()
        assert len(enc) == 256
        assert len(set(enc.values())) == 256


class TestWordPiece:
    @pytest.fixture()
    def vocab_path(self, tmp_path):
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "person", "walk",
                 "##s", "##ing", "run", "."]
        p = tmp_path / "vocab.txt"
        p.write_text("\n".join(vocab))
        return str(p)

    def test_wordpiece_split(self, vocab_path):
        tok = WordPieceTokenizer(vocab_path)
        ids, mask = tok.tokenize(["a person walks."], max_len=10)
        toks = [ids[0, i] for i in range(mask[0].sum())]
        # [CLS] a person walk ##s . [SEP]
        assert toks[0] == tok.cls and toks[-1] == tok.sep
        assert tok.vocab["walk"] in toks and tok.vocab["##s"] in toks

    def test_unknown_word(self, vocab_path):
        tok = WordPieceTokenizer(vocab_path)
        ids, mask = tok.tokenize(["xylophone"], max_len=6)
        assert tok.unk in ids[0]

    def test_mask_and_padding(self, vocab_path):
        tok = WordPieceTokenizer(vocab_path)
        ids, mask = tok.tokenize(["run", "a person walks running now yes"], max_len=8)
        assert mask.shape == (2, 8)
        assert mask[0].sum() < mask[1].sum()
        assert (ids[0][~mask[0]] == tok.pad).all()
