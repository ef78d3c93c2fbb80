"""Oracle tests for the T2M (Guo et al.) baseline generator port.

Reference: CompTrainerV6.generate (trainers.py:382-451) built from
modules.py:123-310, i.e. the `CompV6GeneratedDataset` generation path
(comp_v6_model_dataset.py:53-121). Random torch weights are converted and
both sides run the same inputs; noise is disabled on both sides (the torch
`reparameterize` is patched to return mu, ours gets eps=0).
"""
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mdm_tpu.eval import t2m_generator as G

# Tiny config (structure of Comp_v6_KLD01, scaled down).
DIM_WORD, DIM_POS = 30, 15
TEXT_HIDDEN = 16           # text_size = 32
DIM_ATT, DIM_Z = 24, 8
PRI_HIDDEN = DEC_HIDDEN = 20
MOV_LATENT = 12
DIM_POSE = 11              # mov enc/dec run on dim_pose - 4 = 7
UNIT = 4
SEQ_LEN = 10


def _stub_spacy():
    import importlib.machinery
    import sys
    import types

    if "spacy" not in sys.modules:
        m = types.ModuleType("spacy")
        # real ModuleSpec so later importlib.util.find_spec probes (e.g.
        # transformers checking for optional spacy) don't crash on the stub
        m.__spec__ = importlib.machinery.ModuleSpec("spacy", None)
        sys.modules["spacy"] = m


@pytest.fixture(scope="module")
def ref_mods(reference_path):
    _stub_spacy()
    import data_loaders.humanml.networks.modules as modules
    from data_loaders.humanml.networks.trainers import CompTrainerV6

    return modules, CompTrainerV6


@pytest.fixture(scope="module")
def models(ref_mods):
    modules, CompTrainerV6 = ref_mods
    torch.manual_seed(0)
    text_size = TEXT_HIDDEN * 2
    text_enc = modules.TextEncoderBiGRU(DIM_WORD, DIM_POS, TEXT_HIDDEN, "cpu")
    seq_pri = modules.TextDecoder(text_size, DIM_ATT + MOV_LATENT, DIM_Z,
                                  PRI_HIDDEN, 1)
    seq_dec = modules.TextVAEDecoder(text_size, DIM_ATT + DIM_Z + MOV_LATENT,
                                     MOV_LATENT, DEC_HIDDEN, 1)
    att = modules.AttLayer(DEC_HIDDEN, text_size, DIM_ATT)
    mov_enc = modules.MovementConvEncoder(DIM_POSE - 4, 18, MOV_LATENT)
    mov_dec = modules.MovementConvDecoder(MOV_LATENT, 18, DIM_POSE)
    for m in (text_enc, seq_pri, seq_dec, att, mov_enc, mov_dec):
        m.eval()

    opt = types.SimpleNamespace(is_train=False, device="cpu",
                                unit_length=UNIT, text_enc_mod="bigru")
    trainer = CompTrainerV6(opt, text_enc, seq_pri, seq_dec, att, mov_dec,
                            mov_enc=mov_enc)

    params = G.convert_comp_v6({
        "text_enc": text_enc.state_dict(),
        "seq_pri": seq_pri.state_dict(),
        "seq_dec": seq_dec.state_dict(),
        "att_layer": att.state_dict(),
        "mov_enc": mov_enc.state_dict(),
        "mov_dec": mov_dec.state_dict(),
    })
    return trainer, modules, params


def _inputs(rng, B, cap_lens):
    word = rng.normal(size=(B, SEQ_LEN, DIM_WORD)).astype(np.float32)
    pos = rng.normal(size=(B, SEQ_LEN, DIM_POS)).astype(np.float32)
    return word, pos, np.asarray(cap_lens, np.int64)


class TestSubmodules:
    def test_text_encoder_bigru(self, models):
        trainer, _, params = models
        rng = np.random.default_rng(1)
        # torch pack_padded_sequence requires descending lengths
        word, pos, lens = _inputs(rng, 3, [9, 6, 4])
        with torch.no_grad():
            ref_seq, ref_last = trainer.text_enc(
                torch.from_numpy(word), torch.from_numpy(pos),
                torch.from_numpy(lens))
        seq, last = G.text_encoder_bigru(
            params["text_enc"], jnp.asarray(word), jnp.asarray(pos),
            jnp.asarray(lens, jnp.int32))
        # pad_packed output is truncated to max(cap_lens)
        L = ref_seq.shape[1]
        np.testing.assert_allclose(np.asarray(seq)[:, :L], ref_seq.numpy(),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(last), ref_last.numpy(), atol=2e-5)
        # padding positions must be exactly zero (AttLayer has no mask)
        assert np.all(np.asarray(seq)[1, 6:] == 0)

    def test_movement_conv_decoder(self, models):
        trainer, _, params = models
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 6, MOV_LATENT)).astype(np.float32)
        with torch.no_grad():
            ref = trainer.mov_dec(torch.from_numpy(x)).numpy()
        out = G.movement_conv_decoder(params["mov_dec"], jnp.asarray(x))
        assert out.shape == (2, 24, DIM_POSE)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    def test_movement_conv_encoder(self, models):
        trainer, _, params = models
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 8, DIM_POSE - 4)).astype(np.float32)
        with torch.no_grad():
            ref = trainer.mov_enc(torch.from_numpy(x)).numpy()
        out = G.movement_conv_encoder(params["mov_enc"], jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    def test_att_layer(self, models):
        trainer, _, params = models
        rng = np.random.default_rng(4)
        q = rng.normal(size=(3, DEC_HIDDEN)).astype(np.float32)
        k = rng.normal(size=(3, SEQ_LEN, TEXT_HIDDEN * 2)).astype(np.float32)
        with torch.no_grad():
            ref_v, ref_w = trainer.att_layer(torch.from_numpy(q), torch.from_numpy(k))
        v, w = G.att_layer(params["att_layer"], jnp.asarray(q), jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(v), ref_v.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(w)[..., None], ref_w.numpy(), atol=2e-5)


class TestFullGenerate:
    def _ref_generate(self, models, monkeypatch, word, pos, lens, m_lens):
        trainer, modules, _ = models
        monkeypatch.setattr(modules, "reparameterize", lambda mu, logvar: mu)
        with torch.no_grad():
            motions, _, _ = trainer.generate(
                torch.from_numpy(word), torch.from_numpy(pos),
                torch.from_numpy(lens), torch.from_numpy(m_lens),
                int(m_lens[0]) // UNIT, DIM_POSE)
        return motions.numpy()

    def test_single_sample_parity(self, models, monkeypatch):
        _, _, params = models
        rng = np.random.default_rng(5)
        word, pos, lens = _inputs(rng, 1, [7])
        m_lens = np.asarray([20], np.int64)  # 5 movement steps
        ref = self._ref_generate(models, monkeypatch, word, pos, lens, m_lens)
        out = G.t2m_generate(
            params, jnp.asarray(word), jnp.asarray(pos),
            jnp.asarray(lens, jnp.int32), jnp.asarray(m_lens, jnp.int32),
            mov_len=5, unit_length=UNIT, dim_pose=DIM_POSE)
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)

    def test_batched_equals_per_sample_runs(self, models, monkeypatch):
        """Batched fixed-mov_len generation must reproduce the reference's
        per-sample exact-length runs bit-closely on every valid frame."""
        _, _, params = models
        rng = np.random.default_rng(6)
        word, pos, lens = _inputs(rng, 3, [9, 5, 3])
        m_lens = np.asarray([24, 12, 8], np.int64)

        out = G.t2m_generate(
            params, jnp.asarray(word), jnp.asarray(pos),
            jnp.asarray(lens, jnp.int32), jnp.asarray(m_lens, jnp.int32),
            mov_len=6, unit_length=UNIT, dim_pose=DIM_POSE)
        out = np.asarray(out)
        assert out.shape == (3, 24, DIM_POSE)

        for i in range(3):
            ref = self._ref_generate(
                models, monkeypatch, word[i:i + 1], pos[i:i + 1],
                lens[i:i + 1], m_lens[i:i + 1])
            L = int(m_lens[i])
            np.testing.assert_allclose(out[i, :L], ref[0, :L], atol=5e-5)
            assert np.all(out[i, L:] == 0)  # frames beyond m_len zeroed

    def test_length_sampling_retry_rule(self):
        # Peaked below min: 3 draws then accept whatever came third.
        rng = np.random.default_rng(0)
        p = np.zeros(20)
        p[2] = 1.0  # always draws 2 < min 10
        lens = G.sample_movement_lengths(np.tile(p, (5, 1)), rng, min_mov_length=10)
        np.testing.assert_array_equal(lens, 2)
        # Mass above min: accepted immediately.
        p2 = np.zeros(20)
        p2[15] = 1.0
        lens = G.sample_movement_lengths(np.tile(p2, (5, 1)), rng, min_mov_length=10)
        np.testing.assert_array_equal(lens, 15)

    def test_baseline_loaders(self, models, ref_mods):
        """T2MBaselineLoader / MM variant yield harness-ready batches."""
        _, _, params = models
        modules, _ = ref_mods
        from mdm_tpu.eval.networks import convert_len_estimator

        torch.manual_seed(1)
        est = modules.MotionLenEstimatorBiGRU(DIM_WORD, DIM_POS, 16, 8).eval()
        len_params = convert_len_estimator(est.state_dict())

        rng = np.random.default_rng(8)
        B = 4
        gt_batches = [{
            "word_embeddings": rng.normal(size=(B, SEQ_LEN, DIM_WORD)).astype(np.float32),
            "pos_one_hots": rng.normal(size=(B, SEQ_LEN, DIM_POS)).astype(np.float32),
            "sent_lens": np.asarray([9, 7, 5, 3], np.int32),
            "lengths": np.asarray([20, 16, 12, 8], np.int32),
        } for _ in range(2)]

        gen = G.T2MBaselineGenerator(
            params, len_params, unit_length=UNIT,
            dim_pose=DIM_POSE, max_motion_length=24, min_mov_length=2,
            len_est_kwargs=dict(word_size=DIM_WORD, pos_size=DIM_POS,
                                hidden_size=16, output_size=8, nd=512),
        )
        batches = list(G.T2MBaselineLoader(gen, gt_batches, seed=0))
        assert len(batches) == 2
        for b in batches:
            assert b["x"].shape == (B, 24, DIM_POSE)
            assert np.isfinite(b["x"]).all()
            assert (b["lengths"] % UNIT == 0).all() and (b["lengths"] > 0).all()
            for i in range(B):  # frames beyond sampled length zeroed
                assert np.all(b["x"][i, b["lengths"][i]:] == 0)
            assert "word_embeddings" in b  # matching metrics need text feats
        # Deterministic in seed
        again = list(G.T2MBaselineLoader(gen, gt_batches, seed=0))
        np.testing.assert_array_equal(batches[0]["x"], again[0]["x"])

        mm = list(G.T2MBaselineMMLoader(
            gen, gt_batches, seed=0, mm_num_samples=2, mm_num_repeats=3))
        assert len(mm) == 2
        assert mm[0]["x"].shape == (3, 24, DIM_POSE)
        # repeats differ (per-repeat noise)
        assert not np.allclose(mm[0]["x"][0], mm[0]["x"][1])

    def test_jit_and_noise_path(self, models):
        _, _, params = models
        rng = np.random.default_rng(7)
        word, pos, lens = _inputs(rng, 2, [8, 4])
        m_lens = np.asarray([16, 8], np.int32)
        fn = jax.jit(lambda eps: G.t2m_generate(
            params, jnp.asarray(word), jnp.asarray(pos),
            jnp.asarray(lens, jnp.int32), jnp.asarray(m_lens),
            mov_len=4, eps=eps, unit_length=UNIT, dim_pose=DIM_POSE))
        eps = jax.random.normal(jax.random.PRNGKey(0), (4, 2, DIM_Z))
        a = fn(eps)
        b = fn(jnp.zeros_like(eps))
        assert np.isfinite(np.asarray(a)).all()
        assert not np.allclose(np.asarray(a), np.asarray(b))  # noise matters


class TestMultiLayerQuirk:
    def test_prior_feeds_same_input_to_every_layer(self, ref_mods):
        """modules.py:225-227: TextDecoder passes the SAME embedded input to
        every GRUCell (no chaining), unlike TextVAEDecoder. Pin the quirk at
        n_layers=2 (the published config uses 1, where both styles agree)."""
        modules, _ = ref_mods
        torch.manual_seed(3)
        text_size = 2 * TEXT_HIDDEN
        pri = modules.TextDecoder(text_size, DIM_ATT + MOV_LATENT, DIM_Z,
                                  PRI_HIDDEN, 2).eval()
        dec = modules.TextVAEDecoder(text_size, DIM_ATT + DIM_Z + MOV_LATENT,
                                     MOV_LATENT, DEC_HIDDEN, 2).eval()
        p_pri = G.convert_prior(pri.state_dict(), n_layers=2)
        p_dec = G.convert_vae_decoder(dec.state_dict(), n_layers=2)

        rng = np.random.default_rng(9)
        B = 3
        latent = rng.normal(size=(B, text_size)).astype(np.float32)
        pri_in = rng.normal(size=(B, DIM_ATT + MOV_LATENT)).astype(np.float32)
        dec_in = rng.normal(size=(B, DIM_ATT + DIM_Z + MOV_LATENT)).astype(np.float32)
        tta = np.asarray([5, 3, 1], np.int64)

        with torch.no_grad():
            h_pri = pri.get_init_hidden(torch.from_numpy(latent))
            modules.reparameterize, orig = (lambda mu, lv: mu), modules.reparameterize
            try:
                z, mu, lv, _ = pri(torch.from_numpy(pri_in), h_pri,
                                   torch.from_numpy(tta))
            finally:
                modules.reparameterize = orig
            h_dec = dec.get_init_hidden(torch.from_numpy(latent))
            mov, _ = dec(torch.from_numpy(dec_in), None, h_dec,
                         torch.from_numpy(tta))

        pe_pri = jnp.asarray(G.positional_table(PRI_HIDDEN))
        pe_dec = jnp.asarray(G.positional_table(DEC_HIDDEN))
        hp = G.init_hidden(p_pri, jnp.asarray(latent), 2)
        zj, muj, lvj, _ = G.prior_step(p_pri, pe_pri, jnp.asarray(pri_in), hp,
                                       jnp.asarray(tta, jnp.int32),
                                       jnp.zeros((B, DIM_Z)))
        np.testing.assert_allclose(np.asarray(muj), mu.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(lvj), lv.numpy(), atol=2e-5)
        hd = G.init_hidden(p_dec, jnp.asarray(latent), 2)
        movj, _ = G.vae_decoder_step(p_dec, pe_dec, jnp.asarray(dec_in), hd,
                                     jnp.asarray(tta, jnp.int32))
        np.testing.assert_allclose(np.asarray(movj), mov.numpy(), atol=2e-5)
