"""Oracle tests for CompV6 (T2M baseline generator) TRAINING.

Reference: CompTrainerV6.forward/backward_G/update and the scheduled-length
curriculum (trainers.py:211-746). Random torch weights are converted to our
layout; both sides run the same batch with noise disabled (torch
`reparameterize` patched to return mu, ours gets eps=0) and deterministic
teacher forcing (tf_ratio 1.0 / 0.0), then losses and gradients are
compared.
"""
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mdm_tpu.eval import t2m_generator as G
from mdm_tpu.eval import train_t2m_generator as TT

DIM_WORD, DIM_POS = 30, 15
TEXT_HIDDEN = 16
DIM_ATT, DIM_Z = 24, 8
PRI_HIDDEN = DEC_HIDDEN = 20
MOV_LATENT = 12
DIM_POSE = 11
UNIT = 4
SEQ_LEN = 10
MOV_LEN = 4                      # schedule_len: motions are MOV_LEN*UNIT frames

CFG = TT.CompV6TrainConfig(
    lr=1e-3, unit_length=UNIT, dim_pose=DIM_POSE, dim_word=DIM_WORD,
    dim_pos_ohot=DIM_POS, dim_text_hidden=TEXT_HIDDEN, dim_att_vec=DIM_ATT,
    dim_z=DIM_Z, dim_pri_hidden=PRI_HIDDEN, dim_dec_hidden=DEC_HIDDEN,
    dim_movement_latent=MOV_LATENT, dim_movement_hidden=18,
    lambda_rec_mov=1.0, lambda_rec_mot=1.0, lambda_kld=0.01,
)


def _stub_spacy():
    import importlib.machinery
    import sys

    if "spacy" not in sys.modules:
        m = types.ModuleType("spacy")
        m.__spec__ = importlib.machinery.ModuleSpec("spacy", None)
        sys.modules["spacy"] = m


@pytest.fixture(scope="module")
def ref(reference_path):
    _stub_spacy()
    import data_loaders.humanml.networks.modules as modules
    from data_loaders.humanml.networks.trainers import CompTrainerV6

    return modules, CompTrainerV6


@pytest.fixture()
def trainer_and_params(ref):
    """Reference trainer (is_train wiring done by hand to avoid the tf
    Logger) + converted params including the posterior."""
    modules, CompTrainerV6 = ref
    torch.manual_seed(7)
    text_size = TEXT_HIDDEN * 2
    text_enc = modules.TextEncoderBiGRU(DIM_WORD, DIM_POS, TEXT_HIDDEN, "cpu")
    seq_post = modules.TextDecoder(text_size, DIM_ATT + 2 * MOV_LATENT,
                                   DIM_Z, PRI_HIDDEN, 1)
    seq_pri = modules.TextDecoder(text_size, DIM_ATT + MOV_LATENT, DIM_Z,
                                  PRI_HIDDEN, 1)
    seq_dec = modules.TextVAEDecoder(text_size, DIM_ATT + DIM_Z + MOV_LATENT,
                                     MOV_LATENT, DEC_HIDDEN, 1)
    att = modules.AttLayer(DEC_HIDDEN, text_size, DIM_ATT)
    mov_enc = modules.MovementConvEncoder(DIM_POSE - 4, 18, MOV_LATENT)
    mov_dec = modules.MovementConvDecoder(MOV_LATENT, 18, DIM_POSE)
    # train_mode() keeps mov_enc in EVAL (trainers.py:530) — the only module
    # with a Dropout layer, so the whole training graph is deterministic.
    mov_enc.eval()

    opt = types.SimpleNamespace(
        is_train=False, device="cpu", unit_length=UNIT, text_enc_mod="bigru",
        lambda_rec_mov=CFG.lambda_rec_mov, lambda_rec_mot=CFG.lambda_rec_mot,
        lambda_kld=CFG.lambda_kld,
    )
    trainer = CompTrainerV6(opt, text_enc, seq_pri, seq_dec, att, mov_dec,
                            mov_enc=mov_enc)
    # is_train=True wiring minus the tensorboard Logger (trainers.py:223-230)
    trainer.seq_post = seq_post
    trainer.l1_criterion = torch.nn.SmoothL1Loss()

    params = G.convert_comp_v6({
        "text_enc": text_enc.state_dict(),
        "seq_pri": seq_pri.state_dict(),
        "seq_post": seq_post.state_dict(),
        "seq_dec": seq_dec.state_dict(),
        "att_layer": att.state_dict(),
        "mov_enc": mov_enc.state_dict(),
        "mov_dec": mov_dec.state_dict(),
    })
    return trainer, params


def _batch(rng, B=3):
    word = rng.normal(size=(B, SEQ_LEN, DIM_WORD)).astype(np.float32)
    pos = rng.normal(size=(B, SEQ_LEN, DIM_POS)).astype(np.float32)
    cap_lens = np.asarray([9, 6, 4][:B], np.int64)
    motions = rng.normal(size=(B, MOV_LEN * UNIT, DIM_POSE)).astype(np.float32)
    # curriculum semantics: true lengths >= cropped length (dataset.py
    # baseline __getitem__: m_length >= max_length)
    m_lens = np.asarray([24, 20, 16][:B], np.int64)
    return word, pos, cap_lens, motions, m_lens


def _ref_forward(trainer, batch, tf_ratio, eval_mode=False):
    import data_loaders.humanml.networks.modules as modules

    word, pos, cap_lens, motions, m_lens = batch
    orig = modules.reparameterize
    modules.reparameterize = lambda mu, logvar: mu
    try:
        trainer.forward(
            (torch.from_numpy(word), torch.from_numpy(pos),
             ["cap"] * len(cap_lens), torch.from_numpy(cap_lens),
             torch.from_numpy(motions), torch.from_numpy(m_lens)),
            tf_ratio, MOV_LEN, eval_mode=eval_mode)
    finally:
        modules.reparameterize = orig


def _our_forward(params, batch, teacher_force, use_prior_z=False):
    word, pos, cap_lens, motions, m_lens = batch
    eps = jnp.zeros((MOV_LEN, word.shape[0], DIM_Z))
    return TT.comp_v6_forward(
        params, jnp.asarray(word), jnp.asarray(pos),
        jnp.asarray(cap_lens, jnp.int32), jnp.asarray(motions),
        jnp.asarray(m_lens, jnp.int32), jnp.asarray(teacher_force),
        eps, eps, UNIT, use_prior_z=use_prior_z)


class TestForwardParity:
    @pytest.mark.parametrize("tf", [1.0, 0.0])
    def test_losses_match_reference(self, trainer_and_params, tf):
        trainer, params = trainer_and_params
        rng = np.random.default_rng(3)
        batch = _batch(rng)
        _ref_forward(trainer, batch, tf)
        ref_logs = trainer.backward_G()

        fm, fmov, movements, stats = _our_forward(params, batch, tf)
        _, logs = TT.comp_v6_losses(fm, fmov, jnp.asarray(batch[3]),
                                    movements, stats, CFG)
        for k in ("loss_gen", "loss_mot_rec", "loss_mov_rec", "loss_kld"):
            np.testing.assert_allclose(float(logs[k]), ref_logs[k],
                                       rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(fm),
                                   trainer.fake_motions.detach().numpy(),
                                   atol=5e-5)

    def test_eval_mode_uses_prior_z(self, trainer_and_params):
        trainer, params = trainer_and_params
        rng = np.random.default_rng(4)
        batch = _batch(rng)
        _ref_forward(trainer, batch, 0.0, eval_mode=True)
        fm, *_ = _our_forward(params, batch, 0.0, use_prior_z=True)
        np.testing.assert_allclose(np.asarray(fm),
                                   trainer.fake_motions.detach().numpy(),
                                   atol=5e-5)


class TestGradParity:
    def test_gradients_match_reference(self, trainer_and_params):
        """loss_gen.backward() vs jax.grad on the same converted weights:
        checks the detach/stop-gradient placement (movements, mov_in
        carries, frozen mov_enc) and BPTT through the GRU hiddens."""
        trainer, params = trainer_and_params
        rng = np.random.default_rng(5)
        batch = _batch(rng)
        _ref_forward(trainer, batch, 1.0)
        trainer.backward_G()
        for m in (trainer.text_enc, trainer.seq_post, trainer.seq_pri,
                  trainer.seq_dec, trainer.att_layer, trainer.mov_dec,
                  trainer.mov_enc):
            m.zero_grad()
        trainer.loss_gen.backward()

        def loss_fn(trainable):
            p = {**trainable, "mov_enc": params["mov_enc"]}
            fm, fmov, movements, stats = _our_forward(p, batch, 1.0)
            loss, _ = TT.comp_v6_losses(fm, fmov, jnp.asarray(batch[3]),
                                        movements, stats, CFG)
            return loss

        trainable = {k: params[k] for k in TT.TRAINABLE}
        grads = jax.grad(loss_fn)(trainable)

        checks = [
            (grads["seq_dec"]["out_fc2"]["kernel"],
             trainer.seq_dec.output[3].weight.grad.numpy().T),
            (grads["mov_dec"]["out_net"]["kernel"],
             trainer.mov_dec.out_net.weight.grad.numpy().T),
            (grads["att_layer"]["w_q"]["kernel"],
             trainer.att_layer.W_q.weight.grad.numpy().T),
            (grads["seq_post"]["mu_net"]["kernel"],
             trainer.seq_post.mu_net.weight.grad.numpy().T),
            (grads["seq_pri"]["logvar_net"]["kernel"],
             trainer.seq_pri.logvar_net.weight.grad.numpy().T),
            (grads["text_enc"]["input_emb"]["kernel"],
             trainer.text_enc.input_emb.weight.grad.numpy().T),
            (grads["text_enc"]["gru"]["hidden"],
             trainer.text_enc.hidden.grad.numpy()),
        ]
        for ours, theirs in checks:
            np.testing.assert_allclose(np.asarray(ours), theirs,
                                       rtol=5e-3, atol=2e-5)
        # mov_enc is frozen: reference never optimizes it and movements are
        # detached, so its torch grad must be None/zero.
        assert trainer.mov_enc.main[0].weight.grad is None or \
            float(trainer.mov_enc.main[0].weight.grad.abs().max()) == 0.0


class TestTraining:
    def test_fused_step_learns(self):
        """Losses drop on a tiny memorization task (scratch init)."""
        key = jax.random.PRNGKey(0)
        params = TT.init_comp_v6_params(key, CFG)
        init_opt, step, val_step = TT.make_comp_v6_step(CFG)
        opt_state = init_opt(params)

        rng = np.random.default_rng(0)
        batch_np = _batch(rng, B=4)
        word, pos, cap_lens, motions, m_lens = batch_np
        cap_lens = np.asarray([9, 6, 4, 4], np.int64)
        m_lens = np.asarray([24, 20, 16, 16], np.int64)
        batch = {
            "word_embs": jnp.asarray(np.concatenate([word, word[:1]])[:4]),
            "pos_onehot": jnp.asarray(np.concatenate([pos, pos[:1]])[:4]),
            "cap_lens": jnp.asarray(cap_lens, jnp.int32),
            "motions": jnp.asarray(
                np.concatenate([motions, motions[:1]])[:4]),
            "m_lens": jnp.asarray(m_lens, jnp.int32),
        }
        first = None
        logs = None
        for i in range(150):
            key, sub = jax.random.split(key)
            params, opt_state, logs = step(params, opt_state, batch, sub,
                                           jnp.asarray(1.0))
            if first is None:
                first = float(logs["loss_gen"])
        # random targets + per-network 0.5 clip: the tiny model plateaus
        # near its reconstruction floor; 35% off the first-step loss is
        # well beyond noise.
        assert float(logs["loss_gen"]) < 0.65 * first
        # val pass runs and is finite
        v = val_step(params, batch)
        assert np.isfinite(float(v["loss_gen"]))

    def test_curriculum_and_roundtrip(self, tmp_path):
        """Two scheduled lengths end-to-end; the saved params drive
        t2m_generate directly."""
        cfg = TT.CompV6TrainConfig(
            **{**CFG.__dict__, "schedule_start": 2, "schedule_end": 3,
               "max_sub_epoch": 2, "early_stop_count": 1})
        rng = np.random.default_rng(1)

        def make_batches(schedule_len, split):
            n = 2 if split == "train" else 1
            local = np.random.default_rng(schedule_len * 100 + (split == "val"))
            for _ in range(n):
                B = 2
                yield {
                    "word_embs": jnp.asarray(local.normal(
                        size=(B, SEQ_LEN, DIM_WORD)).astype(np.float32)),
                    "pos_onehot": jnp.asarray(local.normal(
                        size=(B, SEQ_LEN, DIM_POS)).astype(np.float32)),
                    "cap_lens": jnp.asarray([6, 4], jnp.int32),
                    "motions": jnp.asarray(local.normal(
                        size=(B, schedule_len * UNIT, DIM_POSE)
                    ).astype(np.float32)),
                    "m_lens": jnp.asarray(
                        [schedule_len * UNIT + 4, schedule_len * UNIT],
                        jnp.int32),
                }

        seen = []
        params = TT.init_comp_v6_params(jax.random.PRNGKey(1), cfg)
        params = TT.train_comp_v6(
            params, make_batches, cfg, rng=rng, log=lambda *_: None,
            on_length_done=lambda sl, p: seen.append(sl))
        assert seen == [2, 3]

        path = str(tmp_path / "comp_v6.npy")
        TT.save_comp_v6_params(path, params)
        loaded = np.load(path, allow_pickle=True).item()
        word = np.zeros((2, SEQ_LEN, DIM_WORD), np.float32)
        pos = np.zeros((2, SEQ_LEN, DIM_POS), np.float32)
        out = G.t2m_generate(
            loaded, jnp.asarray(word), jnp.asarray(pos),
            jnp.asarray([4, 4], jnp.int32), jnp.asarray([16, 12], jnp.int32),
            mov_len=4, unit_length=UNIT, dim_pose=DIM_POSE)
        assert out.shape == (2, 16, DIM_POSE)
        assert np.all(np.isfinite(np.asarray(out)))


class TestCLI:
    def test_comp_v6_stage_end_to_end(self, tmp_path):
        """CLI curriculum smoke on synthetic HumanML data; the produced
        params .npy drives t2m_generate (the eval CLI's
        --t2m_baseline_path contract)."""
        from mdm_tpu.cli import train_evaluators as cli

        rng = np.random.default_rng(11)
        root = tmp_path / "HumanML3D"
        (root / "new_joint_vecs").mkdir(parents=True)
        (root / "texts").mkdir()
        for i in range(5):
            name = f"{i:06d}"
            L = int(rng.integers(45, 190))
            np.save(root / "new_joint_vecs" / f"{name}.npy",
                    rng.normal(size=(L, 263)).astype(np.float32))
            (root / "texts" / f"{name}.txt").write_text(
                "a person walks#a/DET person/NOUN walk/VERB#0.0#0.0\n"
            )
        for split in ("train", "test"):
            (root / f"{split}.txt").write_text(
                "\n".join(f"{i:06d}" for i in range(5)))
        np.save(root / "Mean.npy", np.zeros(263, np.float32))
        np.save(root / "Std.npy", np.ones(263, np.float32))

        path = str(tmp_path / "comp_v6.npy")
        cli.main([
            "--stage", "comp_v6", "--data_dir", str(root),
            "--save_path", path, "--batch_size", "2",
            "--schedule_start", "2", "--schedule_end", "2",
            "--max_sub_epoch", "1", "--max_batches", "1",
        ])
        loaded = np.load(path, allow_pickle=True).item()
        for k in TT.TRAINABLE + ("mov_enc",):
            assert k in loaded
        word = np.zeros((2, 22, 300), np.float32)
        pos = np.zeros((2, 22, 15), np.float32)
        out = G.t2m_generate(
            loaded, jnp.asarray(word), jnp.asarray(pos),
            jnp.asarray([4, 4], jnp.int32),
            jnp.asarray([8, 8], jnp.int32), mov_len=2)
        assert out.shape == (2, 8, 263)
        assert np.all(np.isfinite(np.asarray(out)))


class TestDecompAdapter:
    def test_movement_params_from_flax(self):
        """flax decomp-stage params -> t2m_generator layout, numerically
        identical outputs."""
        from mdm_tpu.eval.networks import (
            MovementConvDecoder,
            MovementConvEncoder,
        )

        enc = MovementConvEncoder(hidden_size=18, output_size=MOV_LATENT)
        dec = MovementConvDecoder(hidden_size=18, output_size=DIM_POSE)
        ke, kd = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, DIM_POSE - 4))
        enc_p = enc.init(ke, x)["params"]
        lat = enc.apply({"params": enc_p}, x)
        dec_p = dec.init(kd, lat)["params"]

        enc_d, dec_d = TT.movement_params_from_flax(enc_p, dec_p)
        np.testing.assert_allclose(
            np.asarray(G.movement_conv_encoder(enc_d, x)),
            np.asarray(lat), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(G.movement_conv_decoder(dec_d, lat)),
            np.asarray(dec.apply({"params": dec_p}, lat)), atol=1e-5)
