"""Evaluator-training parity: our fused jitted steps vs the reference
torch trainers (trainers.py) — same weights + batch -> same loss terms —
plus learning smoke tests and wrapper round-trips."""
import importlib.util
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.eval.networks import (
    MotionEncoderBiGRUCo,
    MotionLenEstimatorBiGRU,
    MovementConvDecoder,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
    convert_len_estimator,
    convert_motion_encoder,
    convert_movement_decoder,
    convert_movement_encoder,
    convert_text_encoder,
)
from mdm_tpu.eval.train_evaluators import (
    EvalTrainConfig,
    make_decomp_step,
    make_length_est_step,
    make_match_step,
    run_training,
)

RNG = np.random.default_rng(23)
D = 32  # small dim_pose for speed; structure identical to 263


@pytest.fixture(scope="module")
def ref_trainers(reference_path):
    """Load reference trainers.py with its data-side imports stubbed (the
    trainer classes themselves only need torch + modules.py). The
    `data_loaders.*` aliases exist only around the exec and sys.modules is
    restored afterwards — other test files import the real reference
    packages by those names."""
    mod_path = "/root/reference/data_loaders/humanml/networks/modules.py"
    spec = importlib.util.spec_from_file_location("ref_t2m_modules", mod_path)
    modules = importlib.util.module_from_spec(spec)
    sys.modules["ref_t2m_modules"] = modules
    spec.loader.exec_module(modules)

    stub_names = (
        "data_loaders.humanml.networks.modules",
        "data_loaders.humanml.utils.utils",
        "data_loaders.humanml.data.dataset",
    )
    saved = {n: sys.modules.get(n) for n in stub_names}
    utils_stub = types.ModuleType("data_loaders.humanml.utils.utils")
    ds_stub = types.ModuleType("data_loaders.humanml.data.dataset")
    ds_stub.collate_fn = None
    sys.modules["data_loaders.humanml.networks.modules"] = modules
    sys.modules["data_loaders.humanml.utils.utils"] = utils_stub
    sys.modules["data_loaders.humanml.data.dataset"] = ds_stub
    try:
        tpath = "/root/reference/data_loaders/humanml/networks/trainers.py"
        spec = importlib.util.spec_from_file_location("ref_t2m_trainers", tpath)
        trainers = importlib.util.module_from_spec(spec)
        sys.modules["ref_t2m_trainers"] = trainers
        spec.loader.exec_module(trainers)
    finally:
        for n, old in saved.items():
            if old is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = old
    return modules, trainers


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_movement_decoder_conversion(ref_trainers):
    import torch

    modules, _ = ref_trainers
    torch.manual_seed(0)
    ref = modules.MovementConvDecoder(16, 24, D)
    ref.eval()
    ours = MovementConvDecoder(hidden_size=24, output_size=D)
    params = convert_movement_decoder(_sd(ref))

    x = RNG.normal(size=(3, 5, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_decomp_loss_matches_reference(ref_trainers):
    import torch

    modules, trainers = ref_trainers
    torch.manual_seed(1)
    ref_enc = modules.MovementConvEncoder(D - 4, 24, 16)
    ref_dec = modules.MovementConvDecoder(16, 24, D)
    ref_enc.eval(), ref_dec.eval()

    opt = types.SimpleNamespace(
        device="cpu", is_train=False, lambda_sparsity=0.3, lambda_smooth=0.7
    )
    tr = trainers.DecompTrainerV3(opt, ref_enc, ref_dec)
    tr.l1_criterion = torch.nn.L1Loss()

    motions = RNG.normal(size=(4, 16, D)).astype(np.float32)
    tr.forward(torch.from_numpy(motions))
    tr.backward()

    enc = MovementConvEncoder(hidden_size=24, output_size=16)
    dec = MovementConvDecoder(hidden_size=24, output_size=D)
    cfg = EvalTrainConfig(lambda_sparsity=0.3, lambda_smooth=0.7)
    init, step = make_decomp_step(enc, dec, cfg)
    params = {
        "enc": convert_movement_encoder(_sd(ref_enc))["params"],
        "dec": convert_movement_decoder(_sd(ref_dec))["params"],
    }
    # loss only (no update): reuse the step's loss via a 1-step probe with
    # lr=0 — simpler: recompute directly
    import optax

    _, step0 = make_decomp_step(enc, dec, EvalTrainConfig(
        lr=0.0, lambda_sparsity=0.3, lambda_smooth=0.7))
    opt_state = optax.adam(0.0).init(params)
    _, _, logs = step0(params, opt_state, jnp.asarray(motions))

    np.testing.assert_allclose(float(logs["loss_rec"]), tr.loss_rec.item(), rtol=1e-5)
    np.testing.assert_allclose(float(logs["loss_sparsity"]), tr.loss_sparsity.item(), rtol=1e-5)
    np.testing.assert_allclose(float(logs["loss_smooth"]), tr.loss_smooth.item(), rtol=1e-5)
    np.testing.assert_allclose(float(logs["loss"]), tr.loss.item(), rtol=1e-5)


def test_match_loss_matches_reference(ref_trainers, monkeypatch):
    import torch

    modules, trainers = ref_trainers
    torch.manual_seed(2)
    B, L, T = 6, 7, 16
    ref_text = modules.TextEncoderBiGRUCo(300, 15, 32, 24, "cpu")
    ref_motion = modules.MotionEncoderBiGRUCo(16, 48, 24, "cpu")
    ref_movement = modules.MovementConvEncoder(D - 4, 24, 16)
    for m in (ref_text, ref_motion, ref_movement):
        m.eval()

    opt = types.SimpleNamespace(device="cpu", is_train=False, unit_length=4,
                                negative_margin=5.0)
    tr = trainers.TextMotionMatchTrainer(opt, ref_text, ref_motion, ref_movement)
    tr.contrastive_loss = modules.ContrastiveLoss(5.0)

    word_embs = RNG.normal(size=(B, L, 300)).astype(np.float32)
    pos_onehot = RNG.normal(size=(B, L, 15)).astype(np.float32)
    cap_lens = np.sort(RNG.integers(3, L + 1, size=B))[::-1].copy()
    motions = RNG.normal(size=(B, T, D)).astype(np.float32)
    m_lens = (RNG.integers(2, T // 4 + 1, size=B) * 4).astype(np.int64)
    shift = 2
    monkeypatch.setattr(trainers.np.random, "randint", lambda *a, **k: shift)

    batch = (
        torch.from_numpy(word_embs), torch.from_numpy(pos_onehot), None,
        torch.from_numpy(cap_lens.astype(np.int64)),
        torch.from_numpy(motions), torch.from_numpy(m_lens), None,
    )
    tr.forward(batch)
    logs_ref = tr.backward()

    text_enc = TextEncoderBiGRUCo(300, 15, 32, 24)
    motion_enc = MotionEncoderBiGRUCo(16, 48, 24)
    movement_enc = MovementConvEncoder(hidden_size=24, output_size=16)
    cfg = EvalTrainConfig(lr=0.0, unit_length=4, negative_margin=5.0)
    _, step = make_match_step(text_enc, motion_enc, movement_enc, cfg)

    import optax

    params = {
        "text": convert_text_encoder(_sd(ref_text))["params"],
        "motion": convert_motion_encoder(_sd(ref_motion))["params"],
    }
    frozen = convert_movement_encoder(_sd(ref_movement))["params"]
    opt_state = optax.adam(0.0).init(params)
    jbatch = {
        "word_embs": jnp.asarray(word_embs),
        "pos_onehot": jnp.asarray(pos_onehot),
        "cap_lens": jnp.asarray(cap_lens.astype(np.int32)),
        "motions": jnp.asarray(motions),
        "m_lens": jnp.asarray(m_lens.astype(np.int32)),
        "shift": jnp.asarray(shift),
    }
    _, _, logs = step(params, opt_state, frozen, jbatch)

    np.testing.assert_allclose(float(logs["loss_pos"]), logs_ref["loss_pos"], rtol=2e-4)
    np.testing.assert_allclose(float(logs["loss_neg"]), logs_ref["loss_neg"], rtol=2e-4)
    np.testing.assert_allclose(float(logs["loss"]), logs_ref["loss"], rtol=2e-4)


def test_length_est_loss_matches_reference(ref_trainers):
    import torch
    import torch.nn.functional as F

    modules, _ = ref_trainers
    torch.manual_seed(3)
    B, L = 5, 7
    ref_est = modules.MotionLenEstimatorBiGRU(300, 15, 32, 12)
    ref_est.eval()

    word_embs = RNG.normal(size=(B, L, 300)).astype(np.float32)
    pos_onehot = RNG.normal(size=(B, L, 15)).astype(np.float32)
    cap_lens = np.sort(RNG.integers(3, L + 1, size=B))[::-1].copy()
    m_lens = RNG.integers(0, 12 * 4, size=B).astype(np.int64)

    with torch.no_grad():
        logits = ref_est(torch.from_numpy(word_embs), torch.from_numpy(pos_onehot),
                         torch.from_numpy(cap_lens.astype(np.int64)))
        want = F.cross_entropy(logits, torch.from_numpy(m_lens // 4)).item()

    est = MotionLenEstimatorBiGRU(300, 15, 32, 12, nd=512)
    params = convert_len_estimator(_sd(ref_est))["params"]
    _, step = make_length_est_step(est, EvalTrainConfig(lr=0.0))

    import optax

    opt_state = optax.adam(0.0).init(params)
    batch = {
        "word_embs": jnp.asarray(word_embs),
        "pos_onehot": jnp.asarray(pos_onehot),
        "cap_lens": jnp.asarray(cap_lens.astype(np.int32)),
        "m_lens": jnp.asarray(m_lens.astype(np.int32)),
    }
    _, _, logs = step(params, opt_state, batch)
    np.testing.assert_allclose(float(logs["loss"]), want, rtol=1e-5)


# ---------------------------------------------------------------------------
# Learning smoke: each trainer reduces its loss on synthetic data
# ---------------------------------------------------------------------------


def _decomp_batches(B=8, T=16):
    rng = np.random.default_rng(0)
    base = rng.normal(size=(1, T, D)).astype(np.float32)
    while True:
        yield jnp.asarray(base + 0.05 * rng.normal(size=(B, T, D)).astype(np.float32))


def test_decomp_training_learns():
    enc = MovementConvEncoder(hidden_size=24, output_size=16)
    dec = MovementConvDecoder(hidden_size=24, output_size=D)
    init, step = make_decomp_step(enc, dec, EvalTrainConfig(lr=2e-3))
    batches = _decomp_batches()
    params, opt_state = init(jax.random.PRNGKey(0))
    _, _, first = step(params, opt_state, next(batches))
    params, last = run_training(
        lambda k: (params, opt_state), step, batches, 120,
        jax.random.PRNGKey(0), log_every=1000,
    )
    assert float(last["loss"]) < 0.5 * float(first["loss"])


def test_length_est_training_learns():
    est = MotionLenEstimatorBiGRU(300, 15, 32, 12, nd=64)
    init, step = make_length_est_step(est, EvalTrainConfig(lr=2e-3))
    rng = np.random.default_rng(1)

    def batches():
        while True:
            B, L = 16, 7
            labels = rng.integers(0, 12, size=B)
            # word embeddings linearly encode the label -> learnable
            w = np.zeros((B, L, 300), np.float32)
            w[np.arange(B), 0, labels] = 1.0
            yield {
                "word_embs": jnp.asarray(w),
                "pos_onehot": jnp.zeros((B, L, 15)),
                "cap_lens": jnp.full((B,), L, jnp.int32),
                "m_lens": jnp.asarray((labels * 4).astype(np.int32)),
            }

    it = batches()
    params, opt_state = init(jax.random.PRNGKey(0))
    _, _, first = step(params, opt_state, next(it))
    params, last = run_training(
        lambda k: (params, opt_state), step, it, 150, jax.random.PRNGKey(0),
        log_every=1000,
    )
    assert float(last["loss"]) < 0.6 * float(first["loss"])


def test_match_training_learns_and_loads_into_wrapper(tmp_path):
    from mdm_tpu.eval.evaluator import EvaluatorWrapper
    from mdm_tpu.eval.train_evaluators import (
        load_evaluator_params,
        save_evaluator_params,
    )

    text_enc = TextEncoderBiGRUCo(300, 15, 32, 24)
    motion_enc = MotionEncoderBiGRUCo(16, 48, 24)
    movement_enc = MovementConvEncoder(hidden_size=24, output_size=16)
    frozen = movement_enc.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 8, D - 4))
    )["params"]
    cfg = EvalTrainConfig(lr=1e-3, negative_margin=5.0)
    init, step = make_match_step(text_enc, motion_enc, movement_enc, cfg)

    rng = np.random.default_rng(2)

    def batches():
        B, L, T = 8, 7, 16
        while True:
            # text embedding correlated with motion content -> learnable
            sig = rng.normal(size=(B, 1, 1)).astype(np.float32)
            yield {
                "word_embs": jnp.asarray(
                    np.broadcast_to(sig, (B, L, 300)).copy()
                    + 0.01 * rng.normal(size=(B, L, 300)).astype(np.float32)
                ),
                "pos_onehot": jnp.zeros((B, L, 15)),
                "cap_lens": jnp.full((B,), L, jnp.int32),
                "motions": jnp.asarray(
                    np.broadcast_to(sig, (B, T, D)).copy()
                    + 0.01 * rng.normal(size=(B, T, D)).astype(np.float32)
                ),
                "m_lens": jnp.full((B,), T, jnp.int32),
                "shift": jnp.asarray(int(rng.integers(1, 7))),
            }

    it = batches()
    params, opt_state = init(jax.random.PRNGKey(0))
    _, _, first = step(params, opt_state, frozen, next(it))
    for _ in range(120):
        params, opt_state, last = step(params, opt_state, frozen, next(it))
    assert float(last["loss"]) < float(first["loss"])

    # persist + reload through the wrapper (finest.npy contract)
    wrapped = {
        "movement": {"params": frozen},
        "text": {"params": params["text"]},
        "motion": {"params": params["motion"]},
    }
    path = str(tmp_path / "finest.npy")
    save_evaluator_params(path, wrapped)
    loaded = load_evaluator_params(path)
    wrapper = EvaluatorWrapper(
        "humanml", params=loaded,
        movement_enc=movement_enc, text_enc=text_enc, motion_enc=motion_enc,
    )
    w = np.zeros((4, 7, 300), np.float32)
    p = np.zeros((4, 7, 15), np.float32)
    te, me = wrapper.get_co_embeddings(
        w, p, np.full((4,), 7), rng.normal(size=(4, 16, D)).astype(np.float32),
        np.full((4,), 16),
    )
    assert te.shape == (4, 24) and me.shape == (4, 24)
    assert np.isfinite(te).all() and np.isfinite(me).all()


@pytest.mark.slow
def test_train_evaluators_cli_end_to_end(tmp_path):
    """decomp -> match through the CLI on synthetic HumanML data, then the
    produced finest.npy drives EvaluatorWrapper co-embeddings."""
    from mdm_tpu.cli import train_evaluators as cli
    from mdm_tpu.eval.evaluator import EvaluatorWrapper
    from mdm_tpu.eval.networks import (
        MotionEncoderBiGRUCo as ME,
        MovementConvEncoder as ME2,
        TextEncoderBiGRUCo as TE,
    )
    from mdm_tpu.eval.train_evaluators import load_evaluator_params

    rng = np.random.default_rng(4)
    root = tmp_path / "HumanML3D"
    (root / "new_joint_vecs").mkdir(parents=True)
    (root / "texts").mkdir()
    for i in range(6):
        name = f"{i:06d}"
        L = int(rng.integers(45, 190))
        np.save(root / "new_joint_vecs" / f"{name}.npy",
                rng.normal(size=(L, 263)).astype(np.float32))
        (root / "texts" / f"{name}.txt").write_text(
            "a person walks#a/DET person/NOUN walk/VERB#0.0#0.0\n"
        )
    for split in ("train", "test"):
        (root / f"{split}.txt").write_text("\n".join(f"{i:06d}" for i in range(6)))
    np.save(root / "Mean.npy", np.zeros(263, np.float32))
    np.save(root / "Std.npy", np.ones(263, np.float32))

    decomp_path = str(tmp_path / "decomp.npy")
    cli.main([
        "--stage", "decomp", "--data_dir", str(root),
        "--save_path", decomp_path, "--batch_size", "4", "--num_steps", "3",
        "--movement_dim", "16", "--log_every", "2",
    ])
    dp = load_evaluator_params(decomp_path)
    assert "enc" in dp and "dec" in dp

    finest = str(tmp_path / "finest.npy")
    cli.main([
        "--stage", "match", "--data_dir", str(root),
        "--save_path", finest, "--decomp_path", decomp_path,
        "--batch_size", "4", "--num_steps", "3",
        "--movement_dim", "16", "--coemb_dim", "12", "--log_every", "2",
    ])
    params = load_evaluator_params(finest)
    wrapper = EvaluatorWrapper(
        "humanml", params=params,
        movement_enc=ME2(hidden_size=16, output_size=16),
        text_enc=TE(300, 15, 12, 12),
        motion_enc=ME(16, 24, 12),
    )
    te, me = wrapper.get_co_embeddings(
        np.zeros((4, 7, 300), np.float32), np.zeros((4, 7, 15), np.float32),
        np.full((4,), 7), rng.normal(size=(4, 16, 263)).astype(np.float32),
        np.full((4,), 16),
    )
    assert np.isfinite(te).all() and np.isfinite(me).all()

    length_path = str(tmp_path / "length.npy")
    cli.main([
        "--stage", "length", "--data_dir", str(root),
        "--save_path", length_path, "--batch_size", "4", "--num_steps", "3",
        "--log_every", "2",
    ])
    assert "estimator" in load_evaluator_params(length_path)
