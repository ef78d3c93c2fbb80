"""Composed eval-protocol parity: the reference's `evaluation()` vs ours.

Feeds ONE identical synthetic generated dataset + identical random-weight
evaluator encoders through (a) the reference composed pipeline
(/root/reference/eval/eval_humanml.py:139-237: matching/R-precision -> FID ->
diversity -> multimodality -> mean +- 1.96*std/sqrt(reps) aggregation) and
(b) mdm_tpu.eval.harness.evaluation, asserting every reported metric matches
to tolerance. Round-1 verdict item 3: metrics were oracle-pinned only
individually before this test.
"""
import re
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")

RNG = np.random.default_rng(2024)

B, T, D = 32, 160, 263  # batch-32 protocol lock (reference eval_humanml.py:245)
N_BATCHES = 2
MM_ITEMS, MM_REPEATS = 3, 8
DIVERSITY_TIMES, MM_TIMES, REPS = 20, 5, 2


@pytest.fixture(scope="module")
def ref_eval(reference_path):
    """Import the reference eval_humanml with its GPU/venv-only deps stubbed."""
    def stub(name, **attrs):
        import importlib.machinery

        m = types.ModuleType(name)
        # a real ModuleSpec so later importlib.util.find_spec probes (e.g.
        # transformers checking for optional spacy) don't crash on the stub
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    import torch.nn as nn

    clip_stub = stub("clip")
    clip_stub.load = lambda *a, **k: (nn.Linear(1, 1), None)
    clip_stub.tokenize = lambda *a, **k: None
    stub("spacy", load=lambda *a, **k: None)
    smplx = stub("smplx", SMPLLayer=type("SMPLLayer", (), {}))
    smplx.lbs = stub("smplx.lbs", vertices2joints=lambda *a, **k: None)
    stub("wandb")
    stub("clearml", Task=object)

    import eval.eval_humanml as ref_eval_mod
    return ref_eval_mod


@pytest.fixture(scope="module")
def evaluators(ref_eval):
    """Random-weight torch evaluator triple + converted JAX params."""
    import torch
    from data_loaders.humanml.networks.evaluator_wrapper import EvaluatorMDMWrapper
    from data_loaders.humanml.networks.modules import (
        MotionEncoderBiGRUCo,
        MovementConvEncoder,
        TextEncoderBiGRUCo,
    )

    from mdm_tpu.eval.evaluator import EvaluatorWrapper
    from mdm_tpu.eval.networks import (
        convert_motion_encoder,
        convert_movement_encoder,
        convert_text_encoder,
    )

    from mdm_tpu.eval import networks as N

    # Small embedding dim (16 << 64 samples) keeps the covariance full-rank:
    # the reference's own sqrtm FID raises on a rank-deficient product (its
    # real runs use ~1000 samples vs 512 dims).
    torch.manual_seed(7)
    movement = MovementConvEncoder(D - 4, 64, 16).eval()
    text = TextEncoderBiGRUCo(300, 15, 32, 16, device="cpu").eval()
    motion = MotionEncoderBiGRUCo(16, 64, 16, device="cpu").eval()

    ref_wrapper = object.__new__(EvaluatorMDMWrapper)
    ref_wrapper.movement_encoder = movement
    ref_wrapper.text_encoder = text
    ref_wrapper.motion_encoder = motion
    ref_wrapper.device = "cpu"
    ref_wrapper.opt = {"unit_length": 4, "device": "cpu"}

    to_np = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    ours = EvaluatorWrapper(
        params={
            "movement": convert_movement_encoder(to_np(movement)),
            "text": convert_text_encoder(to_np(text)),
            "motion": convert_motion_encoder(to_np(motion)),
        },
        movement_enc=N.MovementConvEncoder(64, 16),
        text_enc=N.TextEncoderBiGRUCo(300, 15, 32, 16),
        motion_enc=N.MotionEncoderBiGRUCo(16, 64, 16),
    )
    return ref_wrapper, ours


def _make_raw_batches(shift: float, scale: float, seed: int):
    """Identical synthetic 'generated data' consumed by both pipelines."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(N_BATCHES):
        # pack_padded_sequence in the reference text encoder needs sent_lens
        # sorted descending — the real t2m collate guarantees this. m_lens is
        # STRICTLY decreasing (no ties) so the reference wrapper's internal
        # `argsort(m_lens)[::-1]` (evaluator_wrapper.py:161-163) is exactly
        # the identity: its activation rows then align with ours, which
        # diversity/MM index into directly (ties would reverse tied rows).
        sent_lens = np.sort(rng.integers(3, 11, size=(B,)))[::-1].astype(np.int64)
        m_lens = np.sort(
            rng.choice(np.arange(4, T // 4 + 1) * 4, size=B, replace=False)
        )[::-1].astype(np.int64)
        batches.append({
            "word_embeddings": rng.normal(size=(B, 12, 300)).astype(np.float32),
            "pos_one_hots": np.eye(15, dtype=np.float32)[rng.integers(0, 15, (B, 12))],
            "sent_lens": sent_lens,
            "x": (rng.normal(size=(B, T, D)) * scale + shift).astype(np.float32),
            "lengths": m_lens,
        })
    return batches


def _make_mm_batches(seed: int):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(MM_ITEMS):
        out.append({
            "x": rng.normal(size=(MM_REPEATS, T, D)).astype(np.float32),
            # strictly decreasing: keeps the reference's length sort the
            # identity (real MM repeats share a length; the tie-reversal is
            # harmless there because repeats are exchangeable, but it would
            # misalign this row-exact comparison)
            "lengths": (T - 4 * np.arange(MM_REPEATS)).astype(np.int64),
        })
    return out


def _to_ref_tuples(batches):
    import torch

    out = []
    for b in batches:
        out.append((
            torch.from_numpy(b["word_embeddings"]),
            torch.from_numpy(b["pos_one_hots"]),
            ["caption"] * B,
            torch.from_numpy(b["sent_lens"]),
            torch.from_numpy(b["x"]),
            torch.from_numpy(b["lengths"]),
            ["tok"] * B,
        ))
    return out


def _to_ref_mm(batches):
    import torch

    return [
        (torch.from_numpy(b["x"][None]), torch.from_numpy(b["lengths"][None]))
        for b in batches
    ]


GT_BATCHES = _make_raw_batches(0.0, 1.0, seed=11)
GEN_BATCHES = _make_raw_batches(0.3, 1.1, seed=12)
MM_BATCHES = _make_mm_batches(seed=13)


def _parse_ref_log(path):
    """Mean/CI per metric/model from the reference log's summary sections."""
    text = open(path).read()
    out = {}
    section = None
    for line in text.splitlines():
        m = re.match(r"========== (.+) Summary ==========", line)
        if m:
            section = m.group(1)
            continue
        m = re.match(r"---> \[(.+?)\] Mean: ([-\d.]+) CInterval: ([-\d.]+)", line)
        if m and section:
            out[(section, m.group(1))] = (float(m.group(2)), float(m.group(3)))
        m = re.match(r"---> \[(.+?)\](\(top 1\).*)", line)
        if m and section == "R_precision" and "Mean" in line:
            vals = re.findall(r"Mean: ([-\d.]+) CInt: ([-\d.]+)", line)
            means = np.array([float(v[0]) for v in vals])
            cis = np.array([float(v[1]) for v in vals])
            out[(section, m.group(1))] = (means, cis)
    return out


def test_composed_protocol_parity(ref_eval, evaluators, tmp_path):
    ref_wrapper, our_wrapper = evaluators

    # ---- reference composed pipeline ---------------------------------
    ref_gt = _to_ref_tuples(GT_BATCHES)
    ref_gen = _to_ref_tuples(GEN_BATCHES)
    ref_mm = _to_ref_mm(MM_BATCHES)
    ref_log = tmp_path / "ref_eval.log"
    np.random.seed(123)  # the reference draws diversity/MM indices globally
    ref_mean = ref_eval.evaluation(
        ref_wrapper,
        gt_loader=ref_gt,
        eval_motion_loaders={"vald": lambda: (ref_gen, ref_mm)},
        log_file=str(ref_log),
        replication_times=REPS,
        diversity_times=DIVERSITY_TIMES,
        mm_num_times=MM_TIMES,
        run_mm=True,
    )
    ref_summary = _parse_ref_log(ref_log)

    # ---- our composed pipeline ----------------------------------------
    from mdm_tpu.eval import EvalConfig, evaluation

    np.random.seed(123)  # same global stream via rng_factory
    ours = evaluation(
        our_wrapper,
        gt_loader_fn=lambda: GT_BATCHES,
        eval_motion_loader_fns={"vald": lambda rep: GEN_BATCHES},
        mm_loader_fns={"vald": lambda rep: MM_BATCHES},
        config=EvalConfig(
            replication_times=REPS,
            diversity_times=DIVERSITY_TIMES,
            mm_num_times=MM_TIMES,
            run_mm=True,
            log_file=str(tmp_path / "ours_eval.log"),
            rng_factory=lambda rep: np.random,
        ),
    )

    # ---- every reported metric matches --------------------------------
    for metric, ref_key in [
        ("Matching Score", "Matching Score"),
        ("R_precision", "R_precision"),
        ("FID", "FID"),
        ("Diversity", "Diversity"),
    ]:
        for name in ("ground truth", "vald"):
            want = ref_mean[f"{ref_key}_{name}"]
            got = ours[metric][name]["mean"]
            np.testing.assert_allclose(
                got, want, rtol=2e-3, atol=2e-3,
                err_msg=f"{metric}/{name} mean mismatch",
            )
    np.testing.assert_allclose(
        ours["MultiModality"]["vald"]["mean"],
        ref_mean["MultiModality_vald"], rtol=2e-3, atol=2e-3,
    )

    # CI aggregation (1.96*std/sqrt(reps)) — parsed from the reference log,
    # which prints %.4f, so compare at that resolution.
    for (section, name), (want_mean, want_ci) in ref_summary.items():
        if name == "vald" and section == "MultiModality":
            got = ours[section][name]
            np.testing.assert_allclose(got["ci"], want_ci, atol=2e-3)
        elif name in ("ground truth", "vald") and section in (
            "Matching Score", "FID", "Diversity", "R_precision",
        ):
            got = ours[section][name]
            np.testing.assert_allclose(got["ci"], want_ci, atol=2e-3)

    # sanity: generated distribution is actually distinguishable
    assert ours["FID"]["vald"]["mean"] > ours["FID"]["ground truth"]["mean"]
