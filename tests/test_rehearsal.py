"""Closed-loop rehearsal smoke: synthetic dataset -> evaluator training ->
MDM training -> full eval protocol, all through the CLIs
(scripts/synthetic_quality_rehearsal.py --smoke).

The smoke model trains 40 steps (not enough to separate trained from
untrained — the TPU run in docs/BENCHMARKS.md does that); what this test
pins is that the whole chain composes and that the SELF-TRAINED metric
encoders genuinely discriminate: ground-truth R-precision must be far
above the 1/32 chance level, and every metric must be finite.
"""
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_rehearsal_smoke(tmp_path):
    import synthetic_quality_rehearsal as sqr

    results, sep = sqr.main(["--smoke", "--work_dir", str(tmp_path / "work")])
    assert set(results) == {"trained", "untrained"}
    for row in results.values():
        for v in (row["matching"], row["FID"], row["Diversity"]):
            assert np.isfinite(v)
        assert len(row["R_precision_top123"]) == 3
    # Self-trained evaluators must rank the matched caption far above the
    # 1/32 = 0.031 chance rate on ground-truth pairs (top-3 chance 0.094).
    gt_r3 = results["trained"]["R_precision_gt"][-1]
    assert gt_r3 > 0.3, f"trained evaluators don't discriminate: R@3={gt_r3}"
    assert results["trained"]["matching_gt"] < results["trained"]["matching"]


@pytest.mark.slow
def test_a2m_rehearsal_smoke(tmp_path):
    """a2m closed loop: synthetic HumanAct12 -> classifier training ->
    action-conditioned MDM training -> multi-seed a2m protocol with
    --a2m_classifier_path. The smoke model trains 40 steps (separation is
    the TPU run's job); what this pins is that the chain composes and the
    SELF-TRAINED classifier genuinely recognizes: ground-truth accuracy far
    above the 1/12 = 0.083 chance rate, all metrics finite, and the run
    stamped self-trained (never random-init-degraded)."""
    import synthetic_a2m_rehearsal as sar

    results, sep = sar.main(["--smoke", "--work_dir", str(tmp_path / "work")])
    assert set(results) == {"trained", "untrained"}
    for row in results.values():
        for v in (row["accuracy_gen"], row["fid_gen"], row["diversity_gen"]):
            assert np.isfinite(v)
        assert row["classifier"] == "self-trained"
    acc_gt = results["trained"]["accuracy_gt"]
    assert acc_gt > 0.5, f"self-trained classifier doesn't recognize: {acc_gt}"
    # gt2-vs-gt FID sanity row must sit far below the untrained model's FID
    assert results["trained"]["fid_gt2"] < results["untrained"]["fid_gen"]


@pytest.mark.slow
def test_dip_rehearsal_smoke(tmp_path):
    """DiP closed loop (--family dip): trans_dec prefix-completion training
    -> AUTOREGRESSIVE eval protocol (fixed-len prefix windows, AR chunk
    generation). Separation is the TPU run's job; this pins that the AR
    chain composes WITH real text features end to end: the prefix collate
    must carry word_embeddings through (a dropped key silently degrades the
    whole eval to zero text features), so ground-truth R-precision must be
    far above the 1/32 chance level and nothing may be stamped degraded by
    zero text features."""
    import synthetic_quality_rehearsal as sqr

    results, sep = sqr.main(
        ["--smoke", "--family", "dip", "--work_dir", str(tmp_path / "work")])
    assert set(results) == {"trained", "untrained"}
    for row in results.values():
        for v in (row["matching"], row["FID"], row["Diversity"]):
            assert np.isfinite(v)
    gt_r3 = results["trained"]["R_precision_gt"][-1]
    assert gt_r3 > 0.2, f"AR-protocol text features degraded: R@3={gt_r3}"
    assert results["trained"]["matching_gt"] < results["trained"]["matching"]


@pytest.mark.slow
def test_kit_rehearsal_smoke(tmp_path):
    """KIT-shaped closed loop (--dataset kit, 251-d / 21 joints): the whole
    quality chain at KIT shapes, with the self-trained evaluators saved
    under the kit/ checkpoint family that EvaluatorWrapper resolves for
    dataset=kit (a t2m/-hardcoded path silently degrades the run to
    random-init encoders)."""
    import synthetic_quality_rehearsal as sqr

    results, sep = sqr.main(
        ["--smoke", "--dataset", "kit", "--work_dir", str(tmp_path / "work")])
    assert set(results) == {"trained", "untrained"}
    for row in results.values():
        for v in (row["matching"], row["FID"], row["Diversity"]):
            assert np.isfinite(v)
    gt_r3 = results["trained"]["R_precision_gt"][-1]
    assert gt_r3 > 0.3, f"kit evaluators don't discriminate: R@3={gt_r3}"


@pytest.mark.slow
def test_unconstrained_rehearsal_smoke(tmp_path):
    """Unconstrained closed loop: synthetic HumanAct12 -> modi-15 STGCN
    training -> unconstrained MDM training -> eval_unconstrained metrics
    (FID/KID/precision/recall/diversity). Smoke must already separate:
    an unconditional model matching a multi-modal distribution beats a
    1-step control on FID and KID by a wide margin even at 40 steps."""
    import synthetic_unconstrained_rehearsal as sur

    results, sep = sur.main(["--smoke", "--work_dir", str(tmp_path / "work")])
    assert set(results) == {"trained", "untrained"}
    for row in results.values():
        for v in (row["fid"], row["kid"], row["diversity"]):
            assert np.isfinite(v)
        assert row["classifier"] == "self-trained"
    assert sep["trained_beats_untrained"]
