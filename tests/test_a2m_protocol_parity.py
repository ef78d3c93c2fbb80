"""Composed a2m eval-protocol parity: reference A2MEvaluation.evaluate vs ours.

Identical synthetic {gt, gt2, gen} loaders + identical random-weight GRU
classifiers through (a) the reference composed pipeline
(/root/reference/eval/a2m/action2motion/evaluate.py:41-86: accuracy ->
features -> stats -> diversity/multimodality -> FID-vs-gt for every loader)
and (b) mdm_tpu.eval.harness_a2m.A2MEvaluation.evaluate; every metric must
match. Complements the per-component classifier oracles in
tests/test_eval_harness.py (round-1 verdict item 3, a2m half).
"""
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

B, T, D = 16, 24, 75
N_BATCHES = 3
NUM_CLASSES = 12


@pytest.fixture(scope="module")
def ref_a2m(reference_path):
    import eval.a2m.action2motion.evaluate as ref_eval_mod
    return ref_eval_mod


@pytest.fixture(scope="module")
def classifiers(ref_a2m):
    import torch
    from eval.a2m.action2motion.models import (
        MotionDiscriminator as RefDisc,
        MotionDiscriminatorForFID as RefDiscFID,
    )

    from mdm_tpu.eval.classifiers import (
        MotionDiscriminator,
        convert_motion_discriminator,
    )

    torch.manual_seed(3)
    ref_clf = RefDisc(D, 128, 2, device="cpu", output_size=NUM_CLASSES).eval()
    ref_fid = RefDiscFID(D, 128, 2, device="cpu", output_size=NUM_CLASSES).eval()
    ref_fid.load_state_dict(ref_clf.state_dict())
    # The reference uses a RANDOM initial hidden state per forward
    # (models.py:40-41) — pin to zeros on both sides for a deterministic
    # comparison (our port is zeros by design, classifiers.py docstring).
    for m in (ref_clf, ref_fid):
        m.initHidden = lambda n, l, H=128: torch.zeros(l, n, H)

    ours_clf = MotionDiscriminator(D, 128, 2, NUM_CLASSES)
    ours_params = convert_motion_discriminator(
        {k: v.detach().numpy() for k, v in ref_clf.state_dict().items()}
    )
    return ref_clf, ref_fid, ours_clf, ours_params


def _make_batches(shift, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(N_BATCHES):
        out.append({
            "x": (rng.normal(size=(B, T, D)) + shift).astype(np.float32),
            "lengths": rng.integers(4, T + 1, size=(B,)).astype(np.int64),
            "y": rng.integers(0, NUM_CLASSES, size=(B,)).astype(np.int64),
        })
    return out


LOADERS_RAW = {
    "gt": _make_batches(0.0, 5),
    "gt2": _make_batches(0.0, 6),
    "gen": _make_batches(0.8, 7),
}


def _to_ref(batches):
    import torch

    # reference batch: output_xyz [B, njoints, nfeats, T]
    return [
        {
            "output_xyz": torch.from_numpy(
                np.transpose(b["x"], (0, 2, 1)).reshape(B, 25, 3, T)
            ),
            "lengths": torch.from_numpy(b["lengths"]),
            "y": torch.from_numpy(b["y"]),
        }
        for b in batches
    ]


def _to_ours(batches):
    return [
        {
            "output_xyz": jnp.asarray(b["x"]),
            "lengths": jnp.asarray(b["lengths"]),
            "y": b["y"],
        }
        for b in batches
    ]


def test_a2m_composed_parity(ref_a2m, classifiers):
    ref_clf, ref_fid, ours_clf, ours_params = classifiers

    ref_eval = object.__new__(ref_a2m.A2MEvaluation)
    ref_eval.input_size_raw = D
    ref_eval.num_classes = NUM_CLASSES
    ref_eval.device = "cpu"
    ref_eval.gru_classifier = ref_clf
    ref_eval.gru_classifier_for_fid = ref_fid

    model_stub = types.SimpleNamespace(cond_mode="action")
    ref_loaders = {k: _to_ref(v) for k, v in LOADERS_RAW.items()}
    np.random.seed(77)  # reference diversity/MM draw from the global stream
    ref_metrics = ref_eval.evaluate(model_stub, ref_loaders)

    from mdm_tpu.eval.harness_a2m import A2MEvalConfig, A2MEvaluation

    ours_ev = A2MEvaluation(
        ours_clf, ours_params,
        config=A2MEvalConfig(num_classes=NUM_CLASSES),
    )
    np.random.seed(77)  # same stream via the rng hook
    ours_metrics = ours_ev.evaluate(
        {k: _to_ours(v) for k, v in LOADERS_RAW.items()}, rng=np.random
    )

    assert set(ref_metrics) <= set(ours_metrics)
    for k, want in sorted(ref_metrics.items()):
        got = ours_metrics[k]
        np.testing.assert_allclose(
            got, want, rtol=2e-3, atol=2e-3, err_msg=f"a2m metric {k} mismatch"
        )
    # sanity: the shifted generated distribution is detected
    assert ours_metrics["fid_gen"] > ours_metrics["fid_gt2"] >= 0
