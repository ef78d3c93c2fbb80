"""A2M evaluation protocol on synthetic loaders + random-weight classifier."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.eval.classifiers import MotionDiscriminator
from mdm_tpu.eval.harness_a2m import (
    A2MEvalConfig,
    A2MEvaluation,
    diversity_and_multimodality,
    evaluate_multi_seed,
    evaluate_unconstrained_metrics,
)

RNG = np.random.default_rng(23)


def make_loader(shift, n_batches=2, B=16, T=24, D=75, num_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        out.append({
            "output_xyz": jnp.asarray((rng.normal(size=(B, T, D)) + shift).astype(np.float32)),
            "lengths": jnp.asarray(np.full(B, T, np.int32)),
            "y": np.asarray(rng.integers(0, num_classes, B)),
        })
    return out


def test_a2m_evaluation_protocol():
    clf = MotionDiscriminator(75, 32, 2, 4)
    params = clf.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 75)), jnp.array([24])
    )
    ev = A2MEvaluation(clf, params, config=A2MEvalConfig(num_classes=4))

    def make_loaders(seed):
        return {
            "gt": make_loader(0.0, seed=7),
            "gt2": make_loader(0.0, seed=8),
            "gen": make_loader(1.5, seed=9 + seed),
        }

    summary = evaluate_multi_seed(make_loaders, ev, num_seeds=2)
    # generated (shifted) distribution must have larger FID than a second
    # ground-truth draw
    assert summary["fid_gen"]["mean"] > summary["fid_gt2"]["mean"]
    for k in ["accuracy_gt", "diversity_gen", "multimodality_gt"]:
        assert k in summary
        assert np.isfinite(summary[k]["mean"])


def test_diversity_multimodality_labels():
    acts = RNG.normal(size=(60, 8))
    labels = np.repeat(np.arange(6), 10)
    out = diversity_and_multimodality(acts, labels, 6, 30, 5)
    assert out["diversity"] > 0 and out["multimodality"] > 0


def test_unconstrained_metrics():
    gt = RNG.normal(size=(120, 16))
    close = gt + RNG.normal(size=gt.shape) * 0.01
    res = evaluate_unconstrained_metrics(close, gt, fast=True)
    far = evaluate_unconstrained_metrics(gt + 3.0, gt, fast=True)
    assert res["fid"] < far["fid"]
    assert res["precision"] > far["precision"]
    assert set(res) == {"fid", "kid", "kid_std", "precision", "recall", "diversity"}


def test_unconstrained_openpose_graph_oracle(reference_path):
    """Our 'openpose' adjacency must match the reference UNCONSTRAINED
    eval's MODIFIED 15-node graph (stgcnutils/graph.py:44-61 — the classic
    18-node table is commented out there; the modi_struct checkpoint's
    edge-importance weights are shaped for 15 nodes)."""
    import numpy as np

    from eval.unconstrained.models.stgcnutils.graph import Graph as RefGraph

    from mdm_tpu.eval.stgcn import build_graph_adjacency

    ref = RefGraph(layout="openpose", strategy="spatial")
    ours = build_graph_adjacency(layout="openpose_modi15", strategy="spatial")
    assert ours.shape == ref.A.shape == (3, 15, 15)
    np.testing.assert_allclose(np.asarray(ours), ref.A, atol=1e-7)
