"""Action-to-motion evaluation (HumanAct12 GRU / UESTC STGCN protocols).

Mirror of /root/reference/eval/eval_humanact12_uestc.py + eval/a2m/*:
per-seed passes over {gen, gt, gt2} loaders computing classifier accuracy,
FID (gen vs gt, gt2 vs gt as sanity), diversity and multimodality on
classifier features, summarized mean +- CI across seeds. Also the
unconstrained protocol (STGCN features -> FID/KID/precision-recall/
diversity, reference eval/unconstrained/evaluate.py).

Motion decoding (rot6d -> xyz via SMPL) is injected as `get_xyz`; classifier
params come from converted reference checkpoints
(assets/actionrecognition/*.tar, same asset contract).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

from . import metrics as M
from .classifiers import MotionDiscriminator


def classifier_accuracy(feats_yhat: np.ndarray, labels: np.ndarray) -> float:
    return float((feats_yhat.argmax(axis=1) == labels).mean())


def _randint(rng, low, high, size=None):
    """Scalar/array uniform ints for either a Generator or the legacy
    np.random module (the latter lets tests share the reference's global
    stream for bit-exact parity)."""
    if hasattr(rng, "integers"):
        return rng.integers(low, high, size)
    return rng.randint(low, high, size)


def diversity_and_multimodality(
    activations: np.ndarray, labels: Optional[np.ndarray], num_labels: int,
    diversity_times: int = 200, multimodality_times: int = 20,
    rng: Optional[np.random.Generator] = None, unconstrained: bool = False,
) -> Dict[str, float]:
    """Exact reference algorithm (eval/a2m/action2motion/diversity.py:21-66):
    diversity = mean distance over `diversity_times` with-replacement pairs;
    multimodality = quota-based rejection sampling of same-label pairs,
    normalized by multimodality_times * num_labels (labels absent from the
    batch keep quota 0 but still count in the denominator — reproduced)."""
    rng = rng if rng is not None else np.random.default_rng(0)
    n = len(activations)
    first = _randint(rng, 0, n, diversity_times)
    second = _randint(rng, 0, n, diversity_times)
    diversity = float(np.linalg.norm(activations[first] - activations[second], axis=1).mean())

    if unconstrained or labels is None:
        return {"diversity": diversity, "multimodality": float("nan")}

    labels = np.asarray(labels)
    multimodality = 0.0
    label_quotas = np.zeros(num_labels)
    label_quotas[np.unique(labels)] = multimodality_times
    while np.any(label_quotas > 0):
        first_idx = int(_randint(rng, 0, n))
        first_label = labels[first_idx]
        if not label_quotas[first_label]:
            continue
        second_idx = int(_randint(rng, 0, n))
        while labels[second_idx] != first_label:
            second_idx = int(_randint(rng, 0, n))
        label_quotas[first_label] -= 1
        multimodality += float(
            np.linalg.norm(activations[first_idx] - activations[second_idx])
        )
    multimodality /= multimodality_times * num_labels
    return {"diversity": diversity, "multimodality": float(multimodality)}


@dataclass
class A2MEvalConfig:
    num_seeds: int = 20
    num_classes: int = 12
    batch_size: int = 64
    num_samples: int = -1
    diversity_times: int = 200
    multimodality_times: int = 20


class A2MEvaluation:
    """Computes per-seed metrics over {gen, gt, gt2} motion loaders.

    Each loader yields dicts with `output_xyz` [B, T, J*3] (flattened smpl
    joints+trans), `lengths` [B], and `y` [B] labels.
    """

    def __init__(
        self,
        classifier: MotionDiscriminator,
        classifier_params: dict,
        fid_classifier_params: Optional[dict] = None,
        config: A2MEvalConfig = A2MEvalConfig(),
    ):
        import jax

        self.config = config
        self.classifier = classifier
        self.params_cls = classifier_params
        self.params_fid = fid_classifier_params or classifier_params
        self._run = jax.jit(
            lambda params, x, lengths: classifier.apply(params, x, lengths)
        )

    def _collect(self, loader: Iterable, params) -> Dict[str, np.ndarray]:
        import jax
        import jax.numpy as jnp

        feats, yhat, labels = [], [], []
        for batch in loader:
            # Keep classifier outputs on device: per-batch np.asarray would
            # force a blocking sync per batch (75 ms RTT each on the dev
            # tunnel) and serialize generation against classification. ONE
            # device_get below drains the whole async pipeline.
            out = self._run(
                params, jnp.asarray(batch["output_xyz"]),
                jnp.asarray(batch["lengths"]),
            )
            feats.append(out["features"])
            yhat.append(out["yhat"])
            if "y" in batch:
                labels.append(np.asarray(batch["y"]))
        feats, yhat = jax.device_get((feats, yhat))
        return {
            "features": np.concatenate(feats),
            "yhat": np.concatenate(yhat),
            "labels": np.concatenate(labels) if labels else None,
        }

    def evaluate(
        self, loaders: Dict[str, Iterable], seed: int = 0, rng=None
    ) -> Dict[str, float]:
        cfg = self.config
        rng = rng if rng is not None else np.random.default_rng(seed)
        metrics: Dict[str, float] = {}
        stats = {}
        collected = {}
        for key, loader in loaders.items():
            acc_data = self._collect(loader, self.params_cls)
            if acc_data["labels"] is not None:
                metrics[f"accuracy_{key}"] = classifier_accuracy(
                    acc_data["yhat"], acc_data["labels"]
                )
            else:
                metrics[f"accuracy_{key}"] = float("nan")
            fid_data = (
                acc_data
                if self.params_fid is self.params_cls
                else self._collect(loader, self.params_fid)
            )
            collected[key] = fid_data
            stats[key] = M.calculate_activation_statistics(fid_data["features"])
            dm = diversity_and_multimodality(
                fid_data["features"], fid_data["labels"],
                cfg.num_classes, cfg.diversity_times, cfg.multimodality_times, rng,
                unconstrained=fid_data["labels"] is None,
            )
            metrics[f"diversity_{key}"] = dm["diversity"]
            metrics[f"multimodality_{key}"] = dm["multimodality"]

        # FID for EVERY loader vs gt, including gt itself (~0, the
        # reference's sanity row — evaluate.py:75-83).
        for key in loaders:
            metrics[f"fid_{key}"] = M.calculate_frechet_distance(
                *stats["gt"], *stats[key]
            )
        return metrics


def evaluate_multi_seed(
    make_loaders: Callable[[int], Dict[str, Iterable]],
    evaluation: A2MEvaluation,
    num_seeds: int = 20,
) -> Dict[str, Dict[str, float]]:
    """Seed loop + mean/CI summary (reference eval_humanact12_uestc.py:18-48)."""
    per_seed: Dict[str, List[float]] = {}
    for seed in range(num_seeds):
        metrics = evaluation.evaluate(make_loaders(seed), seed=seed)
        for k, v in metrics.items():
            per_seed.setdefault(k, []).append(v)
    summary = {}
    for k, vals in per_seed.items():
        arr = np.asarray(vals, dtype=np.float64)
        summary[k] = {
            "mean": float(np.nanmean(arr)),
            "ci": float(1.96 * np.nanstd(arr) / np.sqrt(len(arr))),
        }
    return summary


# ---------------------------------------------------------------- unconstrained
UNCONSTRAINED_JOINT_SUBSET = [15, 12, 16, 18, 20, 17, 19, 21, 0, 1, 4, 7, 2, 5, 8]


def evaluate_unconstrained_metrics(
    generated_features: np.ndarray,
    gt_features: np.ndarray,
    fast: bool = True,
) -> Dict[str, float]:
    """FID / KID / precision-recall / diversity on STGCN features
    (reference eval/unconstrained/evaluate.py:57-110)."""
    gt_stats = M.calculate_activation_statistics(gt_features)
    gen_stats = M.calculate_activation_statistics(generated_features)
    fid = M.calculate_frechet_distance(*gt_stats, *gen_stats)
    kid_mean, kid_std = M.calculate_kid(
        gt_features, generated_features,
        n_subsets=10 if fast else 100,
        subset_size=min(1000, len(gt_features), len(generated_features)),
    )
    precision, recall = M.precision_and_recall(generated_features, gt_features)
    diversity = M.calculate_diversity(
        generated_features, min(10000, len(generated_features) - 1)
    )
    return {
        "fid": fid, "kid": kid_mean, "kid_std": kid_std,
        "precision": precision, "recall": recall, "diversity": diversity,
    }
