"""Shared construction for the a2m eval protocol (classifier + loaders).

Used by both the standalone CLI (cli/eval_a2m.py) and eval-during-training
(cli/train.py), mirroring how the reference shares eval_humanact12_uestc
.evaluate between eval and train (train/training_loop.py:275-286).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Tuple


class StgcnAdapter:
    """Match MotionDiscriminator's (x, lengths) call signature.

    The a2m harness and the classifier trainer both call
    `clf.apply(params, x, lengths)`; the STGCN ignores lengths (the
    reference's STGCN consumes fixed-60-frame clips, stgcn_eval.py:58-75).
    """

    def __init__(self, stg):
        self.stg = stg

    def apply(self, params, x, lengths):
        return self.stg.apply(params, x)

    def init(self, key, x, lengths):
        return self.stg.init(key, x)


def build_a2m_classifier(
    dataset_name: str, num_actions: int, num_frames: int = 60
) -> Tuple[object, dict, bool]:
    """Frozen a2m classifier: (clf_with_apply, params, degraded).

    HumanAct12 -> GRU MotionDiscriminator on xyz (reference
    eval/a2m/gru_eval.py); UESTC -> STGCN on rot6d (stgcn_eval.py:58-60).
    degraded=True when the converted reference checkpoint asset is missing
    and a random init stands in (metrics then not comparable).
    """
    import jax
    import jax.numpy as jnp

    from .classifiers import MotionDiscriminator, convert_motion_discriminator

    degraded = False
    if dataset_name == "uestc":
        from .stgcn import STGCN, STGCNConfig, convert_stgcn

        stg_cfg = STGCNConfig(in_channels=6, num_class=num_actions, layout="smpl")
        stg = STGCN(stg_cfg)
        clf_path = os.path.join("assets", "actionrecognition", "uestc_rot6d_stgcn.tar")
        if os.path.exists(clf_path):
            import torch

            sd = torch.load(clf_path, map_location="cpu", weights_only=False)
            sd = sd.get("model", sd)
            clf_params = convert_stgcn({k: v.numpy() for k, v in sd.items()}, stg_cfg)
        else:
            print(f"WARNING: classifier checkpoint {clf_path} missing; random init")
            degraded = True
            clf_params = jax.jit(stg.init)(
                jax.random.PRNGKey(1), jnp.zeros((1, num_frames, 24, 6))
            )

        return StgcnAdapter(stg), clf_params, degraded

    clf_path = os.path.join("assets", "actionrecognition", "humanact12_gru.tar")
    clf = MotionDiscriminator(72 + 3, 128, 2, num_actions)
    if os.path.exists(clf_path):
        import torch

        sd = torch.load(clf_path, map_location="cpu", weights_only=False)
        sd = sd.get("model", sd)
        clf_params = convert_motion_discriminator({k: v.numpy() for k, v in sd.items()})
    else:
        print(f"WARNING: classifier checkpoint {clf_path} missing; random init")
        degraded = True
        clf_params = jax.jit(clf.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, num_frames, 75)), jnp.array([num_frames])
        )
    return clf, clf_params, degraded


def build_feature_and_classifier(
    dataset_name: str, num_actions: int, num_frames: int, input_feats: int,
    classifier_path: str = "", chunk: int = 0,
) -> Tuple[Callable, object, dict, bool]:
    """(feature_input, clf, clf_params, degraded) with graceful degradation.

    humanact12's GRU classifier consumes SMPL xyz; when the SMPL asset is
    missing, fall back to classifying the raw rot6d features with a
    random-init GRU so the protocol still runs end-to-end — stamped
    degraded/non-comparable by every caller.

    `classifier_path` loads a SELF-TRAINED classifier (.npy from
    `train_evaluators --stage a2m_classifier`) instead of the converted
    reference checkpoint; the saved blob records the architecture
    (arch/hidden_size/hidden_layers) and the representation it was trained
    on (xyz / rot6d / raw) and the eval reconstructs the same pipeline.
    Functional (not random-init), but still non-comparable to the
    published tables, which use the reference's frozen classifier.
    """
    if classifier_path:
        from .classifiers import MotionDiscriminator
        from .train_evaluators import load_evaluator_params

        blob = load_evaluator_params(classifier_path)
        assert int(blob.get("num_actions", num_actions)) == num_actions, \
            (classifier_path, blob.get("num_actions"), num_actions)
        if blob.get("arch", "gru") == "stgcn":
            from .stgcn import STGCN, STGCNConfig

            clf = StgcnAdapter(STGCN(STGCNConfig(
                in_channels=int(blob["input_size"]),
                num_class=num_actions, layout="smpl")))
        else:
            clf = MotionDiscriminator(
                int(blob["input_size"]), int(blob.get("hidden_size", 128)),
                int(blob.get("hidden_layers", 2)), num_actions)
        if blob["feature"] in ("xyz", "rot6d"):
            feature_input = make_a2m_feature_input(
                dataset_name if blob["feature"] == "xyz" else "uestc",
                chunk=chunk)
        else:
            feature_input = lambda feats: feats  # noqa: E731
        return feature_input, clf, blob["params"], False

    clf, clf_params, degraded = build_a2m_classifier(
        dataset_name, num_actions, num_frames
    )
    try:
        return (make_a2m_feature_input(dataset_name, chunk=chunk), clf,
                clf_params, degraded)
    except FileNotFoundError as e:
        import jax
        import jax.numpy as jnp

        from .classifiers import MotionDiscriminator

        print(f"a2m eval: SMPL asset missing ({e}); degrading to "
              "raw-feature classifier (non-comparable)")
        clf = MotionDiscriminator(input_feats, 128, 2, num_actions)
        clf_params = jax.jit(clf.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, num_frames, input_feats)),
            jnp.array([num_frames]),
        )
        return (lambda feats: feats), clf, clf_params, True


def make_a2m_feature_input(dataset_name: str, chunk: int = 0) -> Callable:
    """feats_norm [B,T,150] -> classifier input (xyz flat or rot6d).

    `chunk` > 0: when a megabatch (whole eval epoch in one call, see
    make_a2m_loaders_factory) divides evenly, the SMPL forward runs as a
    `lax.scan`-style `lax.map` over chunks INSIDE one jitted program — the
    LBS vertex tensor ([chunk*T, 6890, 3]) stays bounded while the host
    still dispatches a single call.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if dataset_name == "uestc":
        def feature_input(feats_norm):
            r6 = feats_norm.reshape(feats_norm.shape[0], feats_norm.shape[1], 25, 6)
            return r6[:, :, :-1]  # rotations only, translation row dropped

        return feature_input

    from ..smpl import Rot2XYZConfig, SMPLModel, rot2xyz

    smpl = SMPLModel.load()
    r2x_cfg = Rot2XYZConfig(jointstype="smpl", vertstrans=True)

    def _xyz_flat(feats):
        joints = rot2xyz(
            smpl, feats.reshape(feats.shape[0], feats.shape[1], 25, 6), r2x_cfg
        )  # [B, T, 24, 3]
        return joints.reshape(joints.shape[0], joints.shape[1], -1)

    def _xyz_maybe_chunked(feats):
        B = feats.shape[0]
        if chunk and B > chunk and B % chunk == 0:
            fr = feats.reshape(B // chunk, chunk, *feats.shape[1:])
            out = jax.lax.map(_xyz_flat, fr)
            return out.reshape(B, *out.shape[2:])
        return _xyz_flat(feats)

    get_xyz = jax.jit(_xyz_maybe_chunked)

    def feature_input(feats_norm):
        # Stays a DEVICE array: the classifier consumes it directly and the
        # whole generate -> FK -> classify chain runs without host syncs.
        return get_xyz(jnp.asarray(feats_norm))

    return feature_input


def make_a2m_loaders_factory(
    dataset, generator, batch_size: int, num_frames: int,
    feature_input: Callable, max_batches: int = 0,
) -> Callable[[int], Dict[str, Iterable]]:
    """make_loaders(seed) -> {gen, gt, gt2} single-megabatch passes.

    Per seed: reshuffled GT pass, an independently-shuffled gt2 pass (the
    reference's FID sanity baseline, gru_eval.py:55-78), and generation over
    the GT prompts through the jitted sampler. max_batches>0 truncates each
    pass (eval-during-training uses a small budget, training_loop.py:277).

    Each pass is ONE megabatch (the whole eval epoch concatenated host-side):
    one H2D transfer, one sampler dispatch, one FK dispatch, one classifier
    dispatch per pass — ~7 device calls per seed instead of ~75. Round-3
    measurement (docs/BENCHMARKS.md) put the per-batch dispatch latency of
    the 75 ms-RTT dev tunnel at ~12 s/seed over the 29 s/seed sampling
    floor; amortizing the dispatches removes it. The epoch size is constant
    across seeds (drop_last), so every seed reuses one compiled program; the
    SMPL vertex tensor stays bounded via chunked FK inside the jitted call
    (make_a2m_feature_input(chunk=batch_size)). Host-side batch composition
    (shuffle order, per-clip frame sampling) is byte-identical to the
    per-batch protocol; only the noise-key granularity changes (one key per
    epoch instead of per batch) — a different but equidistributed draw.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data import BatchIterator
    from ..models.mdm import Conditioning

    def _epoch(seed_):
        xs, ls, ys, ms = [], [], [], []
        it = BatchIterator(dataset, batch_size, seed=seed_, infinite=False)
        for i, batch in enumerate(it):
            if max_batches and i >= max_batches:
                break
            xs.append(batch["x"])
            ls.append(np.asarray(batch["lengths"]))
            ys.append(np.asarray(batch["action"]))
            ms.append(np.asarray(batch["mask"]))
        return (np.concatenate(xs), np.concatenate(ls), np.concatenate(ys),
                np.concatenate(ms))

    def make_loaders(seed):
        key = jax.random.PRNGKey(seed)
        x1, l1, y1, m1 = _epoch(seed)
        x2, l2, y2, m2 = _epoch(seed + 1000)
        gt1 = [{"output_xyz": feature_input(x1), "lengths": l1, "y": y1}]
        gt2 = [{"output_xyz": feature_input(x2), "lengths": l2, "y": y2}]
        cond = Conditioning(
            frames_mask=jnp.asarray(m1), action=jnp.asarray(y1)
        )
        # Device-resident: no np.asarray between sampler, FK, and
        # classifier — the generate -> FK -> classify chain never syncs.
        feats = generator.sample_features(cond, len(y1), num_frames, key)
        genb = [{"output_xyz": feature_input(feats), "lengths": l1, "y": y1}]
        return {"gt": gt1, "gt2": gt2, "gen": genb}

    return make_loaders


def unconstrained_xyz_fn(num_frames: int = 60):
    """xyz decode for the UNCONSTRAINED protocol (reference
    eval/unconstrained/evaluate.py:57-110 feeds SMPL xyz): SMPL rot2xyz when
    the body-model asset exists, else the pseudo-joint fallback (first 72
    raw rotation features reshaped [B,T,24,3]) so the protocol still runs
    end to end. Returns (jitted fn feats->xyz [B,T,24,3], degraded: bool).
    Shared by cli/eval_unconstrained.py and the unconstrained_stgcn
    evaluator-training stage so both sides of the metric see the SAME
    joint decode."""
    import jax
    import jax.numpy as jnp  # noqa: F401  (used inside the jitted lambdas)

    from ..smpl import Rot2XYZConfig, SMPLModel, rot2xyz

    try:
        smpl = SMPLModel.load()
        r2x_cfg = Rot2XYZConfig(jointstype="smpl", vertstrans=True)
        return jax.jit(lambda feats: rot2xyz(
            smpl, feats.reshape(feats.shape[0], feats.shape[1], 25, 6),
            r2x_cfg)), False
    except FileNotFoundError:
        return jax.jit(lambda feats: feats[..., :72].reshape(
            feats.shape[0], feats.shape[1], 24, 3)), True
