"""Action-to-motion evaluation CLI (HumanAct12 / UESTC).

Reference: eval/eval_humanact12_uestc.py. Per seed: build gen/gt/gt2
loaders (generation through the jitted sampler, xyz via the JAX SMPL
rot2xyz), run the frozen classifier (GRU for humanact12, STGCN for uestc),
summarize accuracy/FID/diversity/multimodality across seeds, dump yaml/json.
"""
from __future__ import annotations

import json
import os


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data import BatchIterator, get_dataset
    from ..eval.classifiers import MotionDiscriminator, convert_motion_discriminator
    from ..eval.harness_a2m import (
        A2MEvalConfig,
        A2MEvaluation,
        evaluate_multi_seed,
    )
    from ..models.mdm import Conditioning
    from ..sampling import GenerationConfig, MotionGenerator
    from ..smpl import Rot2XYZConfig, SMPLModel, rot2xyz
    from ..train.checkpoints import find_resume_checkpoint, restore_params_only
    from ..utils.factory import create_model_and_schedule
    from ..utils.parser import evaluation_args

    args = evaluation_args(argv)
    assert args.dataset in ("humanact12", "uestc")
    num_frames = 60
    dataset = get_dataset(args.dataset, num_frames=num_frames,
                          data_root=args.data_dir or None)
    num_actions = dataset.num_actions

    model, sched = create_model_and_schedule(args, num_actions)
    B = args.batch_size
    D = model.config.input_feats
    cond0 = Conditioning(
        frames_mask=jnp.ones((B, num_frames), bool),
        action=jnp.zeros((B,), jnp.int32),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, num_frames, D)),
        jnp.zeros((B,), jnp.int32), cond0,
    )
    ckpt = args.model_path
    if os.path.isdir(ckpt) and not os.path.basename(ckpt).startswith("ckpt_"):
        found = find_resume_checkpoint(ckpt)
        assert found
        ckpt = found[0]
    params = {"params": restore_params_only(ckpt, params["params"], use_ema=True)}

    gen = MotionGenerator(
        model, params, sched,
        GenerationConfig(guidance_scale=args.guidance_param), args.dataset,
    )

    smpl = SMPLModel.load()
    r2x_cfg = Rot2XYZConfig(jointstype="smpl", vertstrans=True)
    get_xyz = jax.jit(lambda feats: rot2xyz(smpl, feats.reshape(
        feats.shape[0], feats.shape[1], 25, 6), r2x_cfg))

    def xyz_flat(feats):
        joints = np.asarray(get_xyz(jnp.asarray(feats)))  # [B, T, 24, 3]
        return joints.reshape(joints.shape[0], joints.shape[1], -1)

    # UESTC's STGCN classifier consumes rot6d features (without the
    # translation row, stgcn_eval.py:58-60); HumanAct12's GRU consumes xyz.
    use_stgcn = args.dataset == "uestc"

    def feature_input(feats_norm):
        if use_stgcn:
            r6 = feats_norm.reshape(feats_norm.shape[0], feats_norm.shape[1], 25, 6)
            return r6[:, :, :-1]  # [B, T, 24, 6] rotations only
        return xyz_flat(feats_norm)

    def make_loaders(seed):
        key = jax.random.PRNGKey(seed)
        it = BatchIterator(dataset, B, seed=seed, infinite=False)
        gt1, gt2, genb = [], [], []
        it2 = BatchIterator(dataset, B, seed=seed + 1000, infinite=False)
        for batch in it:
            gt1.append({
                "output_xyz": feature_input(batch["x"]),
                "lengths": batch["lengths"], "y": batch["action"],
            })
            key, sub = jax.random.split(key)
            cond = Conditioning(
                frames_mask=jnp.asarray(batch["mask"]),
                action=jnp.asarray(batch["action"]),
            )
            feats = np.asarray(gen.sample_features(cond, len(batch["action"]), num_frames, sub))
            genb.append({
                "output_xyz": feature_input(feats),
                "lengths": batch["lengths"], "y": batch["action"],
            })
        for batch in it2:
            gt2.append({
                "output_xyz": feature_input(batch["x"]),
                "lengths": batch["lengths"], "y": batch["action"],
            })
        return {"gt": gt1, "gt2": gt2, "gen": genb}

    # Frozen classifier (converted reference checkpoint).
    if use_stgcn:
        from ..eval.stgcn import STGCN, STGCNConfig, convert_stgcn

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
            clf_params = jax.jit(stg.init)(
                jax.random.PRNGKey(1), jnp.zeros((1, num_frames, 24, 6))
            )

        class _StgcnAdapter:
            """Match MotionDiscriminator's (x, lengths) call signature."""

            def apply(self, params, x, lengths):
                return stg.apply(params, x)

        clf = _StgcnAdapter()
    else:
        clf_path = os.path.join("assets", "actionrecognition", "humanact12_gru.tar")
        clf = MotionDiscriminator(72 + 3, 128, 2, num_actions)
        if os.path.exists(clf_path):
            import torch

            sd = torch.load(clf_path, map_location="cpu", weights_only=False)
            sd = sd.get("model", sd)
            clf_params = convert_motion_discriminator(
                {k: v.numpy() for k, v in sd.items()}
            )
        else:
            print(f"WARNING: classifier checkpoint {clf_path} missing; random init")
            clf_params = jax.jit(clf.init)(
                jax.random.PRNGKey(1), jnp.zeros((1, num_frames, 75)), jnp.array([num_frames])
            )

    ev = A2MEvaluation(clf, clf_params, config=A2MEvalConfig(num_classes=num_actions))
    num_seeds = {"debug": 2}.get(args.eval_mode, 20)
    summary = evaluate_multi_seed(make_loaders, ev, num_seeds=num_seeds)

    out_path = os.path.join(os.path.dirname(ckpt), f"eval_a2m_{args.dataset}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
