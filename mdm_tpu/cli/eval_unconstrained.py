"""Unconstrained-generation evaluation CLI.

Reference: eval/eval_humanact12_uestc.py --unconstrained path +
eval/unconstrained/evaluate.py. Generates unconditioned HumanAct12 motions,
extracts the 15-joint openpose-style subset, runs the modified-STGCN feature
extractor, and reports FID / KID / precision-recall / diversity against the
ground-truth feature distribution.
"""
from __future__ import annotations

import json
import os


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data import BatchIterator, get_dataset
    from ..eval.harness_a2m import (
        UNCONSTRAINED_JOINT_SUBSET,
        evaluate_unconstrained_metrics,
    )
    from ..eval.stgcn import STGCN, STGCNConfig, convert_stgcn
    from ..models.mdm import Conditioning
    from ..sampling import GenerationConfig, MotionGenerator
    from ..train.checkpoints import find_resume_checkpoint, restore_params_only
    from ..utils.factory import create_model_and_schedule
    from ..utils.parser import evaluation_args

    args = evaluation_args(argv)
    args.unconstrained = True
    args.cond_mode = "no_cond"
    num_frames = 60
    dataset = get_dataset("humanact12", num_frames=num_frames,
                          data_root=args.data_dir or None)

    model, sched = create_model_and_schedule(args, dataset.num_actions)
    B = args.batch_size
    D = model.config.input_feats
    cond0 = Conditioning(frames_mask=jnp.ones((B, num_frames), bool))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, num_frames, D)),
        jnp.zeros((B,), jnp.int32), cond0,
    )
    ckpt = args.model_path
    if os.path.isdir(ckpt) and not os.path.basename(ckpt).startswith("ckpt_"):
        found = find_resume_checkpoint(ckpt)
        assert found
        ckpt = found[0]
    params = {"params": restore_params_only(
            ckpt, params["params"],
            # EMA only if the checkpoint was trained with it — the
            # model-group flag rides args.json (reference
            # model_util.py:118-122 use_avg semantics).
            use_ema=bool(getattr(args, "use_ema", False)))}

    from ..sampling import auto_mesh

    gen = MotionGenerator(
        model, params, sched, GenerationConfig(guidance_scale=1.0), "humanact12",
        mesh=auto_mesh(),
    )

    degraded = []
    from ..eval.a2m_setup import unconstrained_xyz_fn

    get_xyz, xyz_degraded = unconstrained_xyz_fn(num_frames)
    if xyz_degraded:
        # Without the SMPL asset there is no xyz decode; pseudo-joint
        # features keep the protocol running — stamped non-comparable.
        print("WARNING: SMPL asset missing; pseudo-joint features")
        degraded.append("no-smpl-asset")

    # STGCN feature extractor: converted reference checkpoint when present;
    # else a SELF-TRAINED modi-15 STGCN (--a2m_classifier_path, produced by
    # `train_evaluators --stage unconstrained_stgcn`) — functional metrics,
    # stamped non-comparable to the published tables; else random init.
    stg_cfg = STGCNConfig(in_channels=3, num_class=12, layout="openpose_modi15",
                          edge_importance=True)
    stgcn = STGCN(stg_cfg)
    clf_path = os.path.join("assets", "actionrecognition",
                            "humanact12_gru_modi_struct.pth.tar")
    self_trained = bool(getattr(args, "a2m_classifier_path", ""))
    if self_trained:
        from ..eval.train_evaluators import load_evaluator_params

        blob = load_evaluator_params(args.a2m_classifier_path)
        assert blob.get("arch") == "stgcn_modi15", (
            f"--a2m_classifier_path {args.a2m_classifier_path} is not an "
            f"unconstrained_stgcn evaluator (arch={blob.get('arch')!r}); "
            f"train one with `train_evaluators --stage unconstrained_stgcn`")
        stg_cfg = STGCNConfig(in_channels=3,
                              num_class=int(blob["num_actions"]),
                              layout="openpose_modi15", edge_importance=True)
        stgcn = STGCN(stg_cfg)
        stg_params = blob["params"]
    elif os.path.exists(clf_path):
        import torch

        sd = torch.load(clf_path, map_location="cpu", weights_only=False)
        sd = sd.get("model", sd)
        stg_params = convert_stgcn({k: v.numpy() for k, v in sd.items()}, stg_cfg)
    else:
        print(f"WARNING: {clf_path} missing; random STGCN features")
        degraded.append("random-init-stgcn-features")
        stg_params = jax.jit(stgcn.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, num_frames, 15, 3))
        )  # jitted: eager init through the tunnel is ~10x slower
    run_stgcn = jax.jit(lambda x: stgcn.apply(stg_params, x)["features"])

    def features_for(motions_xyz):
        # [B, T, 24, 3] -> openpose-15 subset, root-centered
        sub = motions_xyz[:, :, UNCONSTRAINED_JOINT_SUBSET]
        sub = sub - sub[:, :1, 8:9]  # center on mid-hip of first frame
        return np.asarray(run_stgcn(jnp.asarray(sub)))

    gt_feats, gen_feats = [], []
    key = jax.random.PRNGKey(args.seed)
    for batch in BatchIterator(dataset, B, seed=0, infinite=False):
        gt_xyz = np.asarray(get_xyz(jnp.asarray(batch["x"])))
        gt_feats.append(features_for(gt_xyz))
        key, sub = jax.random.split(key)
        feats = gen.sample_features(cond0, B, num_frames, sub)
        gen_xyz = np.asarray(get_xyz(feats))
        gen_feats.append(features_for(gen_xyz))

    metrics = evaluate_unconstrained_metrics(
        np.concatenate(gen_feats), np.concatenate(gt_feats),
        fast=(args.eval_mode == "debug"),
    )
    # Non-comparable to published tables when degraded OR when scoring with
    # a self-trained feature extractor (functional, different metric model).
    metrics["comparable"] = not degraded and not self_trained
    metrics["classifier"] = ("self-trained" if self_trained
                             else "random-init"
                             if "random-init-stgcn-features" in degraded
                             else "reference-frozen")
    if degraded:
        metrics["degraded_reasons"] = degraded
    out_path = os.path.join(os.path.dirname(ckpt), "eval_unconstrained.json")
    with open(out_path, "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":
    main()
