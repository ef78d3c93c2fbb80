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

    from ..data import get_dataset
    from ..eval.a2m_setup import (
        build_feature_and_classifier,
        make_a2m_loaders_factory,
    )
    from ..eval.harness_a2m import (
        A2MEvalConfig,
        A2MEvaluation,
        evaluate_multi_seed,
    )
    from ..models.mdm import Conditioning
    from ..sampling import GenerationConfig, MotionGenerator
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
    params = {"params": restore_params_only(
            ckpt, params["params"],
            # EMA only if the checkpoint was trained with it — the
            # model-group flag rides args.json (reference
            # model_util.py:118-122 use_avg semantics).
            use_ema=bool(getattr(args, "use_ema", False)))}

    from ..sampling import auto_mesh

    gen = MotionGenerator(
        model, params, sched,
        GenerationConfig(guidance_scale=args.guidance_param), args.dataset,
        mesh=auto_mesh(),
    )

    # UESTC's STGCN classifier consumes rot6d features (without the
    # translation row, stgcn_eval.py:58-60); HumanAct12's GRU consumes xyz
    # (degrades to raw features when the SMPL asset is absent).
    feature_input, clf, clf_params, degraded = build_feature_and_classifier(
        args.dataset, num_actions, num_frames, model.config.input_feats,
        classifier_path=getattr(args, "a2m_classifier_path", ""),
        chunk=B,  # bound the SMPL vertex tensor inside megabatch FK
    )
    self_trained = bool(getattr(args, "a2m_classifier_path", ""))
    make_loaders = make_a2m_loaders_factory(
        dataset, gen, B, num_frames, feature_input
    )

    ev = A2MEvaluation(clf, clf_params, config=A2MEvalConfig(num_classes=num_actions))
    num_seeds = getattr(args, "replications", 0) or {"debug": 2}.get(args.eval_mode, 20)
    summary = evaluate_multi_seed(make_loaders, ev, num_seeds=num_seeds)
    # Stamp runs that don't use the reference's frozen classifier as
    # non-comparable to the published tables: random-init (degraded) or
    # self-trained (functional, but a different metric model).
    summary["comparable"] = not degraded and not self_trained
    summary["classifier"] = ("self-trained" if self_trained
                             else "random-init" if degraded
                             else "reference-frozen")
    if degraded:
        summary["degraded_reasons"] = ["random-init-a2m-classifier"]

    out_path = os.path.join(os.path.dirname(ckpt), f"eval_a2m_{args.dataset}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
