"""Editing entry point (inpainting): `python -m mdm_tpu.cli.edit`.

Reference: sample/edit.py. Modes: in_between (temporal mask: keep prefix
<= prefix_end*len and suffix >= suffix_start*len) and upper_body (keep
lower-body feature dims). The mask is applied to the x0 prediction inside
every diffusion step.
"""
from __future__ import annotations

import os

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..data import get_dataset_loader
    from ..models.mdm import Conditioning
    from ..sampling import (
        GenerationConfig,
        MotionGenerator,
        in_between_mask,
        upper_body_mask,
    )
    from ..sampling.text import make_text_embedder
    from ..train.checkpoints import find_resume_checkpoint, restore_params_only
    from ..utils.factory import create_model_and_schedule
    from ..utils.parser import edit_args

    args = edit_args(argv)
    max_frames = 196 if args.dataset in ("humanml", "kit") else 60

    data = get_dataset_loader(
        args.dataset, args.num_samples, num_frames=max_frames, split="test",
        hml_mode="train", data_root=args.data_dir or None,
    )
    batch = next(iter(data))
    gt = batch["x"][: args.num_samples]
    lengths = batch["lengths"][: args.num_samples]
    B, T, D = gt.shape

    model, sched = create_model_and_schedule(args)
    cond0 = Conditioning(
        frames_mask=jnp.asarray(batch["mask"][:B]),
        text_embed=jnp.zeros((B, model.config.text_dim)),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(gt), jnp.zeros((B,), jnp.int32), cond0
    )
    ckpt = args.model_path
    if os.path.isdir(ckpt) and not os.path.basename(ckpt).startswith("ckpt_"):
        found = find_resume_checkpoint(ckpt)
        assert found, f"no checkpoint under {ckpt}"
        ckpt = found[0]
    if os.path.exists(ckpt):
        params = {"params": restore_params_only(
            ckpt, params["params"],
            # EMA only if the checkpoint was trained with it — the
            # model-group flag rides args.json (reference
            # model_util.py:118-122 use_avg semantics).
            use_ema=bool(getattr(args, "use_ema", False)))}

    if args.edit_mode == "in_between":
        mask = in_between_mask(lengths, T, D, args.prefix_end, args.suffix_start)
    else:
        mask = upper_body_mask(T, B)

    # Text conditioning, matching reference edit.py:69-72: --text_condition
    # replaces every caption, and empty text forces guidance 0
    # (unconditioned in-betweening is the reference default).
    # --use_dataset_captions (beyond-reference) instead conditions each
    # sample on its own dataset caption at the requested guidance.
    guidance = args.guidance_param
    cond = cond0
    texts = None
    if args.text_condition:
        texts = [args.text_condition] * B
    elif args.use_dataset_captions and batch.get("text"):
        texts = list(batch["text"][:B])
    if texts is not None:
        embedder = make_text_embedder(args.text_encoder_type)
        if embedder is not None:
            cond = cond0.replace(
                **{k: jnp.asarray(v) for k, v in embedder(texts).items()}
            )
        else:
            # No encoder assets: the captions CANNOT condition the model, so
            # running CFG at full scale would just pay 2x for the difference
            # of two unconditioned passes against a zero embedding. Fall to
            # guidance 0 loudly instead of recording captions that were
            # never used.
            print(
                "WARNING: text encoder unavailable "
                f"({args.text_encoder_type!r}); editing unconditioned "
                "(guidance 0) — requested captions ignored"
            )
            texts = None
            guidance = 0.0
    else:
        guidance = 0.0

    from ..sampling.pipeline import dataset_norm_stats

    gen = MotionGenerator(
        model, params, sched,
        GenerationConfig(guidance_scale=guidance, sampler=args.sampler),
        args.dataset,
        norm_stats=dataset_norm_stats(args.data_dir or None),
    )
    feats = gen.sample_features(
        cond, B, T, jax.random.PRNGKey(args.seed),
        inpainting_mask=jnp.asarray(mask), inpainted_motion=jnp.asarray(gt),
    )
    joints = np.asarray(gen.features_to_joints(feats)) if gen.mean is not None else np.asarray(feats)

    out_dir = args.output_dir or os.path.join(
        os.path.dirname(args.model_path) or ".", f"edit_{args.edit_mode}_seed{args.seed}"
    )
    os.makedirs(out_dir, exist_ok=True)
    np.save(
        os.path.join(out_dir, "results.npy"),
        {"motion": joints, "gt": np.asarray(gt), "mask": mask,
         "edit_mode": args.edit_mode, "lengths": lengths,
         "text": texts if texts is not None else [""] * B},
    )
    print(f"saved {os.path.join(out_dir, 'results.npy')}")


if __name__ == "__main__":
    main()
