"""Generation entry point: `python -m mdm_tpu.cli.generate --model_path ...`.

Reference: sample/generate.py. Prompt sources: --text_prompt, --input_text
file, --action_name/--action_file, --dynamic_text_path (AR per-chunk), or
dataset test split. Outputs results.npy (+ stick-figure mp4s when matplotlib
/ffmpeg are available).
"""
from __future__ import annotations

import os

import numpy as np


def load_prompts(args):
    if args.text_prompt:
        return [args.text_prompt] * args.num_samples, False
    if args.input_text:
        with open(args.input_text) as f:
            lines = [line.strip() for line in f if line.strip()]
        return lines, False
    if args.dynamic_text_path:
        with open(args.dynamic_text_path) as f:
            chunks = [line.strip() for line in f if line.strip()]
        return [chunks] * args.num_samples, True
    if args.action_name:
        return [args.action_name] * args.num_samples, False
    if args.action_file:
        with open(args.action_file) as f:
            return [line.strip() for line in f if line.strip()], False
    return None, False


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..models.mdm import Conditioning
    from ..sampling import GenerationConfig, MotionGenerator
    from ..sampling.text import make_text_embedder
    from ..train.checkpoints import find_resume_checkpoint, restore_params_only
    from ..utils.factory import create_model_and_schedule, create_schedule
    from ..utils.parser import generate_args

    args = generate_args(argv)
    fps = 12.5 if args.dataset == "kit" else 20
    max_frames = 196 if args.dataset in ("humanml", "kit") else 60
    n_frames = min(max_frames, int(args.motion_length * fps))

    # dataset -> action-class count (reference model_util.py:24-71)
    num_actions = {"humanact12": 12, "uestc": 40}.get(args.dataset, 1)
    model, _ = create_model_and_schedule(args, num_actions)
    sched = create_schedule(args, timestep_respacing=None)

    prompts, dynamic = load_prompts(args)
    dataset_prefix = None
    dataset_actions = None
    if prompts is None:
        # Prompt source of last resort: the dataset's test split
        # (reference generate.py uses hml_mode='text_only'; 'train' for AR
        # prefix sampling).
        try:
            from ..data import get_dataset_loader

            loader = get_dataset_loader(
                args.dataset, args.num_samples, num_frames=max_frames,
                split="test", hml_mode="train", data_root=args.data_dir or None,
                fixed_len=(model.config.context_len + model.config.pred_len)
                if args.autoregressive else 0,
                pred_len=model.config.pred_len if args.autoregressive else 0,
            )
            batch = next(iter(loader))
            prompts = list(
                batch.get("text", batch.get("action_text", []))
            )[: args.num_samples]
            if "action" in batch:  # a2m fallback: indices come with the batch
                dataset_actions = np.asarray(batch["action"])[: args.num_samples]
            if args.autoregressive and "prefix" in batch:
                dataset_prefix = batch["prefix"][: args.num_samples]
        except Exception as e:
            print(f"(dataset prompts unavailable: {e})")
            prompts = ["a person walks forward"] * args.num_samples
    B = min(len(prompts), args.num_samples) or args.num_samples
    prompts = prompts[:B]

    # Action-conditioned models: prompts are action names/indices -> the
    # EmbedAction table index (reference generate.py:66-74,100-119 builds
    # y['action'] from the dataset's action mapping).
    action_idx = None
    if "action" in model.config.cond_mode and dataset_actions is not None:
        action_idx = jnp.asarray(dataset_actions[:B], jnp.int32)
    elif "action" in model.config.cond_mode:
        from ..data.a2m import HUMANACT12_ACTIONS

        name_to_idx = {v: k for k, v in HUMANACT12_ACTIONS.items()}
        idxs = []
        for p in prompts:
            name = p[0] if isinstance(p, list) else p
            if isinstance(name, (int,)) or (isinstance(name, str) and name.isdigit()):
                idxs.append(int(name))
            elif isinstance(name, str) and name in name_to_idx:
                idxs.append(name_to_idx[name])
            else:
                raise SystemExit(
                    f"unknown action {name!r}; pass a HumanAct12 action name "
                    f"({', '.join(HUMANACT12_ACTIONS.values())}) or a numeric "
                    f"class index"
                )
        action_idx = jnp.asarray(idxs, jnp.int32)
    if dynamic:
        assert args.autoregressive, "--dynamic_text_path requires --autoregressive"
        # each chunk prompt drives exactly one prediction window
        # (reference generate.py:65)
        n_frames = len(prompts[0]) * model.config.pred_len

    # Init + load params.
    prefix0 = None
    if model.config.is_prefix_comp:
        if dataset_prefix is not None:
            prefix0 = jnp.asarray(dataset_prefix)
        else:
            prefix0 = jnp.zeros((B, model.config.context_len, model.config.input_feats))
    cond0 = Conditioning(
        frames_mask=jnp.ones((B, n_frames), bool),
        text_embed=(jnp.zeros((B, model.config.text_dim))
                    if "text" in model.config.cond_mode else None),
        action=action_idx,
        prefix=prefix0,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((B, n_frames if not model.config.is_prefix_comp else model.config.pred_len,
                   model.config.input_feats)),
        jnp.zeros((B,), jnp.int32),
        cond0,
    )
    ckpt = args.model_path
    if os.path.isdir(ckpt) and not os.path.basename(ckpt).startswith("ckpt_"):
        found = find_resume_checkpoint(ckpt)
        assert found, f"no checkpoint under {ckpt}"
        ckpt = found[0]
    if os.path.exists(ckpt):
        params = {"params": restore_params_only(ckpt, params["params"], use_ema=True)}
        print(f"loaded checkpoint {ckpt}")
    else:
        print("WARNING: model_path missing; sampling with random weights")

    embedder = make_text_embedder(args.text_encoder_type)
    per_chunk_cond = None
    if embedder is not None:
        if dynamic:
            # One prompt per autoregressive prediction window (reference
            # generate.py:59-65,134-142 + sampler_util.py:41-81): embed each
            # chunk once, swap the text conditioning per chunk.
            chunks = prompts[0]
            chunk_embeds = [embedder([c] * B) for c in chunks]
            cond = cond0.replace(
                **{k: jnp.asarray(v) for k, v in chunk_embeds[0].items()}
            )

            def per_chunk_cond(i, c):
                e = chunk_embeds[min(i, len(chunk_embeds) - 1)]
                return c.replace(**{k: jnp.asarray(v) for k, v in e.items()})
        else:
            flat_prompts = [p[0] if isinstance(p, list) else p for p in prompts]
            embeds = embedder(flat_prompts)
            cond = cond0.replace(**{k: jnp.asarray(v) for k, v in embeds.items()})
    else:
        cond = cond0

    from ..sampling.pipeline import dataset_norm_stats

    gen = MotionGenerator(
        model, params, sched,
        GenerationConfig(
            guidance_scale=args.guidance_param,
            sampler=args.sampler,
            cfg_cache_interval=args.cfg_cache_interval,
            autoregressive=args.autoregressive,
            autoregressive_include_prefix=args.autoregressive_include_prefix,
            context_len=model.config.context_len,
            pred_len=model.config.pred_len,
        ),
        args.dataset,
        norm_stats=dataset_norm_stats(args.data_dir or None),
    )

    all_motions, all_text = [], []
    key = jax.random.PRNGKey(args.seed)
    for rep in range(args.num_repetitions):
        key, sub = jax.random.split(key)
        if per_chunk_cond is not None:
            feats = gen.sample_autoregressive(
                cond, B, sub, required_frames=n_frames,
                per_chunk_cond=per_chunk_cond,
            )
            out = {"features": feats}
            if gen.mean is not None:
                out["joints"] = gen.features_to_joints(feats)
        else:
            out = gen.generate(cond, B, n_frames, sub)
        joints = np.asarray(out.get("joints", out["features"]))
        all_motions.append(joints)
        all_text += [p if isinstance(p, str) else " | ".join(p) for p in prompts]

    out_dir = args.output_dir or os.path.join(
        os.path.dirname(args.model_path) or ".", f"samples_seed{args.seed}"
    )
    os.makedirs(out_dir, exist_ok=True)
    npy_path = os.path.join(out_dir, "results.npy")
    np.save(
        npy_path,
        {
            "motion": np.concatenate(all_motions, axis=0),
            "text": all_text,
            "lengths": np.full(B * args.num_repetitions, n_frames),
            "num_samples": B,
            "num_repetitions": args.num_repetitions,
        },
    )
    with open(npy_path.replace(".npy", ".txt"), "w") as f:
        f.write("\n".join(all_text))
    print(f"saved {npy_path}")

    if os.environ.get("MDM_TPU_NO_RENDER"):
        return
    try:
        from ..visualize.plot_script import plot_3d_motion

        for i in range(min(B, 3)):
            path = os.path.join(out_dir, f"sample{i:02d}.mp4")
            plot_3d_motion(path, all_motions[0][i], title=all_text[i],
                           dataset=args.dataset, fps=fps)
            print(f"rendered {path}")
    except Exception as e:
        print(f"(skipping video render: {e})")


if __name__ == "__main__":
    main()
