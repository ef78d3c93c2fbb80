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


def resolve_action_map(dataset: str, data_dir):
    """Action name -> class index for the dataset (reference resolves names
    through the dataset's own class list: data_loaders/a2m/uestc.py:40-74
    reads info/action_classes.txt; humanact12 uses its fixed 12-name map)."""
    if dataset == "uestc":
        from ..data.a2m import uestc_action_classes

        return {name: i for i, name in
                uestc_action_classes(data_dir or "dataset/uestc").items()}
    from ..data.a2m import HUMANACT12_ACTIONS

    return {v: k for k, v in HUMANACT12_ACTIONS.items()}


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
    dataset_lengths = None
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
            if "lengths" in batch:
                # each sample's REAL length rides into results.npy so viz
                # and eval consumers can trim padding (reference
                # generate.py:175-191 all_lengths)
                dataset_lengths = np.asarray(batch["lengths"])[: args.num_samples]
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
        name_to_idx = resolve_action_map(args.dataset, args.data_dir)
        idxs = []
        for p in prompts:
            name = p[0] if isinstance(p, list) else p
            if isinstance(name, (int,)) or (isinstance(name, str) and name.isdigit()):
                idxs.append(int(name))
            elif isinstance(name, str) and name in name_to_idx:
                idxs.append(name_to_idx[name])
            else:
                known = ", ".join(list(name_to_idx)[:12])
                raise SystemExit(
                    f"unknown action {name!r} for dataset {args.dataset}; "
                    f"pass one of [{known}, ...] or a numeric class index"
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
    # Dataset prompts condition the model on each clip's REAL length via the
    # frame mask (reference collate builds y['mask'] from y['lengths'],
    # data_loaders/tensors.py:3-6,48 — sampling sees it through model_kwargs);
    # synthetic prompts fill n_frames. The AR/prefix path manages its own
    # per-chunk masks inside the sampler.
    if (dataset_lengths is not None and not args.autoregressive
            and not model.config.is_prefix_comp):
        dataset_lengths = np.minimum(np.asarray(dataset_lengths), n_frames)
        frames_mask0 = jnp.arange(n_frames)[None, :] < jnp.asarray(
            dataset_lengths[:B]
        )[:, None]
    else:
        frames_mask0 = jnp.ones((B, n_frames), bool)
    cond0 = Conditioning(
        frames_mask=frames_mask0,
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
        params = {"params": restore_params_only(
            ckpt, params["params"],
            # EMA only if the checkpoint was trained with it — the
            # model-group flag rides args.json (reference
            # model_util.py:118-122 use_avg semantics).
            use_ema=bool(getattr(args, "use_ema", False)))}
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
        if "text" in model.config.cond_mode:
            # No encoder assets for a text-conditioned model: CFG against
            # the zero embedding is just 2x-cost unconditioned sampling.
            print(
                "WARNING: text encoder unavailable "
                f"({args.text_encoder_type!r}); sampling unconditioned "
                "(guidance 1) — prompts only label the outputs"
            )
            args.guidance_param = 1.0

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

    # Per-sample REAL lengths (reference generate.py:175-191): dataset
    # prompts keep each clip's length; synthetic prompts fill n_frames; the
    # prefix/AR path stores the actually-generated frame count (:181-183).
    motion_arr = np.concatenate(all_motions, axis=0)
    if model.config.is_prefix_comp or args.autoregressive:
        lengths = np.full(B, motion_arr.shape[1])
    elif dataset_lengths is not None:
        lengths = np.minimum(np.asarray(dataset_lengths[:B]), motion_arr.shape[1])
    else:
        lengths = np.full(B, n_frames)
    all_lengths = np.tile(lengths, args.num_repetitions)

    npy_path = os.path.join(out_dir, "results.npy")
    np.save(
        npy_path,
        {
            "motion": motion_arr,
            "text": all_text,
            "lengths": all_lengths,
            "num_samples": B,
            "num_repetitions": args.num_repetitions,
        },
    )
    with open(npy_path.replace(".npy", ".txt"), "w") as f:
        f.write("\n".join(all_text))
    with open(npy_path.replace(".npy", "_len.txt"), "w") as f:
        f.write("\n".join(str(int(l)) for l in all_lengths))
    print(f"saved {npy_path}")

    if os.environ.get("MDM_TPU_NO_RENDER"):
        return
    try:
        from ..visualize.plot_script import plot_3d_motion, plot_3d_motion_grid

        max_length = int(all_lengths.max())

        def cell(si, ri):
            m = motion_arr[ri * B + si][:max_length].copy()
            L = int(all_lengths[ri * B + si])
            if m.shape[0] > L:
                # freeze the last real frame so all cells share a duration
                # (reference generate.py:236-238)
                m[L:-1] = m[L - 1]
            return m

        # Prefix-completion context frames render in the GT (blue) color
        # scheme so a viewer can tell given motion from generated motion
        # (reference generate.py:241-244; AR strips the prefix, so no marks).
        gt_frames = (
            np.arange(model.config.context_len)
            if model.config.is_prefix_comp and not args.autoregressive
            else ()
        )
        for ri in range(args.num_repetitions):
            for si in range(B):
                path = os.path.join(out_dir, f"sample{si:02d}_rep{ri:02d}.mp4")
                path = plot_3d_motion(path, cell(si, ri), title=all_text[ri * B + si],
                                      dataset=args.dataset, fps=fps,
                                      gt_frames=gt_frames)
                print(f"rendered {path}")
        # Tiled grid, 3 samples (rows) x all repetitions (columns) per file
        # (reference save_multiple_samples, generate.py:253-280). Cells are
        # re-animated rather than composited from the per-sample mp4s: the
        # reference composites with moviepy/ffmpeg, which this build
        # deliberately does not require — the grid costs one extra render
        # pass of the same frames (host-side, offline viz only).
        for s0 in range(0, B, 3):
            s1 = min(s0 + 3, B)
            cells, titles = [], []
            for si in range(s0, s1):
                for ri in range(args.num_repetitions):
                    cells.append(cell(si, ri))
                    titles.append(all_text[ri * B + si])
            grid = os.path.join(out_dir, f"samples_{s0:02d}_to_{s1 - 1:02d}.mp4")
            grid = plot_3d_motion_grid(
                grid, cells, titles, ncols=args.num_repetitions,
                dataset=args.dataset, fps=fps, gt_frames=gt_frames,
            )
            print(f"rendered {grid}")
    except Exception as e:
        print(f"(skipping video render: {e})")


if __name__ == "__main__":
    main()
