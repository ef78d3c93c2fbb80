"""Training entry point: `python -m mdm_tpu.cli.train --save_dir ...`.

Reference: train/train_mdm.py. Differences are TPU-native: mesh created up
front (pure DP over all visible chips), the whole optimizer step is one XLA
program, checkpoints are orbax.
"""
from __future__ import annotations

import os
import sys

import jax
import numpy as np


def main(argv=None):
    from ..data import get_dataset_loader
    from ..models.mdm import Conditioning
    from ..parallel import make_mesh_for_batch
    from ..parallel.multihost import is_primary, maybe_initialize_distributed, replicate

    # Multi-host activation (MDM_TPU_COORDINATOR / MDM_TPU_MULTIHOST=auto):
    # must precede the first backend use so the global device view exists
    # before the mesh is built. No-op single-process.
    maybe_initialize_distributed()
    from ..train import (
        LoopConfig,
        OptimConfig,
        TrainLoop,
        TrainStepConfig,
        create_train_state,
        make_train_step,
    )
    from ..train.platforms import get_platform
    from ..utils.factory import create_loss_config, create_model_and_schedule
    from ..utils.parser import train_args

    args = train_args(argv)
    if os.path.exists(args.save_dir) and os.listdir(args.save_dir) and not args.overwrite:
        if not any(f.startswith("ckpt_") for f in os.listdir(args.save_dir)):
            raise FileExistsError(
                f"save_dir {args.save_dir} exists (use --overwrite or resume)"
            )

    make_mesh_for_batch(args.batch_size)
    num_frames = 196 if args.dataset in ("humanml", "kit") else args.num_frames
    import jax

    # Multi-host: each process builds ONLY its row range of every global
    # batch (identical global order on all hosts — batches are pure
    # functions of seed/epoch/position); shard_batch assembles the global
    # array from the local shards. Without this, every host would feed the
    # same full batch as if it were a local shard (duplicated rows).
    shard = ((jax.process_index(), jax.process_count())
             if jax.process_count() > 1 else None)
    data = get_dataset_loader(
        args.dataset, args.batch_size, num_frames=num_frames,
        data_root=args.data_dir or None,
        fixed_len=args.context_len + args.pred_len,
        pred_len=args.pred_len,
        shard=shard,
    )
    num_actions = getattr(data.dataset, "num_actions", 1)

    # Text embedding happens on host once per batch (frozen encoder). The
    # embedder is resolved BEFORE model creation: when CLIP/BERT assets are
    # absent we fall back to the deterministic hash embedder and record
    # `text_encoder_type=hash` in args.json, so generate/edit rebuild the
    # identical embedder and captions genuinely condition the trained model
    # (the reference always has the encoder importable, model/mdm.py:140;
    # asset-free environments are ours to handle coherently).
    text_embedder = None
    if args.cond_mode == "text":
        from ..sampling.text import make_text_embedder

        text_embedder = make_text_embedder(args.text_encoder_type)
        if text_embedder is None:
            print(
                "WARNING: text encoder assets unavailable "
                f"({args.text_encoder_type!r}); training on deterministic "
                "hash embeddings (text_encoder_type=hash recorded in "
                "args.json) — NOT semantically meaningful, smoke/dev only"
            )
            args.text_encoder_type = "hash"
            text_embedder = make_text_embedder("hash")

    model, sched = create_model_and_schedule(args, num_actions)
    if text_embedder is not None:
        data.text_embedder = text_embedder

    target_loss_builder = None
    target_cond_fn = None
    goal_modifier = None
    if getattr(args, "lambda_target_loc", 0.0) > 0 and args.dataset == "humanml":
        from ..train.goal_cond import (
            goal_cond_modifier,
            make_target_cond_fn,
            make_target_loss_builder,
        )

        mean, std = data.dataset.mean, data.dataset.std
        target_loss_builder = make_target_loss_builder(mean, std)
        target_cond_fn = make_target_cond_fn(mean, std)
        goal_rng = np.random.default_rng(args.seed + 1)

        def goal_modifier(b):
            # compute_target=False: GT target extraction happens inside the
            # jitted step (no per-batch host->device round-trip).
            return goal_cond_modifier(
                b, goal_rng, mean, std,
                force_joints=args.target_joint_names or None,
                compute_target=False,
            )

    # Init params from one example batch.
    batch = next(iter(data))
    if goal_modifier is not None:
        batch = goal_modifier(batch)
    cond = batch_to_conditioning(batch, model.config)
    import jax.numpy as jnp

    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(batch["x"]),
        jnp.zeros((batch["x"].shape[0],), jnp.int32),
        cond,
    )["params"]
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f"model params: {n_params/1e6:.2f}M")

    config = TrainStepConfig(
        loss=create_loss_config(args),
        optim=OptimConfig(
            lr=args.lr, weight_decay=args.weight_decay,
            adam_beta2=args.adam_beta2, lr_anneal_steps=args.lr_anneal_steps,
            ema_decay=args.avg_model_beta, use_ema=args.use_ema,
        ),
        cond_mask_prob=args.cond_mask_prob,
        schedule_sampler=getattr(args, "schedule_sampler", "uniform"),
    )

    # Geometric losses (rcxyz / vel_rcxyz / fc) decode rot6d -> joints via the
    # differentiable SMPL layer inside the loss graph (reference
    # gaussian_diffusion.py:1241-1347).
    get_xyz = None
    if (args.lambda_rcxyz > 0 or args.lambda_fc > 0) and args.dataset in (
        "humanact12", "uestc",
    ):
        from ..smpl import Rot2XYZConfig, SMPLModel, rot2xyz

        smpl_model = SMPLModel.load()
        r2x_cfg = Rot2XYZConfig(jointstype="smpl", vertstrans=False)

        def get_xyz(feats):
            r6 = feats.reshape(feats.shape[0], feats.shape[1], 25, 6)
            return rot2xyz(smpl_model, r6, r2x_cfg)

    step = make_train_step(
        model.apply, sched, config, get_xyz=get_xyz,
        target_loss_builder=target_loss_builder,
        target_cond_fn=target_cond_fn if target_loss_builder else None,
    )
    if config.schedule_sampler == "loss-second-moment":
        # The loss-aware step threads a sampler-state (per-timestep loss
        # ring buffer, replicated) alongside the TrainState; adapt it to
        # TrainLoop's (state, batch, key) -> (state, metrics) contract.
        from ..train.resample import LossAwareState

        sampler_box = {"s": replicate(LossAwareState.create(sched.num_timesteps))}
        inner_step = step

        def step(state, batch, key):  # noqa: F811
            state, metrics, sampler_box["s"] = inner_step(
                state, batch, key, sampler_box["s"]
            )
            return state, metrics

    # Multi-host: params/opt-state were built process-locally (identical on
    # every process — deterministic init); re-home them as global replicated
    # arrays so the globally-sharded jitted step accepts them. No-op
    # single-process.
    state = replicate(create_train_state(params, config.optim))

    # File-writing platforms (TB/WandB/ClearML) belong to process 0 only.
    platform = get_platform(
        args.train_platform_type if is_primary() else "NoPlatform",
        args.save_dir,
    )

    gen_fn = None
    if args.gen_during_training:
        gen_fn = make_gen_during_training(args, model, data, text_embedder)
    eval_fn = None
    if args.eval_during_training and args.dataset in ("humanml", "kit"):
        eval_fn = make_eval_during_training(args, model, text_embedder)
    elif args.eval_during_training and args.dataset in ("humanact12", "uestc"):
        eval_fn = make_a2m_eval_during_training(args, model, data.dataset, num_frames)

    batches = wrap_batches(data, model.config, goal_modifier)
    if getattr(args, "cache_batches", 0) > 0:
        from ..data.loader import cache_device_batches
        from ..parallel import shard_batch

        batches = cache_device_batches(batches, args.cache_batches,
                                       put=shard_batch)

    loop = TrainLoop(
        step,
        state,
        batches,
        LoopConfig(
            save_dir=args.save_dir, num_steps=args.num_steps,
            log_interval=args.log_interval, save_interval=args.save_interval,
            profile_trace_dir=args.profile_trace_dir,
            eval_during_training=args.eval_during_training,
            gen_during_training=args.gen_during_training,
            resume_checkpoint=args.resume_checkpoint,
        ),
        args=vars(args),
        platform=platform,
        gen_fn=gen_fn,
        eval_fn=eval_fn,
        rng_seed=args.seed,
    )
    loop.run()
    platform.close()


def make_eval_during_training(args, model, text_embedder):
    """Short t2m eval pass per checkpoint (reference training_loop.py:252-289).

    Requires the frozen evaluator checkpoint (t2m/text_mot_match/model/
    finest.tar); degrades to a no-op with a warning when the asset is absent.
    """
    import glob
    import os

    evaluator_dir = getattr(args, "evaluator_dir", ".") or "."
    ckpt = os.path.join(
        evaluator_dir,
        "t2m" if args.dataset == "humanml" else args.dataset,
        "text_mot_match", "model", "finest.tar",
    )
    if not glob.glob(os.path.splitext(ckpt)[0] + ".*"):
        print(f"eval_during_training: evaluator checkpoint {ckpt} missing; skipping")
        return None

    # Cache across checkpoints: the GT batches are deterministic and the
    # MotionGenerator takes params as traced jit args, so both are built on
    # the first eval and reused — rebuilding per call would recompile the
    # full sampler at every save_interval.
    cache = {}

    def eval_fn(state, step):
        import numpy as np

        from ..data import BatchIterator, WordVectorizer, get_dataset
        from ..diffusion import Schedule
        from ..eval import EvalConfig, EvaluatorWrapper, GeneratedMotionLoader, evaluation
        from ..sampling import GenerationConfig, MotionGenerator

        if not cache:
            glove_dir = "glove"
            w_vec = None
            if os.path.exists(os.path.join(glove_dir, "our_vab_data.npy")):
                w_vec = WordVectorizer(glove_dir, "our_vab")
            dataset = get_dataset(
                args.dataset, split=args.eval_split, hml_mode="eval",
                data_root=args.data_dir or None,
            )
            dataset.w_vectorizer = w_vec
            gt_batches = []
            it = BatchIterator(dataset, args.eval_batch_size, seed=0, infinite=False)
            for i, b in enumerate(it):
                if (i + 1) * args.eval_batch_size > args.eval_num_samples:
                    break
                gt_batches.append(b)
            sched = Schedule.create(args.noise_schedule, args.diffusion_steps)
            cache["gt_batches"] = gt_batches
            cache["gen"] = MotionGenerator(
                model, None, sched,
                GenerationConfig(guidance_scale=args.gen_guidance_param),
                args.dataset,
            )
            # Built once too: constructing it per call re-reads the frozen
            # checkpoint AND re-jits both embedder networks every
            # save_interval (per-instance jit of bound methods never hits
            # the trace cache).
            cache["wrapper"] = EvaluatorWrapper(
                args.dataset, checkpoints_dir=evaluator_dir
            )
        gt_batches = cache["gt_batches"]
        gen = cache["gen"]
        wrapper = cache["wrapper"]
        gen.params = {
            "params": state.ema_params if state.ema_params is not None else state.params
        }

        def embed(texts):
            if text_embedder is None:
                return {"text_embed": np.zeros((len(texts), model.config.text_dim), np.float32)}
            return text_embedder(texts)

        summary = evaluation(
            wrapper,
            gt_loader_fn=lambda: iter(gt_batches),
            eval_motion_loader_fns={
                "vald": lambda rep: GeneratedMotionLoader(gen, gt_batches, embed, seed=rep)
            },
            config=EvalConfig(replication_times=args.eval_rep_times),
        )
        flat = {}
        for metric, d in summary.items():
            for name, v in d.items():
                mean = np.asarray(v["mean"]).ravel()
                flat[f"{metric}_{name}"] = float(mean[0]) if mean.size else float("nan")
        return flat

    return eval_fn


def make_a2m_eval_during_training(args, model, dataset, num_frames):
    """Action-dataset eval pass per checkpoint: accuracy/FID/diversity/MM
    via the frozen GRU (HumanAct12) / STGCN (UESTC) classifier, matching
    the reference's in-training a2m eval (train/training_loop.py:275-286).

    Runs eval_rep_times seeds over a small per-seed budget
    (eval_num_samples), reports flattened Eval-group scalars.
    """
    import numpy as np

    from ..diffusion import Schedule
    from ..eval.a2m_setup import (
        build_feature_and_classifier,
        make_a2m_loaders_factory,
    )
    from ..eval.harness_a2m import A2MEvalConfig, A2MEvaluation, evaluate_multi_seed
    from ..sampling import GenerationConfig, MotionGenerator

    num_actions = getattr(dataset, "num_actions", 1)
    feature_input, clf, clf_params, degraded = build_feature_and_classifier(
        args.dataset, num_actions, num_frames, model.config.input_feats,
        chunk=args.eval_batch_size,
    )
    max_batches = max(1, args.eval_num_samples // max(1, args.eval_batch_size))

    # Built ONCE: MotionGenerator passes params as traced jit args, so one
    # compilation serves every checkpoint — rebuilding it per eval_fn call
    # would recompile the full sampler at every save_interval.
    sched = Schedule.create(args.noise_schedule, args.diffusion_steps)
    gen = MotionGenerator(
        model, None, sched,
        # reference in-training a2m eval uses guidance 1 (training_loop.py:277)
        GenerationConfig(guidance_scale=1.0), args.dataset,
    )
    ev = A2MEvaluation(
        clf, clf_params, config=A2MEvalConfig(num_classes=num_actions)
    )

    def eval_fn(state, step):
        gen.params = {
            "params": state.ema_params if state.ema_params is not None else state.params
        }
        make_loaders = make_a2m_loaders_factory(
            dataset, gen, args.eval_batch_size, num_frames, feature_input,
            max_batches=max_batches,
        )
        summary = evaluate_multi_seed(make_loaders, ev, num_seeds=args.eval_rep_times)
        flat = {k: float(v["mean"]) for k, v in summary.items()}
        if degraded:
            flat["eval_comparable"] = 0.0
        return flat

    return eval_fn


def make_gen_during_training(args, model, data, text_embedder):
    """Render a few samples per checkpoint (reference training_loop.py:366-382)."""
    import jax
    import jax.numpy as jnp

    from ..diffusion import Schedule
    from ..models.mdm import Conditioning
    from ..sampling import GenerationConfig, MotionGenerator

    # Built once; params swap per checkpoint (traced jit args, no recompile).
    sched = Schedule.create(args.noise_schedule, args.diffusion_steps)
    gen = MotionGenerator(
        model, None, sched,
        GenerationConfig(guidance_scale=args.gen_guidance_param), args.dataset,
    )

    def gen_fn(state, step):
        import os

        B = args.gen_num_samples
        T = 196 if args.dataset in ("humanml", "kit") else args.num_frames
        gen.params = {
            "params": state.ema_params if state.ema_params is not None else state.params
        }
        batch = next(iter(data))
        texts = batch.get("text", ["sample"] * B)[:B]
        cond_kw = {"frames_mask": jnp.ones((B, T), bool)}
        if model.config.cond_mode == "text":
            if text_embedder is not None:
                cond_kw.update({k: jnp.asarray(v) for k, v in text_embedder(texts).items()})
            else:
                cond_kw["text_embed"] = jnp.zeros((B, model.config.text_dim))
        elif "action" in batch:
            cond_kw["action"] = jnp.asarray(batch["action"][:B])
        paths = []
        key = jax.random.PRNGKey(step)
        for rep in range(max(1, args.gen_num_repetitions)):
            key, sub = jax.random.split(key)
            out = gen.generate(Conditioning(**cond_kw), B, T, sub)
            if os.environ.get("MDM_TPU_NO_RENDER") or "joints" not in out:
                continue
            try:
                from ..visualize.plot_script import plot_3d_motion
                import numpy as _np

                path = os.path.join(args.save_dir, f"gen_step{step:09d}_rep{rep}.mp4")
                paths.append(plot_3d_motion(path, _np.asarray(out["joints"])[0],
                                            title=str(texts[0]), dataset=args.dataset))
            except Exception as e:
                print(f"gen_during_training render failed: {e}")
        return paths or None

    return gen_fn


def batch_to_conditioning(batch, model_config):
    """Host batch dict -> Conditioning pytree (static shapes)."""
    import jax.numpy as jnp

    from ..models.mdm import Conditioning

    kw = {}
    if "text_embed" in batch:
        kw["text_embed"] = jnp.asarray(batch["text_embed"])
        if "text_tokens_mask" in batch:
            kw["text_tokens_mask"] = jnp.asarray(batch["text_tokens_mask"])
    elif model_config.cond_mode == "text":
        # no tokenizer assets: zero embedding (smoke/dev mode)
        kw["text_embed"] = jnp.zeros(
            (batch["x"].shape[0], model_config.text_dim), jnp.float32
        )
    if "action" in batch:
        kw["action"] = jnp.asarray(batch["action"])
    if "prefix" in batch:
        kw["prefix"] = jnp.asarray(batch["prefix"])
    if "target_cond" in batch:
        kw["target_cond"] = jnp.asarray(batch["target_cond"])
    if "target_validity" in batch:
        # May arrive WITHOUT target_cond: the train step then extracts the
        # GT targets in-graph (make_train_step(target_cond_fn=...)).
        kw["target_validity"] = jnp.asarray(batch["target_validity"])
    return Conditioning(frames_mask=jnp.asarray(batch["mask"]), **kw)


class WrappedBatches:
    """Adapts loader batches to train-step inputs; forwards `iter_from` so
    TrainLoop can fast-forward the stream on resume (bit-exact resume)."""

    def __init__(self, data, model_config, goal_modifier=None):
        self.data = data
        self.model_config = model_config
        self.goal_modifier = goal_modifier

    def _wrap(self, batch):
        import jax.numpy as jnp

        if self.goal_modifier is not None:
            batch = self.goal_modifier(batch)
        return {
            "x": jnp.asarray(batch["x"]),
            "mask": jnp.asarray(batch["mask"]),
            "cond": batch_to_conditioning(batch, self.model_config),
        }

    def __iter__(self):
        return (self._wrap(b) for b in self.data)

    def iter_from(self, start_step: int):
        if hasattr(self.data, "iter_from"):
            inner = self.data.iter_from(start_step)
        else:
            inner = iter(self.data)
        return (self._wrap(b) for b in inner)


def wrap_batches(data, model_config, goal_modifier=None):
    return WrappedBatches(data, model_config, goal_modifier)


if __name__ == "__main__":
    main()
