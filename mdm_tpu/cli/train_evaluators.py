"""Train the T2M evaluator networks: `python -m mdm_tpu.cli.train_evaluators`.

Capability port of the reference's evaluator-training stack
(data_loaders/humanml/networks/trainers.py — DecompTrainerV3,
TextMotionMatchTrainer, LengthEstTrainer; the upstream text-to-motion repo
drives them with per-stage scripts). Stages:

  --stage decomp   movement conv autoencoder (run first)
  --stage match    contrastive text/motion encoders (needs --decomp_path)
  --stage length   motion-length estimator

`--stage match` writes a `finest.npy` that `EvaluatorWrapper` loads
directly, so a user can produce metric encoders for a NEW dataset without
any torch checkpoint.

  --stage comp_v6  the T2M baseline generator itself (CompTrainerV6,
                   trainers.py:211-746): scheduled-length curriculum over
                   the VAE seq2seq; writes a params .npy that
                   `T2MBaselineGenerator`/`t2m_generate` load directly
                   (the eval CLI's `--t2m_baseline_path`).

  --stage a2m_classifier  the action recognition model the a2m protocol
                   scores with (the reference only ships them frozen,
                   assets/actionrecognition/*.tar; eval/a2m/gru_eval.py:22-40
                   loads, never trains). humanact12: GRU on SMPL xyz when
                   the SMPL asset is present, else on raw rot6d features;
                   uestc: STGCN on rot6d (the protocol's own architecture,
                   stgcn_eval.py:58-60). Representation + architecture are
                   recorded in the saved .npy so eval reconstructs the same
                   pipeline; the eval CLI loads it via
                   `--a2m_classifier_path`.
"""
from __future__ import annotations

import os


def _batches(dataset, batch_size, stage, seed=0):
    import jax.numpy as jnp
    import numpy as np

    from ..data import BatchIterator

    rng = np.random.default_rng(seed)
    while True:
        it = BatchIterator(dataset, batch_size, shuffle=True, seed=seed,
                           infinite=False)
        for b in it:
            if stage == "decomp":
                yield jnp.asarray(b["x"])
                continue
            batch = {
                "word_embs": jnp.asarray(b.get(
                    "word_embeddings",
                    np.zeros((batch_size, 22, 300), np.float32))),
                "pos_onehot": jnp.asarray(b.get(
                    "pos_one_hots",
                    np.zeros((batch_size, 22, 15), np.float32))),
                "cap_lens": jnp.asarray(np.maximum(
                    np.asarray(b.get("sent_lens",
                                     np.full(batch_size, 4))), 1)),
                "m_lens": jnp.asarray(np.asarray(b["lengths"], np.int32)),
            }
            if stage == "match":
                batch["motions"] = jnp.asarray(b["x"])
                # np.random.randint(0, B-1) (trainers.py:975): [0, B-2];
                # shift 0 makes the "negative" pairs the positives — a
                # reference quirk kept for checkpoint comparability.
                batch["shift"] = jnp.asarray(
                    int(rng.integers(0, max(1, batch_size - 1)))
                )
            yield batch
        seed += 1


def _train_a2m_classifier(args):
    """--stage a2m_classifier: the action classifier the a2m protocol
    scores with, per dataset (reference ships both only frozen):

    - humanact12: GRU MotionDiscriminator on SMPL xyz when the SMPL asset
      is present (eval/a2m/gru_eval.py feeds batch['output_xyz']), else on
      the raw rot6d feature vectors.
    - uestc: STGCN on rot6d [B,T,24,6] — the protocol's own architecture
      and representation (eval/a2m/stgcn_eval.py:58-60); no SMPL needed.

    The representation AND architecture (arch/hidden_size/hidden_layers)
    are recorded in the saved .npy so `--a2m_classifier_path` evals
    reconstruct the identical pipeline.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data import BatchIterator, get_dataset
    from ..eval.a2m_setup import StgcnAdapter, make_a2m_feature_input
    from ..eval.classifiers import MotionDiscriminator
    from ..eval.train_evaluators import (
        EvalTrainConfig,
        make_a2m_classifier_step,
        run_training,
        save_evaluator_params,
    )

    num_frames = 60
    dataset = get_dataset(args.dataset, num_frames=num_frames,
                          data_root=args.data_dir or None)
    hidden_size, hidden_layers = 128, 2
    if args.dataset == "uestc":
        feature_input, feature = make_a2m_feature_input("uestc"), "rot6d"
    else:
        try:
            feature_input, feature = make_a2m_feature_input(args.dataset), "xyz"
        except FileNotFoundError as e:
            print(f"a2m_classifier: SMPL asset missing ({e}); training on "
                  "raw rot6d features")
            feature_input, feature = (lambda feats: jnp.asarray(feats)), "raw"
    feat_dim = dataset.sample(0, np.random.default_rng(0))["motion"].shape[-1]
    probe = feature_input(np.zeros((1, num_frames, feat_dim), np.float32))

    def batches(seed=args.seed):
        while True:
            it = BatchIterator(dataset, args.batch_size, shuffle=True,
                               seed=seed, infinite=False)
            for b in it:
                yield {
                    "x": feature_input(b["x"]),
                    "lengths": jnp.asarray(np.asarray(b["lengths"], np.int32)),
                    "y": jnp.asarray(np.asarray(b["action"], np.int32)),
                }
            seed += 1

    if feature == "rot6d":
        from ..eval.stgcn import STGCN, STGCNConfig

        input_size, arch = int(probe.shape[-1]), "stgcn"  # in_channels=6
        clf = StgcnAdapter(STGCN(STGCNConfig(
            in_channels=input_size, num_class=dataset.num_actions,
            layout="smpl")))
    else:
        input_size, arch = int(probe.shape[-1]), "gru"
        clf = MotionDiscriminator(input_size, hidden_size, hidden_layers,
                                  dataset.num_actions)
    init, step = make_a2m_classifier_step(
        clf, input_size, num_frames, EvalTrainConfig(lr=args.lr),
        example_x=jnp.zeros((1,) + probe.shape[1:]))
    bb = batches()
    if args.cache_batches > 0:
        from ..data.loader import cache_device_batches

        bb = cache_device_batches(bb, args.cache_batches)
    params, _ = run_training(init, step, bb, args.num_steps,
                             jax.random.PRNGKey(args.seed),
                             log_every=args.log_every)
    save_evaluator_params(args.save_path, {
        "params": params, "input_size": input_size, "feature": feature,
        "num_actions": dataset.num_actions, "arch": arch,
        "hidden_size": hidden_size, "hidden_layers": hidden_layers,
    })
    print(f"saved {args.save_path}")


def _train_unconstrained_stgcn(args):
    """Train the modified-structure 15-joint STGCN for the UNCONSTRAINED
    protocol (the reference only SHIPS it frozen as
    assets/actionrecognition/humanact12_gru_modi_struct.pth.tar and never
    the trainer — eval/unconstrained/evaluate.py:24-37 loads it). Action
    classification on root-centered openpose-15 xyz; the penultimate
    features feed FID/KID/precision-recall. The xyz decode is shared with
    cli/eval_unconstrained.py (a2m_setup.unconstrained_xyz_fn) so training
    and scoring see identical inputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data import BatchIterator, get_dataset
    from ..eval.a2m_setup import StgcnAdapter, unconstrained_xyz_fn
    from ..eval.harness_a2m import UNCONSTRAINED_JOINT_SUBSET
    from ..eval.stgcn import STGCN, STGCNConfig
    from ..eval.train_evaluators import (
        EvalTrainConfig,
        make_a2m_classifier_step,
        run_training,
        save_evaluator_params,
    )

    num_frames = 60
    dataset = get_dataset("humanact12", num_frames=num_frames,
                          data_root=args.data_dir or None)
    get_xyz, degraded = unconstrained_xyz_fn(num_frames)
    if degraded:
        print("unconstrained_stgcn: SMPL asset missing; training on "
              "pseudo-joint features (stamped in the saved .npy)")
    subset = jnp.asarray(UNCONSTRAINED_JOINT_SUBSET)

    # One jit for decode+center: separate get_xyz / to_inputs dispatches pay
    # two tunnel round-trips per cached batch (measured ~9 s/batch).
    to_inputs = jax.jit(lambda feats: (lambda xyz: (
        xyz[:, :, subset] - xyz[:, :1, subset][:, :, 8:9]))(get_xyz(feats)))

    cfg = STGCNConfig(in_channels=3, num_class=dataset.num_actions,
                      layout="openpose_modi15", edge_importance=True)
    clf = StgcnAdapter(STGCN(cfg))

    def batches(seed=args.seed):
        while True:
            it = BatchIterator(dataset, args.batch_size, shuffle=True,
                               seed=seed, infinite=False)
            for b in it:
                yield {
                    "x": to_inputs(jnp.asarray(b["x"])),
                    "lengths": jnp.asarray(np.asarray(b["lengths"], np.int32)),
                    "y": jnp.asarray(np.asarray(b["action"], np.int32)),
                }
            seed += 1

    init, step = make_a2m_classifier_step(
        clf, 3, num_frames, EvalTrainConfig(lr=args.lr),
        example_x=jnp.zeros((1, num_frames, 15, 3)))
    bb = batches()
    if args.cache_batches > 0:
        from ..data.loader import cache_device_batches

        bb = cache_device_batches(bb, args.cache_batches)
    params, _ = run_training(init, step, bb, args.num_steps,
                             jax.random.PRNGKey(args.seed),
                             log_every=args.log_every)
    save_evaluator_params(args.save_path, {
        "params": params, "feature": "pseudo" if degraded else "xyz",
        "num_actions": dataset.num_actions, "arch": "stgcn_modi15",
        "layout": "openpose_modi15", "in_channels": 3,
    })
    print(f"saved {args.save_path}")


def main(argv=None):
    import argparse

    import jax
    import numpy as np

    from ..data import WordVectorizer, get_dataset
    from ..eval.networks import (
        MotionEncoderBiGRUCo,
        MotionLenEstimatorBiGRU,
        MovementConvDecoder,
        MovementConvEncoder,
        TextEncoderBiGRUCo,
    )
    from ..eval.train_evaluators import (
        EvalTrainConfig,
        load_evaluator_params,
        make_decomp_step,
        make_length_est_step,
        make_match_step,
        run_training,
        save_evaluator_params,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["decomp", "match", "length", "comp_v6",
                             "a2m_classifier", "unconstrained_stgcn"])
    ap.add_argument("--dataset", default="humanml",
                    choices=["humanml", "kit", "humanact12", "uestc"])
    ap.add_argument("--data_dir", default="")
    ap.add_argument("--glove_dir", default="glove")
    ap.add_argument("--save_path", required=True)
    ap.add_argument("--decomp_path", default="", help="decomp .npy for --stage match")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--num_steps", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--negative_margin", type=float, default=10.0)
    ap.add_argument("--unit_length", type=int, default=4)
    ap.add_argument("--movement_dim", type=int, default=512)
    ap.add_argument("--coemb_dim", type=int, default=512)
    ap.add_argument("--num_len_buckets", type=int, default=50)
    ap.add_argument("--log_every", type=int, default=100)
    ap.add_argument("--cache_batches", type=int, default=0,
                    help="device-cache the first N batches and cycle them "
                         "(small datasets / slow host links); 0 = off")
    ap.add_argument("--seed", type=int, default=0)
    # comp_v6 curriculum (CompTrainerV6.train, trainers.py:604-746)
    ap.add_argument("--tf_ratio", type=float, default=0.4)
    ap.add_argument("--lambda_kld", type=float, default=0.01)
    ap.add_argument("--schedule_start", type=int, default=0,
                    help="0 = dataset default (10 t2m / 6 kit)")
    ap.add_argument("--schedule_end", type=int, default=49)
    ap.add_argument("--max_sub_epoch", type=int, default=50)
    ap.add_argument("--max_batches", type=int, default=0,
                    help="cap batches per (length, split) pass; 0 = all")
    args = ap.parse_args(argv)

    if args.stage == "a2m_classifier":
        assert args.dataset in ("humanact12", "uestc"), \
            "--stage a2m_classifier needs an action dataset"
        _train_a2m_classifier(args)
        return
    if args.stage == "unconstrained_stgcn":
        assert args.dataset == "humanact12", \
            "--stage unconstrained_stgcn is a HumanAct12 protocol"
        _train_unconstrained_stgcn(args)
        return
    assert args.dataset in ("humanml", "kit"), \
        f"--stage {args.stage} needs a t2m dataset"

    dim_pose = 263 if args.dataset == "humanml" else 251
    w_vec = None
    if os.path.exists(os.path.join(args.glove_dir, "our_vab_data.npy")):
        w_vec = WordVectorizer(args.glove_dir, "our_vab")
    elif args.stage in ("match", "length"):
        print("WARNING: GloVe vectorizer missing; text features are zeros "
              "(trained encoders will NOT be comparable)")
    dataset = get_dataset(
        args.dataset, split="train", hml_mode="eval",
        data_root=args.data_dir or None,
    )
    dataset.w_vectorizer = w_vec

    if args.stage == "comp_v6":
        from ..eval.train_t2m_generator import (
            CompV6TrainConfig,
            init_comp_v6_params,
            make_curriculum_batches,
            movement_params_from_flax,
            save_comp_v6_params,
            train_comp_v6,
        )

        val_split = next(
            (s for s in ("val", "test")
             if os.path.exists(os.path.join(
                 dataset.opt.data_root, f"{s}.txt"))),
            "train",
        )
        val_ds = get_dataset(
            args.dataset, split=val_split, hml_mode="eval",
            data_root=args.data_dir or None,
        )
        val_ds.w_vectorizer = w_vec
        ccfg = CompV6TrainConfig(
            lr=args.lr, unit_length=args.unit_length,
            dim_pose=dim_pose, lambda_kld=args.lambda_kld,
            tf_ratio=args.tf_ratio,
            schedule_start=(args.schedule_start
                            or (10 if args.dataset == "humanml" else 6)),
            schedule_end=args.schedule_end,
            max_sub_epoch=args.max_sub_epoch,
        )
        mov_enc = mov_dec = None
        if args.decomp_path:
            from ..eval.train_evaluators import load_evaluator_params

            dp = load_evaluator_params(args.decomp_path)
            mov_enc, mov_dec = movement_params_from_flax(dp["enc"], dp["dec"])
        params = init_comp_v6_params(
            jax.random.PRNGKey(args.seed), ccfg,
            mov_enc=mov_enc, mov_dec=mov_dec)
        make_batches = make_curriculum_batches(
            dataset, val_ds, args.batch_size, ccfg, seed=args.seed,
            max_batches=args.max_batches)
        params = train_comp_v6(
            params, make_batches, ccfg, key=jax.random.PRNGKey(args.seed),
            rng=np.random.default_rng(args.seed))
        save_comp_v6_params(args.save_path, params)
        print(f"saved {args.save_path}")
        return

    cfg = EvalTrainConfig(lr=args.lr, unit_length=args.unit_length,
                          negative_margin=args.negative_margin)
    key = jax.random.PRNGKey(args.seed)
    batches = _batches(dataset, args.batch_size, args.stage, args.seed)
    if args.cache_batches > 0:
        from ..data.loader import cache_device_batches

        batches = cache_device_batches(batches, args.cache_batches)

    if args.stage == "decomp":
        enc = MovementConvEncoder(hidden_size=args.movement_dim,
                                  output_size=args.movement_dim)
        dec = MovementConvDecoder(hidden_size=args.movement_dim,
                                  output_size=dim_pose)
        init, step = make_decomp_step(enc, dec, cfg)
        params, _ = run_training(init, step, batches, args.num_steps, key,
                                 log_every=args.log_every)
        save_evaluator_params(args.save_path, params)
    elif args.stage == "length":
        est = MotionLenEstimatorBiGRU(300, 15, 512, args.num_len_buckets)
        init, step = make_length_est_step(est, cfg)
        params, _ = run_training(init, step, batches, args.num_steps, key,
                                 log_every=args.log_every)
        save_evaluator_params(args.save_path, {"estimator": params})
    else:  # match
        assert args.decomp_path, "--stage match requires --decomp_path"
        movement_params = load_evaluator_params(args.decomp_path)["enc"]
        text_enc = TextEncoderBiGRUCo(300, 15, args.coemb_dim, args.coemb_dim)
        motion_enc = MotionEncoderBiGRUCo(args.movement_dim,
                                          args.coemb_dim * 2, args.coemb_dim)
        movement_enc = MovementConvEncoder(hidden_size=args.movement_dim,
                                           output_size=args.movement_dim)
        init, step = make_match_step(text_enc, motion_enc, movement_enc, cfg)
        params, _ = run_training(
            init, step, batches, args.num_steps, key,
            step_args=lambda b: (movement_params, b),
            log_every=args.log_every,
        )
        # EvaluatorWrapper-ready layout (finest.npy)
        save_evaluator_params(args.save_path, {
            "movement": {"params": movement_params},
            "text": {"params": params["text"]},
            "motion": {"params": params["motion"]},
        })
    print(f"saved {args.save_path}")


if __name__ == "__main__":
    main()
