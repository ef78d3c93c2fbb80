"""Measure the a2m (HumanAct12-protocol) eval wall-clock on TPU.

Reference: ~2 h on 1 GPU for HumanAct12, ~7 h for UESTC
(/root/reference/README.md:509,523) — 20 seeds x {gt, gt2, gen} passes,
generation via the FULL 1000-step ancestral sampler (the published a2m
checkpoints are 1000-step models), GRU classifier accuracy/FID/diversity/
multimodality per seed. This bench runs the same protocol at HumanAct12
scale (1190 clips, batch 64 -> 19 batches/pass, 60 frames, rot6d 25x6)
with synthetic data and random weights: compute identical, metric values
meaningless, wall-clock honest.

Usage: python scripts/bench_eval_a2m.py [--seeds 20] [--steps 1000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdm_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # persist XLA/Pallas compiles across processes

import jax
import jax.numpy as jnp
import numpy as np

from mdm_tpu.diffusion import Schedule
from mdm_tpu.eval.classifiers import MotionDiscriminator
from mdm_tpu.eval.harness_a2m import A2MEvalConfig, A2MEvaluation, evaluate_multi_seed
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.sampling import GenerationConfig, MotionGenerator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--clips", type=int, default=1190)
    args = ap.parse_args()

    B, T, D = 64, 60, 150  # humanact12: rot6d 25 joints x 6
    n_classes = 12
    n_batches = args.clips // B
    print(f"devices: {jax.devices()}", file=sys.stderr)

    cfg = MDMConfig(njoints=25, nfeats=6, latent_dim=512, ff_size=1024,
                    num_layers=8, num_heads=4, cond_mode="action",
                    num_actions=n_classes, data_rep="rot6d",
                    compute_dtype="bfloat16")
    model = MDM(cfg)
    rng = np.random.default_rng(0)
    cond0 = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        action=jnp.zeros((B,), jnp.int32),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, T, D)), jnp.zeros((B,), jnp.int32),
        cond0,
    )
    sched = Schedule.create("cosine", args.steps)
    gen = MotionGenerator(model, params, sched,
                          GenerationConfig(guidance_scale=1.0), "humanact12",
                          norm_stats=None)

    # classifier consumes [B, T, J*3] xyz features; random weights
    clf = MotionDiscriminator(input_size=72, hidden_size=128,
                              output_size=n_classes)
    clf_params = jax.jit(clf.init)(jax.random.PRNGKey(1),
                                   jnp.zeros((1, T, 72)), jnp.array([T]))

    gt = [
        {
            "x": rng.normal(size=(B, T, D)).astype(np.float32),
            "xyz": rng.normal(size=(B, T, 72)).astype(np.float32),
            "mask": np.ones((B, T), bool),
            "lengths": np.full((B,), T, np.int32),
            "y": rng.integers(0, n_classes, B).astype(np.int32),
        }
        for _ in range(n_batches)
    ]

    def feature_input(feats):
        # stand-in for SMPL rot2xyz: fixed projection to the classifier dims.
        # Stays a DEVICE array, matching make_a2m_feature_input: the whole
        # generate -> FK -> classify chain pipelines without host syncs.
        return feats[..., :72].astype(jnp.float32)

    # Megabatched protocol, exactly like the real CLI's
    # make_a2m_loaders_factory (eval/a2m_setup.py:200-259): each of the
    # gen/gt/gt2 passes is ONE device call over the whole concatenated
    # epoch — one H2D, one sampler dispatch, one classifier dispatch per
    # pass — instead of ~19 per-batch dispatches each.
    xyz_all = np.concatenate([b["xyz"] for b in gt])
    mask_all = np.concatenate([b["mask"] for b in gt])
    len_all = np.concatenate([b["lengths"] for b in gt])
    y_all = np.concatenate([b["y"] for b in gt])
    n_clips = len(y_all)

    def make_loaders(seed):
        key = jax.random.PRNGKey(seed)
        gt1 = [{"output_xyz": xyz_all, "lengths": len_all, "y": y_all}]
        gt2 = [{"output_xyz": xyz_all[::-1].copy(), "lengths": len_all,
                "y": y_all}]
        cond = Conditioning(frames_mask=jnp.asarray(mask_all),
                            action=jnp.asarray(y_all))
        feats = gen.sample_features(cond, n_clips, T, key)
        genb = [{"output_xyz": feature_input(feats),
                 "lengths": len_all, "y": y_all}]
        return {"gt": gt1, "gt2": gt2, "gen": genb}

    ev = A2MEvaluation(clf, clf_params,
                       config=A2MEvalConfig(num_classes=n_classes))
    t0 = time.perf_counter()
    evaluate_multi_seed(make_loaders, ev, num_seeds=args.seeds)
    total = time.perf_counter() - t0
    print(json.dumps({
        "metric": "a2m_eval_protocol_wall_clock",
        "value": round(total, 1),
        "unit": f"s total ({args.seeds} seeds x {n_batches * B} clips, "
                f"{args.steps}-step sampling, platform={jax.devices()[0].platform})",
        "sec_per_seed": round(total / args.seeds, 1),
        "vs_baseline": round(2 * 3600 / total, 1),  # reference ~2 h (humanact12)
    }))


if __name__ == "__main__":
    main()
