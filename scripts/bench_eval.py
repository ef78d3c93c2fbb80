"""Measure the FULL 20-replication t2m eval protocol wall-clock on TPU.

Round-2 verdict item 8: replace BENCHMARKS.md's "~7 min (projected)" with a
measured number. Runs the real `evaluation()` harness at protocol scale —
1024 prompts in 32 batches of the locked batch size 32, T=196, flagship
512-d/8-layer generator with 50-step CFG-2.5 sampling, full wo_mm metric
set (matching/R-precision + FID + diversity) per replication — on synthetic
data (weights random: identical compute/IO to converted weights, metric
VALUES meaningless, wall-clock honest). Reference: ~12 h on 1 GPU
(eval/eval_humanml.py:270-277).

Usage: python scripts/bench_eval.py [--reps 20] [--batches 32]
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
from mdm_tpu.eval import EvalConfig, EvaluatorWrapper, GeneratedMotionLoader, evaluation
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.sampling import GenerationConfig, MotionGenerator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--batches", type=int, default=32)
    args = ap.parse_args()

    B, T, D = 32, 196, 263
    print(f"devices: {jax.devices()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    gt_batches = []
    for i in range(args.batches):
        lengths = rng.integers(40, 197, size=B).astype(np.int32)
        mask = np.arange(T)[None, :] < lengths[:, None]
        gt_batches.append({
            "x": rng.normal(size=(B, T, D)).astype(np.float32),
            "mask": mask,
            "lengths": lengths,
            "text": [f"synthetic prompt {i}-{j}" for j in range(B)],
            "word_embeddings": rng.normal(size=(B, 22, 300)).astype(np.float32),
            "pos_one_hots": np.eye(15, dtype=np.float32)[
                rng.integers(0, 15, size=(B, 22))
            ],
            "sent_lens": rng.integers(3, 20, size=B).astype(np.int32),
        })

    cfg = MDMConfig(njoints=D, nfeats=1, latent_dim=512, ff_size=1024,
                    num_layers=8, num_heads=4, compute_dtype="bfloat16")
    model = MDM(cfg)
    cond0 = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.zeros((B, 512), jnp.float32),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, T, D)), jnp.zeros((B,), jnp.int32),
        cond0,
    )
    sched = Schedule.create("cosine", 1000, timestep_respacing="50")
    gen = MotionGenerator(model, params, sched,
                          GenerationConfig(guidance_scale=2.5), "humanml")

    def embedder(texts):
        e = np.random.default_rng(abs(hash(tuple(texts))) % 2**32)
        return {"text_embed": e.normal(size=(len(texts), 512)).astype(np.float32)}

    wrapper = EvaluatorWrapper("humanml", checkpoints_dir=".")

    t0 = time.perf_counter()
    evaluation(
        wrapper,
        gt_loader_fn=lambda: iter(gt_batches),
        eval_motion_loader_fns={
            "vald": lambda rep: GeneratedMotionLoader(
                gen, gt_batches, embedder, seed=rep
            )
        },
        config=EvalConfig(replication_times=args.reps),
    )
    total = time.perf_counter() - t0
    print(json.dumps({
        "metric": "t2m_eval_protocol_wall_clock",
        "value": round(total, 1),
        "unit": f"s total ({args.reps} reps x {args.batches * B} prompts, "
                f"50-step CFG, wo_mm, platform={jax.devices()[0].platform})",
        "sec_per_replication": round(total / args.reps, 1),
        "vs_baseline": round(12 * 3600 / total, 1),  # reference ~12 h
    }))


if __name__ == "__main__":
    main()
