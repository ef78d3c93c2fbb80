"""Sampling attention-kernel shootout at large batch (VERDICT r3 weak #4).

Round-3 measured a per-sample regression with batch in the 50-step CFG
sampler: 7.7 ms/sample at B=32 -> 10.1 at B=128 — the [2B,H,S,S]
attention probabilities at CFG double-batch go HBM-heavy at large B where
XLA's attention mega-fusion stops covering them. The flash-style kernels
(ops/attention.py, ops/attention_v2.py) never materialize the probs; they
lost at B<=64 (DESIGN.md §7) but the HBM-pressure regime at B>=128 is the
one they were built for.

One (variant, batch) per fresh process (CLAUDE.md benchmarking rule):
    for v in xla pallas; do for b in 32 128; do
        python scripts/bench_sample_kernels.py --variant $v --batch $b; done; done
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
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.sampling import GenerationConfig, MotionGenerator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant",
                    choices=["xla", "pallas", "block", "tail", "layer"],
                    required=True)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--sampler", default="ddpm",
                    help="ddpm | ddim | plms | dpmpp_2m (remeasure the "
                         "fast-sampler rows under the shipped kernels)")
    ap.add_argument("--steps", type=int, default=50,
                    help="respaced step count (DPM rows: 10/20)")
    args = ap.parse_args()

    import mdm_tpu.ops as ops

    # The block kernel is the AUTO default for single-device sampling since
    # round 4; xla/pallas variants must pin it off to measure their paths.
    if args.variant == "pallas":
        # Routes deterministic self-attention through fused_attention_v2
        # (batch-tiled, heads looped in-kernel, no [B,H,S,S] in HBM) —
        # models/layers.py use_v2 branch.
        ops.enable_pallas_sample_block(False)
        ops.enable_pallas_attention(True)
    elif args.variant == "block":
        # Forward-only whole-block kernel: projections + attention + out
        # projection in one program (the rate-0 variant of the round-4
        # training winner) — models/layers.py use_sample_block branch.
        ops.enable_pallas_sample_block(True)
        ops.enable_pallas_encoder_tail(False)
    elif args.variant == "tail":  # block kernel + fused encoder tail
        ops.enable_pallas_sample_block(True)
        ops.enable_pallas_encoder_tail(True)
        # Since r5 the whole-layer kernel auto-supersedes block+tail; pin
        # it off to measure the round-4 two-kernel path.
        ops.enable_pallas_layer_inference(False)
    elif args.variant == "layer":  # whole encoder layer as ONE program (r5)
        ops.enable_pallas_sample_block(True)
        ops.enable_pallas_encoder_tail(True)
        ops.enable_pallas_layer_inference(True)
    else:
        ops.enable_pallas_sample_block(False)
        ops.enable_pallas_encoder_tail(False)

    B, T = args.batch, 196
    cfg = MDMConfig(njoints=263, nfeats=1, latent_dim=512, ff_size=1024,
                    num_layers=8, num_heads=4, compute_dtype="bfloat16")
    model = MDM(cfg)
    x0 = jnp.zeros((B, T, 263), jnp.float32)
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.asarray(
            np.random.default_rng(0).normal(size=(B, 512)).astype(np.float32)
        ),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32), cond
    )
    sched = Schedule.create("cosine", 1000, timestep_respacing=str(args.steps))
    gen = MotionGenerator(
        model, params, sched,
        GenerationConfig(guidance_scale=2.5, sampler=args.sampler), "humanml"
    )
    key = jax.random.PRNGKey(1)
    fb = {"joints": None, "i": 0}

    def run_samples(k):
        c = cond
        for _ in range(k):
            if fb["joints"] is not None:
                c = cond.replace(
                    text_embed=cond.text_embed + 0.0 * fb["joints"][:, 0, 0, :1]
                )
            out = gen.generate(c, B, T, jax.random.fold_in(key, fb["i"]))
            fb["joints"] = out["joints"]
            fb["i"] += 1
        _ = float(np.asarray(fb["joints"][0, 0, 0, 0]))

    run_samples(2)
    t0 = time.perf_counter(); run_samples(3); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run_samples(13); t2 = time.perf_counter() - t0
    sec = (t2 - t1) / (10 * B)
    print(json.dumps({
        "variant": args.variant, "B": B,
        "sampler": args.sampler, "steps": args.steps,
        "ms_per_sample": round(sec * 1e3, 3),
        "s_per_batch": round(sec * B, 4),
    }))


if __name__ == "__main__":
    main()
