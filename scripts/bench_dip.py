"""DiP autoregressive latency bench on the real TPU.

Reference claim: "ultra-fast" 10 diffusion steps / 2-s (40-frame) chunk per
AR call (reference DiP.md:18-23). Measures our scan-based device-resident AR
pipeline: ms per chunk and ms per generated second of motion, at B=32 and
B=1 (interactive latency).

Usage: python scripts/bench_dip.py
"""
from __future__ import annotations

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

CONTEXT, PRED, FPS = 20, 40, 20  # DiP defaults: 2-s chunks at 20 fps


def bench(B: int, n_chunks: int = 8, iters: int = 10):
    cfg = MDMConfig(
        njoints=263, nfeats=1, latent_dim=512, ff_size=1024, num_layers=8,
        num_heads=4, arch="trans_dec", compute_dtype="bfloat16",
        context_len=CONTEXT, pred_len=PRED,
    )
    model = MDM(cfg)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.normal(size=(B, CONTEXT, 263)).astype(np.float32))
    cond = Conditioning(
        frames_mask=jnp.ones((B, PRED), bool),
        text_embed=jnp.asarray(rng.normal(size=(B, 512)).astype(np.float32)),
        prefix=prefix,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, PRED, 263)),
        jnp.zeros((B,), jnp.int32), cond,
    )
    # DiP: 10-step diffusion, guidance 7.5 (reference DiP.md / fixed_results)
    sched = Schedule.create("cosine", 1000, timestep_respacing="10")
    gen = MotionGenerator(
        model, params, sched,
        GenerationConfig(guidance_scale=7.5, autoregressive=True,
                         context_len=CONTEXT, pred_len=PRED),
        "humanml",
    )
    frames = n_chunks * PRED
    key = jax.random.PRNGKey(1)

    # Slope method (CLAUDE.md): chain iterations through a 0-weight data
    # dependency on the previous output, end each segment with a host pull.
    fb = {"out": None, "i": 0}

    def run_n(k):
        c = cond
        for _ in range(k):
            if fb["out"] is not None:
                c = cond.replace(
                    text_embed=cond.text_embed + 0.0 * fb["out"][:, 0, :1]
                )
            fb["out"] = gen.sample_autoregressive(
                c, B, jax.random.fold_in(key, fb["i"]), required_frames=frames
            )
            fb["i"] += 1
        _ = float(np.asarray(fb["out"][0, 0, 0]))

    run_n(2)  # compile + warmup
    n1, n2 = max(2, iters // 3), iters
    t0 = time.perf_counter(); run_n(n1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run_n(n2); t2 = time.perf_counter() - t0
    dt = (t2 - t1) / (n2 - n1)
    ms_per_chunk = dt / n_chunks * 1e3
    return {
        "B": B,
        "n_chunks": n_chunks,
        "ms_per_chunk": round(ms_per_chunk, 2),
        "ms_per_motion_second": round(ms_per_chunk / (PRED / FPS), 2),
        "ms_per_chunk_per_sample": round(ms_per_chunk / B, 3),
        "realtime_factor": round((PRED / FPS) / (ms_per_chunk / 1e3), 1),
    }


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for B in (1, 32):
        print(json.dumps(bench(B)), flush=True)


if __name__ == "__main__":
    main()
