"""Training-step throughput sweep on the real TPU.

Measures the fused train step (loss+grad+AdamW+EMA, train/train_step.py)
across batch sizes and compute dtypes, with and without geometric losses,
and reports samples/s + model-FLOPs utilization (MFU).

Usage: python scripts/bench_train.py [--quick]
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

from mdm_tpu.diffusion import LossConfig, Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.train import OptimConfig, TrainStepConfig, create_train_state, make_train_step

V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s
V5E_F32_PEAK = 98.5e12


def count_params(params) -> int:
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


def flagship(compute_dtype: str):
    cfg = MDMConfig(njoints=263, nfeats=1, latent_dim=512, ff_size=1024,
                    num_layers=8, num_heads=4, compute_dtype=compute_dtype)
    return MDM(cfg)


def slope_time(run_n, n1: int = 10, n2: int = 40) -> float:
    """Per-iteration time via the slope method (CLAUDE.md): two chained
    segment lengths, each ending in a forced host pull, (t2-t1)/(n2-n1).
    Through the axon tunnel block_until_ready can return before remote
    execution finishes and the first timed loop absorbs warmup; the slope
    cancels both."""
    run_n(3)  # warmup segment (absorbs compile + first-dispatch overheads)
    t0 = time.perf_counter()
    run_n(n1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_n(n2)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1)


def bench_one(B: int, compute_dtype: str, geometric: bool):
    T = 196
    model = flagship(compute_dtype)
    x = jnp.zeros((B, T, 263), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.zeros((B, 512), jnp.float32),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, cond)["params"]

    sched = Schedule.create("cosine", 1000)
    loss_cfg = LossConfig()
    get_xyz = None
    if geometric:
        from mdm_tpu.core import hml_codec

        loss_cfg = LossConfig(lambda_rcxyz=1.0, lambda_vel=1.0)
        mean = jnp.zeros((263,), jnp.float32)
        std = jnp.ones((263,), jnp.float32)

        def get_xyz(feats):
            return hml_codec.recover_from_ric(feats * std + mean, 22)

    config = TrainStepConfig(loss=loss_cfg, optim=OptimConfig(lr=1e-4))
    state = create_train_state(params, config.optim)
    step = make_train_step(model.apply, sched, config, get_xyz=get_xyz)

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(B, T, 263)).astype(np.float32)),
        "mask": jnp.ones((B, T), bool),
        "cond": cond,
    }
    key = jax.random.PRNGKey(1)

    # Steps chain through the donated state; pulling state.step waits for
    # every enqueued step, making each segment's wall time honest.
    box = {"state": state, "i": 0}

    def run_n(n):
        for _ in range(n):
            box["state"], _m = step(
                box["state"], batch, jax.random.fold_in(key, box["i"])
            )
            box["i"] += 1
        _ = float(np.asarray(box["state"].step))

    dt = slope_time(run_n)

    n_params = count_params(params)
    # fwd 2ND + bwd 4ND model FLOPs (attention FLOPs add ~5% at T=196, d=512)
    flops = 6 * n_params * B * (T + 1)
    peak = V5E_BF16_PEAK if compute_dtype == "bfloat16" else V5E_F32_PEAK
    mfu = flops / dt / peak
    return {
        "B": B, "dtype": compute_dtype, "geometric": geometric,
        "ms_per_step": round(dt * 1e3, 2),
        "samples_per_s": round(B / dt, 1),
        "mfu_pct": round(100 * mfu, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batches", type=int, nargs="*", default=None)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    batches = args.batches or ([64, 256] if args.quick else [64, 128, 256, 512, 1024])
    rows = []
    out_path = "/tmp/bench_train_results.jsonl"
    out = open(out_path, "a")
    for dtype in ("float32", "bfloat16"):
        for B in batches:
            try:
                r = bench_one(B, dtype, geometric=False)
            except Exception as e:  # e.g. HBM OOM at large f32 batches
                r = {"B": B, "dtype": dtype, "geometric": False,
                     "error": type(e).__name__}
            rows.append(r)
            print(json.dumps(r), flush=True)
            print(json.dumps(r), file=out, flush=True)
    # geometric losses at the best batch so far
    ok = [r for r in rows if "error" not in r]
    best = max(ok, key=lambda r: r["samples_per_s"])
    r = bench_one(best["B"], best["dtype"], geometric=True)
    rows.append(r)
    print(json.dumps(r), flush=True)
    print(json.dumps(r), file=out, flush=True)


if __name__ == "__main__":
    main()
