"""Train-step attention-kernel shootout on the real TPU (VERDICT r3 #4).

Compares the fused train step at flagship config, B=128 bf16, dropout ON
(the production training configuration) across attention implementations:

  xla    — default: XLA attention, XLA dropout on the probabilities
  drop   — ops/attention_dropout.py: fused attention + in-kernel PRNG
           dropout (no [B,H,S,S] prob/mask tensors in HBM), q/k/v/out
           projections still separate XLA gemms
  block  — ops/attention_train_block.py: the whole block (q/k/v/out
           projections + attention + in-kernel dropout) as ONE Pallas
           program with a flash-style seed-replay VJP

Round-3 context (docs/BENCHMARKS.md): xla measures 47.2 ms/step, the
no-dropout ablation floor is 37.5 ms — the entire gap is dropout. `drop`
lost 3% end-to-end because its pallas boundary forces q/k/v/dO HBM
round-trips; `block` removes exactly those boundaries.

One variant per fresh process (CLAUDE.md benchmarking rule):
    for v in xla drop block; do python scripts/bench_train_kernels.py --variant $v; done
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
from mdm_tpu.train import (
    OptimConfig,
    TrainStepConfig,
    create_train_state,
    make_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["xla", "drop", "block", "tail"],
                    required=True)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n1", type=int, default=10)
    ap.add_argument("--n2", type=int, default=40)
    args = ap.parse_args()

    import mdm_tpu.ops as ops

    # Pin explicitly: the default is AUTO (block kernel on for single-device
    # steps since it won, round 4), so xla/drop must opt out of it.
    if args.variant == "drop":
        ops.enable_pallas_train_block(False)
        ops.enable_pallas_train_attention(True)
        ops.enable_pallas_encoder_tail(False)
    elif args.variant == "block":
        ops.enable_pallas_train_block(True)
        ops.enable_pallas_encoder_tail(False)
    elif args.variant == "tail":  # block kernel + fused encoder tail
        ops.enable_pallas_train_block(True)
        ops.enable_pallas_encoder_tail(True)
    else:
        ops.enable_pallas_train_block(False)
        ops.enable_pallas_encoder_tail(False)

    B, T = args.batch, 196
    cfg = MDMConfig(njoints=263, nfeats=1, latent_dim=512, ff_size=1024,
                    num_layers=8, num_heads=4, compute_dtype="bfloat16")
    model = MDM(cfg)
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.zeros((B, 512), jnp.float32),
    )
    x = jnp.zeros((B, T, 263), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, cond)["params"]

    sched = Schedule.create("cosine", 1000)
    config = TrainStepConfig(loss=LossConfig(), optim=OptimConfig(lr=1e-4))
    state = create_train_state(params, config.optim)
    step = make_train_step(model.apply, sched, config)

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(B, T, 263)).astype(np.float32)),
        "mask": jnp.ones((B, T), bool),
        "cond": cond,
    }
    key = jax.random.PRNGKey(1)
    box = {"state": state, "i": 0}

    def run_n(n):
        for _ in range(n):
            box["state"], _m = step(
                box["state"], batch, jax.random.fold_in(key, box["i"])
            )
            box["i"] += 1
        _ = float(np.asarray(box["state"].step))  # forced host pull

    run_n(3)
    t0 = time.perf_counter(); run_n(args.n1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run_n(args.n2); t2 = time.perf_counter() - t0
    dt = (t2 - t1) / (args.n2 - args.n1)
    print(json.dumps({
        "variant": args.variant, "B": B,
        "ms_per_step": round(dt * 1e3, 2),
        "samples_per_s": round(B / dt, 1),
    }))


if __name__ == "__main__":
    main()
