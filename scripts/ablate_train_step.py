"""Train-step ablations on the real TPU (slope method, one variant per run).

Which parts of the fused step cost time? Round-3 result (docs/BENCHMARKS.md
"MFU close-out"): quartile metrics, grad/param norms, and the EMA update
are all free; dropout is the entire 9.7 ms gap to the 37.5 ms floor.

Usage: python scripts/ablate_train_step.py <variant>
variants: full, no_quartile, no_norms, no_ema, no_dropout, loss_only
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from mdm_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # persist XLA/Pallas compiles across processes

import jax
import jax.numpy as jnp
import numpy as np

variant = sys.argv[1]

import mdm_tpu.ops as ops
import mdm_tpu.train.train_step as ts

# This grid ablates the pure-XLA step; keep the fused train-block kernel
# (default AUTO-on for single-device since round 4) out of every variant.
ops.enable_pallas_train_block(False)
from mdm_tpu.diffusion import LossConfig, Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.train import OptimConfig, TrainStepConfig, create_train_state, make_train_step

if variant in ("no_quartile", "loss_only"):
    ts.quartile_metrics = lambda losses, t, n: {}
if variant in ("no_norms", "loss_only"):
    import optax
    optax.global_norm = lambda tree: jnp.float32(0.0)

B, T = 128, 196
dropout = 0.0 if variant == "no_dropout" else 0.1
cfg = MDMConfig(njoints=263, nfeats=1, latent_dim=512, ff_size=1024,
                num_layers=8, num_heads=4, compute_dtype="bfloat16",
                dropout=dropout)
model = MDM(cfg)
cond = Conditioning(frames_mask=jnp.ones((B, T), bool),
                    text_embed=jnp.zeros((B, 512), jnp.float32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((B, T, 263)),
                             jnp.zeros((B,), jnp.int32), cond)["params"]
sched = Schedule.create("cosine", 1000)
ocfg = OptimConfig(lr=1e-4, use_ema=(variant != "no_ema"))
scfg = TrainStepConfig(loss=LossConfig(), optim=ocfg)
state = create_train_state(params, ocfg)
step = make_train_step(model.apply, sched, scfg)

rng = np.random.default_rng(0)
batch = {"x": jnp.asarray(rng.normal(size=(B, T, 263)).astype(np.float32)),
         "mask": jnp.ones((B, T), bool), "cond": cond}
key = jax.random.PRNGKey(1)
box = {"s": state, "i": 0}

def run_n(n):
    for _ in range(n):
        box["s"], _m = step(box["s"], batch, jax.random.fold_in(key, box["i"]))
        box["i"] += 1
    _ = float(np.asarray(box["s"].step))

run_n(3)
t0 = time.perf_counter(); run_n(10); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); run_n(40); t2 = time.perf_counter() - t0
ms = (t2 - t1) / 30 * 1e3
print(json.dumps({"variant": variant, "ms_per_step": round(ms, 2),
                  "samples_per_s": round(B / ms * 1e3, 0)}))
