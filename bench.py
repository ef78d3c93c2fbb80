"""Headline benchmark: 50-step HumanML3D text-to-motion sampling latency.

Reference baseline (BASELINE.md): ~0.4 sec/sample for the 50-step MDM with
cached CLIP on 1 GPU. This bench runs the flagship MDM (512 latent, 8
layers) through the full jitted 50-step CFG sampler (guidance 2.5, i.e. a
double-batched forward per step) + hml decode on whatever accelerator JAX
exposes, and prints ONE JSON line:

    {"metric": "sec_per_sample_50step", "value": ..., "unit": "s/sample",
     "vs_baseline": <reference_sec / ours_sec, higher is better>}
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mdm_tpu.diffusion import Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.sampling import GenerationConfig, MotionGenerator

BASELINE_SEC_PER_SAMPLE = 0.4  # README.md:13-19 (1 GPU, 50 steps, cached CLIP)


def main():
    B, T = 32, 196
    cfg = MDMConfig(
        njoints=263, nfeats=1, latent_dim=512, ff_size=1024, num_layers=8,
        num_heads=4, compute_dtype="bfloat16",
    )
    model = MDM(cfg)
    x0 = jnp.zeros((B, T, 263), jnp.float32)
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.asarray(
            np.random.default_rng(0).normal(size=(B, 512)).astype(np.float32)
        ),
    )
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32), cond)

    sched = Schedule.create("cosine", 1000, timestep_respacing="50")
    gen = MotionGenerator(
        model, params, sched, GenerationConfig(guidance_scale=2.5), "humanml"
    )

    key = jax.random.PRNGKey(1)

    def run(k):
        out = gen.generate(cond, B, T, k)
        jax.block_until_ready(out["joints"])
        return out

    run(key)  # compile
    n_iters = 5
    start = time.perf_counter()
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        run(sub)
    elapsed = time.perf_counter() - start

    sec_per_sample = elapsed / (n_iters * B)
    print(
        json.dumps(
            {
                "metric": "sec_per_sample_50step",
                "value": round(sec_per_sample, 6),
                "unit": "s/sample",
                "vs_baseline": round(BASELINE_SEC_PER_SAMPLE / sec_per_sample, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
