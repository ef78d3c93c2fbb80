"""Worked example: the mdm_tpu API end to end on random weights.

Runs without any downloaded assets (random-weight model, zero text
embeddings) so it doubles as a smoke test of the public API. With converted
checkpoints + text-encoder assets, replace the init block with
`restore_params_only` / `make_text_embedder` as shown in the comments.

    python examples/demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mdm_tpu.diffusion import Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.sampling import GenerationConfig, MotionGenerator, in_between_mask


def main():
    B, T = 4, 120

    # ---- model (flagship humanml config, random weights for the demo)
    model = MDM(MDMConfig(latent_dim=512, num_layers=8, compute_dtype="bfloat16"))
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.zeros((B, 512)),  # <- make_text_embedder(...)(["a person walks"]*B)
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, T, 263)), jnp.zeros((B,), jnp.int32), cond
    )
    # params = {"params": restore_params_only("save/run/ckpt_000500000", params["params"])}

    # ---- 1. text-to-motion, 50-step CFG
    sched = Schedule.create("cosine", 1000, timestep_respacing="50")
    gen = MotionGenerator(model, params, sched,
                          GenerationConfig(guidance_scale=2.5), "humanml")
    out = gen.generate(cond, B, T, jax.random.PRNGKey(1))
    print("t2m joints:", out["joints"].shape)

    # ---- 2. fast mode: DPM-Solver++(2M) at 20 steps
    sched20 = Schedule.create("cosine", 1000, timestep_respacing="20")
    gen_fast = MotionGenerator(model, params, sched20,
                               GenerationConfig(guidance_scale=2.5, sampler="dpmpp_2m"),
                               "humanml")
    fast = gen_fast.generate(cond, B, T, jax.random.PRNGKey(2))
    print("dpm++ joints:", fast["joints"].shape)

    # ---- 3. editing: in-betweening via inpainting
    gt = np.asarray(out["features"])
    mask = in_between_mask(np.full(B, T), T, 263)
    edited = gen.sample_features(
        cond, B, T, jax.random.PRNGKey(3),
        inpainting_mask=jnp.asarray(mask), inpainted_motion=jnp.asarray(gt),
    )
    kept = np.abs(np.asarray(edited)[mask] - gt[mask]).max()
    print(f"edit: inpainted region preserved to {kept:.2e}")

    # ---- 4. DiP-style autoregressive generation (long motion)
    dip = MDM(MDMConfig(latent_dim=512, num_layers=8, arch="trans_dec",
                        context_len=20, pred_len=40, compute_dtype="bfloat16"))
    dip_cond = Conditioning(
        frames_mask=jnp.ones((B, 40), bool),
        text_embed=jnp.zeros((B, 512)),
        prefix=jnp.zeros((B, 20, 263)),
    )
    dip_params = jax.jit(dip.init)(
        jax.random.PRNGKey(4), jnp.zeros((B, 40, 263)), jnp.zeros((B,), jnp.int32), dip_cond
    )
    sched10 = Schedule.create("cosine", 1000, timestep_respacing="10")
    gen_ar = MotionGenerator(
        dip, dip_params, sched10,
        GenerationConfig(guidance_scale=7.5, autoregressive=True,
                         context_len=20, pred_len=40),
        "humanml",
    )
    long_motion = gen_ar.sample_autoregressive(
        dip_cond, B, jax.random.PRNGKey(5), required_frames=400
    )
    print("autoregressive long motion:", long_motion.shape)


if __name__ == "__main__":
    main()
