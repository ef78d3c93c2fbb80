"""Serving wrapper: load once, generate per request.

Capability mirror of the reference's Replicate/cog predictor
(sample/predict.py:53-167) without the cog dependency: a plain class with
`setup()` (build + jit + warm the sampler once) and
`predict(prompt, ...)` returning joints (and optionally an animation file).
Suitable for wrapping in any HTTP layer.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class PredictorConfig:
    model_path: str = ""
    dataset: str = "humanml"
    guidance_scale: float = 2.5
    num_diffusion_steps: int = 1000
    respacing: str = "50"  # serve the fast 50-step model by default
    max_frames: int = 196
    fps: float = 20.0
    batch_size: int = 1
    text_encoder_type: str = "clip"
    latent_dim: int = 512
    layers: int = 8
    compute_dtype: str = "bfloat16"
    # sampler for serving: "ddpm" | "ddim" | "plms" | "dpmpp_2m" (the fast
    # ODE solver cuts per-request latency ~5x at 20 respaced steps)
    sampler: str = "ddpm"
    cfg_cache_interval: int = 1
    # >1: Megatron-shard the denoiser over a 'model' mesh axis of this size
    # (parallel/tp_rules.py) — cuts single-request latency on multi-chip
    # hosts, where DP can't help a batch-of-1. Requires device count
    # divisible by the value.
    tensor_parallel: int = 1
    # Prefer the EMA weights when the checkpoint carries them (released
    # checkpoints trained --use_ema do); falls back to raw params otherwise.
    use_ema: bool = True


class Predictor:
    """Thread-safe after setup(); each predict() is one jitted program run."""

    def __init__(self, config: PredictorConfig = PredictorConfig()):
        self.config = config
        self._ready = False

    def setup(self):
        import jax
        import jax.numpy as jnp

        from .diffusion import Schedule
        from .models import MDM, Conditioning, MDMConfig
        from .sampling import GenerationConfig, MotionGenerator
        from .sampling.text import make_text_embedder
        from .train.checkpoints import find_resume_checkpoint, restore_params_only

        cfg = self.config
        mcfg = MDMConfig(
            njoints=263 if cfg.dataset == "humanml" else 251,
            nfeats=1, latent_dim=cfg.latent_dim, num_layers=cfg.layers,
            compute_dtype=cfg.compute_dtype,
        )
        self.model = MDM(mcfg)
        B, T = cfg.batch_size, cfg.max_frames
        cond0 = Conditioning(
            frames_mask=jnp.ones((B, T), bool),
            text_embed=jnp.zeros((B, mcfg.text_dim)),
        )
        params = jax.jit(self.model.init)(
            jax.random.PRNGKey(0), jnp.zeros((B, T, mcfg.input_feats)),
            jnp.zeros((B,), jnp.int32), cond0,
        )
        ckpt = cfg.model_path
        if ckpt and os.path.isdir(ckpt) and not os.path.basename(ckpt).startswith("ckpt_"):
            found = find_resume_checkpoint(ckpt)
            ckpt = found[0] if found else ""
        if ckpt and os.path.exists(ckpt):
            params = {"params": restore_params_only(
                ckpt, params["params"], use_ema=cfg.use_ema)}

        sched = Schedule.create("cosine", cfg.num_diffusion_steps, cfg.respacing)
        mesh = None
        if cfg.tensor_parallel > 1:
            from .parallel import make_mesh

            mesh = make_mesh(model_parallel=cfg.tensor_parallel)
        self.generator = MotionGenerator(
            self.model, params, sched,
            GenerationConfig(guidance_scale=cfg.guidance_scale,
                             sampler=cfg.sampler,
                             cfg_cache_interval=cfg.cfg_cache_interval),
            cfg.dataset,
            mesh=mesh,
        )
        self.embedder = make_text_embedder(cfg.text_encoder_type)
        self._cond0 = cond0
        self._key = jax.random.PRNGKey(0)

        # Warm: compile the full pipeline once so first request is fast.
        self.generator.generate(cond0, B, T, jax.random.PRNGKey(1))
        self._ready = True

    def predict(
        self,
        prompt: str,
        num_repetitions: int = 1,
        motion_length_sec: float = 6.0,
        seed: Optional[int] = None,
        output_format: str = "json",  # json | animation | hik
        output_dir: str = "/tmp/mdm_tpu_serve",
    ):
        import jax
        import jax.numpy as jnp

        assert self._ready, "call setup() first"
        cfg = self.config
        B, T = cfg.batch_size, cfg.max_frames
        n_frames = min(T, int(motion_length_sec * cfg.fps))

        if self.embedder is not None:
            embeds = self.embedder([prompt] * B)
            cond = self._cond0.replace(
                **{k: jnp.asarray(v) for k, v in embeds.items()}
            )
        else:
            cond = self._cond0

        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        results = []
        for _ in range(num_repetitions):
            self._key, sub = jax.random.split(self._key)
            out = self.generator.generate(cond, B, T, sub)
            joints = np.asarray(out["joints"])[:, :n_frames]
            results.append(joints)

        if output_format == "hik":
            # HumanIK-style JSON (Maya/MotionBuilder), the reference
            # predictor's json_file output (sample/predict.py:143-145).
            from .visualize.joints2smpl import motions2hik

            return motions2hik(np.concatenate(results, axis=0))
        if output_format == "animation":
            from .visualize.plot_script import plot_3d_motion

            os.makedirs(output_dir, exist_ok=True)
            paths = []
            for r, joints in enumerate(results):
                p = os.path.join(output_dir, f"pred_{r}.mp4")
                paths.append(plot_3d_motion(p, joints[0], title=prompt,
                                            dataset=cfg.dataset, fps=cfg.fps))
            return {"animations": paths}
        return {
            "prompt": prompt,
            "fps": cfg.fps,
            "joints": [r.tolist() for r in results] if output_format == "json"
            else results,
        }
