"""mdm_tpu: a TPU-native motion-diffusion framework.

Re-implements the full capability surface of GuyTevet/motion-diffusion-model
(MDM + DiP) as an idiomatic JAX/XLA/Pallas framework:

- ``mdm_tpu.core``      -- geometry: quaternions, rotation reps, FK, HumanML codec
- ``mdm_tpu.diffusion`` -- Gaussian diffusion engine (schedules, respacing,
                           scan-based samplers, training losses)
- ``mdm_tpu.models``    -- Flax denoisers (MDM trans_enc / trans_dec / gru),
                           text encoders, CFG, autoregressive (DiP) sampling
- ``mdm_tpu.ops``       -- Pallas TPU kernels for hot ops
- ``mdm_tpu.parallel``  -- device mesh / sharding utilities (data parallel over ICI)
- ``mdm_tpu.data``      -- host-side dataset pipelines emitting fixed-shape batches
- ``mdm_tpu.train``     -- jitted train step, EMA, checkpointing, platforms
- ``mdm_tpu.sampling``  -- generate/edit entry points
- ``mdm_tpu.eval``      -- metric suites (R-precision, FID, diversity, ...)
- ``mdm_tpu.smpl``      -- differentiable SMPL LBS layer + rot2xyz

The reference (mounted read-only at /root/reference) is pure Python/PyTorch;
this package is a ground-up JAX design, not a port: fixed static shapes,
samplers as single fused XLA programs (lax.scan), PRNG-key threading instead
of global seeds, and sharding-aware training the reference lacks.
"""

__version__ = "0.1.0"
