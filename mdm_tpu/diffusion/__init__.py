"""Diffusion engine: schedules, q/p algebra, scan samplers, losses."""
from .schedule import MeanType, Schedule, VarType, named_beta_schedule, space_timesteps  # noqa: F401
from . import gaussian, losses, samplers  # noqa: F401
from .samplers import (  # noqa: F401
    SamplerConfig,
    ddim_sample_loop,
    dpmpp_2m_sample_loop,
    p_sample_loop,
    plms_sample_loop,
)
from .losses import LossConfig, masked_l2, training_losses  # noqa: F401
