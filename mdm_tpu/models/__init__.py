"""Denoisers, conditioning, CFG, and checkpoint conversion."""
from .mdm import MDM, Conditioning, MDMConfig, cfg_denoiser  # noqa: F401
from . import convert, layers  # noqa: F401
