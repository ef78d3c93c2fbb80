"""Visualization and export tools (host-side)."""
from .plot_script import plot_3d_motion, save_multiple_samples  # noqa: F401
