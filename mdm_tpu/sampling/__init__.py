"""Generation/editing pipelines."""
from .pipeline import (  # noqa: F401
    GenerationConfig,
    MotionGenerator,
    auto_mesh,
    in_between_mask,
    load_norm_stats,
    upper_body_mask,
)
