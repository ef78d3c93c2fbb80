"""Training runtime: jitted step, EMA, checkpoints, loop, platforms."""
from .state import OptimConfig, TrainState, create_train_state  # noqa: F401
from .train_step import TrainStepConfig, make_train_step  # noqa: F401
from .loop import LoopConfig, TrainLoop  # noqa: F401
from . import checkpoints, logger, platforms, resample  # noqa: F401
