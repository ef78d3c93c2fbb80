"""Experiment-tracking platform adapters (reference train/train_platforms.py).

Explicit registry instead of `eval()`-based class lookup; every adapter
degrades to a no-op if its backend is not installed.
"""
from __future__ import annotations

from typing import Dict, Optional, Type


class TrainPlatform:
    def __init__(self, save_dir: str, **kwargs):
        self.save_dir = save_dir

    def report_scalar(self, name: str, value: float, iteration: int, group_name: str = ""):
        pass

    def report_media(self, title: str, series: str, iteration: int, local_path: str):
        pass

    def report_args(self, args: Dict, name: str):
        pass

    def close(self):
        pass


class NoPlatform(TrainPlatform):
    pass


class TensorboardPlatform(TrainPlatform):
    def __init__(self, save_dir: str, **kwargs):
        super().__init__(save_dir)
        # Prefer the torch-free writer; torch's SummaryWriter is the
        # documented fallback (the one sanctioned torch use outside tests/
        # converters — see CLAUDE.md conventions), degrading to no-op.
        self.writer = None
        for importer in (
            lambda: __import__("tensorboardX").SummaryWriter,
            lambda: __import__(
                "torch.utils.tensorboard", fromlist=["SummaryWriter"]
            ).SummaryWriter,
        ):
            try:
                self.writer = importer()(log_dir=save_dir)
                break
            except Exception:
                continue

    def report_scalar(self, name, value, iteration, group_name=""):
        if self.writer:
            self.writer.add_scalar(f"{group_name}/{name}", value, iteration)

    def close(self):
        if self.writer:
            self.writer.close()


class WandBPlatform(TrainPlatform):
    def __init__(self, save_dir: str, project: str = "mdm_tpu", resume_id: Optional[str] = None, config: Optional[dict] = None, **kwargs):
        super().__init__(save_dir)
        try:
            import wandb

            self.wandb = wandb
            self.run = wandb.init(
                project=project, dir=save_dir, resume="allow",
                id=resume_id, config=config,
            )
        except Exception:
            self.wandb = None

    def report_scalar(self, name, value, iteration, group_name=""):
        if self.wandb:
            self.wandb.log({f"{group_name}/{name}": value}, step=iteration)

    def report_media(self, title, series, iteration, local_path):
        if self.wandb and local_path.endswith(".mp4"):
            self.wandb.log({title: self.wandb.Video(local_path)}, step=iteration)

    def report_args(self, args, name):
        if self.wandb:
            self.wandb.config.update(args, allow_val_change=True)

    def close(self):
        if self.wandb:
            self.wandb.finish()


class ClearmlPlatform(TrainPlatform):
    def __init__(self, save_dir: str, task_name: str = "mdm_tpu", **kwargs):
        super().__init__(save_dir)
        try:
            from clearml import Task

            self.task = Task.init(project_name="motion_diffusion", task_name=task_name)
            self.logger = self.task.get_logger()
        except Exception:
            self.task = None
            self.logger = None

    def report_scalar(self, name, value, iteration, group_name=""):
        if self.logger:
            self.logger.report_scalar(group_name, name, value, iteration)

    def report_media(self, title, series, iteration, local_path):
        if self.logger:
            self.logger.report_media(
                title=title, series=series, iteration=iteration, local_path=local_path
            )

    def close(self):
        if self.task:
            self.task.close()


PLATFORM_REGISTRY: Dict[str, Type[TrainPlatform]] = {
    "NoPlatform": NoPlatform,
    "Tensorboard": TensorboardPlatform,
    "TensorboardPlatform": TensorboardPlatform,
    "WandB": WandBPlatform,
    "WandBPlatform": WandBPlatform,
    "ClearML": ClearmlPlatform,
    "ClearmlPlatform": ClearmlPlatform,
}


def get_platform(name: str, save_dir: str, **kwargs) -> TrainPlatform:
    return PLATFORM_REGISTRY.get(name, NoPlatform)(save_dir, **kwargs)
