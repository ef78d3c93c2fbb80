"""Host-side training loop around the jitted train step.

Reference: TrainLoop (train/training_loop.py:37-475). The per-step work —
t-sampling, q_sample, forward, loss, backward, AdamW, EMA, LR anneal — is
one fused XLA program (`make_train_step`); this loop only feeds sharded
batches, logs KVs, checkpoints, and runs eval/generate callbacks.

Env hook: MDM_TPU_TRAINING_TEST=1 stops after the first save (the
reference's DIFFUSION_TRAINING_TEST smoke-test seam, training_loop.py:241).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import shard_batch
from .checkpoints import find_resume_checkpoint, restore_checkpoint, save_args, save_checkpoint
from .logger import KVLogger
from .platforms import TrainPlatform, NoPlatform


@dataclass
class LoopConfig:
    save_dir: str = "save/run"
    num_steps: int = 600_000
    log_interval: int = 1_000
    save_interval: int = 50_000
    eval_during_training: bool = False
    gen_during_training: bool = False
    resume: bool = True
    # explicit checkpoint to resume from; save_dir auto-scan wins when both
    # exist (reference training_loop.py:131: find_resume_checkpoint() or
    # self.resume_checkpoint)
    resume_checkpoint: str = ""
    # non-empty: capture a jax.profiler trace of steps 2..6 (post-compile)
    # into this directory — TensorBoard/Perfetto-viewable MXU/HBM timeline
    profile_trace_dir: str = ""


class TrainLoop:
    def __init__(
        self,
        train_step: Callable,
        state,
        data_iter: Iterable,
        config: LoopConfig,
        *,
        args: Optional[Dict[str, Any]] = None,
        platform: Optional[TrainPlatform] = None,
        eval_fn: Optional[Callable[[Any, int], Dict[str, float]]] = None,
        gen_fn: Optional[Callable[[Any, int], Optional[str]]] = None,
        rng_seed: int = 10,
    ):
        self.train_step = train_step
        self.state = state
        self.config = config
        # Multi-host: every process runs the loop (orbax checkpoint saves are
        # collective) but only process 0 owns the file side effects —
        # args.json, progress.csv/jsonl, platform reporting.
        self.is_primary = jax.process_index() == 0
        self.platform = platform or NoPlatform(config.save_dir)
        self.logger = KVLogger(config.save_dir if self.is_primary else None)
        self.eval_fn = eval_fn
        self.gen_fn = gen_fn
        # Per-step keys are fold_in(base, step) — a pure function of the step
        # index, never a carried mutable stream — so a resumed run draws the
        # exact keys the uninterrupted run would have (the reference restores
        # only weights and lets torch's global RNG drift, training_loop.py:385).
        self.base_key = jax.random.PRNGKey(rng_seed)
        # Device-side metric accumulator: summing on device keeps the loop
        # fully async — pulling each metric to host every step (the reference
        # logs `.item()` per step, training_loop.py:359,469-475) forces a
        # device sync that serializes host batch build against the step and
        # caps loop throughput well below the bare-step rate.
        self._metric_add = jax.jit(lambda acc, m: jax.tree.map(jnp.add, acc, m))

        os.makedirs(config.save_dir, exist_ok=True)
        if args is not None and self.is_primary:
            save_args(config.save_dir, args)
            self.platform.report_args(args, "args")

        if config.resume:
            found = find_resume_checkpoint(config.save_dir)
            if not found and config.resume_checkpoint:
                found = (config.resume_checkpoint, -1)
            if found:
                path, step = found
                print(f"resuming from {path}" + (f" (step {step})" if step >= 0 else ""))
                self.state = restore_checkpoint(path, self.state)

        # Fast-forward the data stream to the resumed step when the iterable
        # supports it (BatchIterator.iter_from); together with fold_in keys
        # this makes resume bit-exact. Plain generators just start fresh.
        if hasattr(data_iter, "iter_from"):
            self.data_iter = data_iter.iter_from(self.step)
        else:
            self.data_iter = iter(data_iter)

    @property
    def step(self) -> int:
        return int(np.asarray(self.state.step))

    def run(self):
        cfg = self.config
        t_last = time.time()
        # Host-side mirror of state.step: avoids a blocking device read per
        # iteration just to derive the step key / decide logging.
        step = self.step
        tracing = False
        # Accumulated (unpulled) metric sums + batch size of the window.
        acc = None
        acc_n = 0
        batch_size = None
        try:
            while step < cfg.num_steps:
                if cfg.profile_trace_dir and step == 2 and not tracing:
                    jax.profiler.start_trace(cfg.profile_trace_dir)
                    tracing = True
                batch = next(self.data_iter)
                batch = shard_batch(batch)
                if batch_size is None:
                    batch_size = (
                        int(batch["x"].shape[0])
                        if isinstance(batch, dict) and "x" in batch
                        else 0
                    )
                sub = jax.random.fold_in(self.base_key, step)
                self.state, metrics = self.train_step(self.state, batch, sub)
                # No host pull here: keep the arrays on device and fold them
                # into the running sums with a tiny jitted add.
                acc = metrics if acc is None else self._metric_add(acc, metrics)
                acc_n += 1

                step += 1
                if tracing and step >= 7:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    tracing = False
                    print(f"profiler trace written to {cfg.profile_trace_dir}")

                if step % cfg.log_interval == 0 or step == cfg.num_steps:
                    # ONE device sync per log window. device_get on the whole
                    # pytree also waits for every step in the window, so the
                    # steps_per_sec below is an honest end-to-end number.
                    # A final partial window (num_steps not a multiple, or a
                    # resume mid-window) flushes too, with the REAL window
                    # length in the rate — not cfg.log_interval.
                    host = jax.device_get(acc)
                    for k, v in host.items():
                        self.logger.logkv(k, float(v) / acc_n)
                    window = acc_n
                    acc = None
                    acc_n = 0
                    self.logger.logkv("step", step)
                    sps = window / max(time.time() - t_last, 1e-9)
                    self.logger.logkv("steps_per_sec", sps)
                    if batch_size:
                        self.logger.logkv("samples_per_sec", sps * batch_size)
                    t_last = time.time()
                    for k, v in self.logger.dumpkvs().items():
                        self.platform.report_scalar(k, v, step, group_name="Loss")

                if step % cfg.save_interval == 0 or step == cfg.num_steps:
                    self.save()
                    if self.eval_fn and cfg.eval_during_training:
                        for k, v in (self.eval_fn(self.state, step) or {}).items():
                            self.platform.report_scalar(k, v, step, group_name="Eval")
                    if self.gen_fn and cfg.gen_during_training:
                        media = self.gen_fn(self.state, step)
                        for m in ([media] if isinstance(media, str) else media or []):
                            self.platform.report_media("Motion", "gen", step, m)
                    if os.environ.get("MDM_TPU_TRAINING_TEST", ""):
                        print("MDM_TPU_TRAINING_TEST set: stopping after first save")
                        return
        finally:
            if tracing:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {cfg.profile_trace_dir}")

    def save(self):
        path = save_checkpoint(self.config.save_dir, self.step, self.state)
        print(f"saved checkpoint {path}")
        return path
