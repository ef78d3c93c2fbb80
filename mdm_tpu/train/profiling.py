"""Profiling helpers: wall-clock KV scopes + on-device XLA traces.

The reference only has wall-clock scopes (diffusion/logger.py:293-317);
here `trace()` additionally captures a jax.profiler trace viewable in
TensorBoard/Perfetto — the TPU-native way to see MXU utilization and HBM
stalls per op.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def timed(name: str, logger=None):
    """Wall-clock scope; logs `wait_<name>` like the reference profile_kv."""
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        if logger is not None:
            logger.logkv_mean(f"wait_{name}", elapsed)
        else:
            print(f"[profile] {name}: {elapsed:.3f}s")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mdm_tpu_trace", host_tracer_level: int = 2):
    """Capture a jax.profiler trace for the enclosed device work."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {log_dir}")


def annotate(name: str):
    """Named region inside traced code (shows up in the trace timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
