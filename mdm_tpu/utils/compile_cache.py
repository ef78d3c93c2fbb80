"""Persistent XLA compilation cache (VERDICT r4 item 4).

Every eval-protocol / CLI process used to pay the full compile bill on
startup (~155 s of Pallas + XLA compiles for the t2m protocol,
docs/BENCHMARKS.md). JAX can persist compiled executables to disk and reload
them across processes; this module turns that on with one call, honoring:

- `MDM_TPU_COMPILE_CACHE=0`  — opt out entirely.
- `MDM_TPU_COMPILE_CACHE=<dir>` — cache directory override.
- default directory: `~/.cache/mdm_tpu/xla` (created on demand).

The thresholds are set to 0 so even small programs cache — the protocol's
cost is many medium-sized programs, not one giant one. Safe to call more
than once; only the first call wins (matching jax's own semantics).

The reference has no equivalent (torch eager, no persistent compile cache);
this is TPU-native plumbing, not a parity surface.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "mdm_tpu", "xla")
_enabled_dir = None


def enable_compile_cache() -> str | None:
    """Enable the persistent compilation cache; returns the directory used
    (None when opted out via MDM_TPU_COMPILE_CACHE=0)."""
    global _enabled_dir
    env = os.environ.get("MDM_TPU_COMPILE_CACHE", "")
    if env == "0":
        return None
    if _enabled_dir is not None:
        return _enabled_dir
    cache_dir = env if env not in ("", "1") else _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program (default min entry size 1 MiB / min compile time
    # 1 s would skip most of the protocol's many medium programs).
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    _enabled_dir = cache_dir
    return cache_dir
