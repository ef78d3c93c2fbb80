"""Test configuration.

Runs JAX on a virtual 8-device CPU mesh so sharding/collective tests work
without TPU hardware. Torch (CPU) is used as a golden-value oracle by
importing the *reference* implementation at /root/reference (read-only).
"""
import os
import sys

# Must be set before jax import. The environment may pin JAX_PLATFORMS to the
# TPU tunnel ("axon"); tests always run on the virtual CPU mesh, so override.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Skip slow matplotlib video rendering inside CLI tests.
os.environ.setdefault("MDM_TPU_NO_RENDER", "1")

import jax  # noqa: E402

# The axon PJRT plugin can override JAX_PLATFORMS at import time; the config
# knob below wins regardless of plugin registration order.
jax.config.update("jax_platforms", "cpu")
# Golden-value tests compare against torch float32; keep matmuls full-precision
# on every backend (TPU would otherwise default to bf16 passes).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: repeat suite runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/mdm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def add_reference_to_path():
    """Make the reference implementation importable as a test oracle."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_path():
    add_reference_to_path()
    return REFERENCE_ROOT
