"""Device mesh and sharding helpers (data parallel over ICI).

The reference has no working distributed path (its torch.distributed setup
is commented out, /root/reference/utils/dist_util.py:18-41). Here data
parallelism is first-class: a 1-D (or 2-D data x model) `jax.sharding.Mesh`,
`NamedSharding` annotations on the batch axis, and XLA-inserted psums for
gradients inside the jitted train step. Parameters and EMA are replicated;
batches are sharded on axis 0.

On multi-slice deployments the data axis should be laid out so the gradient
all-reduce rides ICI within a slice and only the slice-level partial crosses
DCN — `make_mesh` keeps the default device order, which JAX already arranges
ICI-contiguously.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_active_mesh: Optional[Mesh] = None


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh. model_parallel=1 => pure DP."""
    global _active_mesh
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh(n_devices={n_devices}) but only {len(devs)} JAX "
                f"device(s) are visible (platform="
                f"{devs[0].platform if devs else '?'}). For a virtual mesh, "
                f"start the process with JAX_PLATFORMS=cpu and XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices} (or use "
                f"__graft_entry__.dryrun_multichip, which bootstraps this)."
            )
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by tp={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    _active_mesh = Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    return _active_mesh


def make_mesh_for_batch(batch_size: int, model_parallel: int = 1) -> Mesh:
    """Mesh whose data axis divides the global batch (avoids ragged shards)."""
    n = len(jax.devices())
    dp = n // model_parallel
    while dp > 1 and batch_size % dp != 0:
        dp -= 1
    return make_mesh(n_devices=dp * model_parallel, model_parallel=model_parallel)


def get_mesh() -> Mesh:
    global _active_mesh
    if _active_mesh is None:
        make_mesh()
    return _active_mesh


def batch_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split over the data axis."""
    return NamedSharding(mesh or get_mesh(), P(DATA_AXIS))


def replicated(mesh: Optional[Mesh] = None) -> NamedSharding:
    return NamedSharding(mesh or get_mesh(), P())


def shard_batch(tree, mesh: Optional[Mesh] = None):
    """Device-put every array in a pytree with its batch axis sharded."""
    mesh = mesh or get_mesh()
    sh = batch_sharding(mesh)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, tree)
