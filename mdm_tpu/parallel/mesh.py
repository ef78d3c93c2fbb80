"""Device mesh and sharding helpers (data parallel over ICI, DCN multi-slice).

The reference has no working distributed path (its torch.distributed setup
is commented out, /root/reference/utils/dist_util.py:18-41). Here data
parallelism is first-class: a 1-D (or 2-D data x model) `jax.sharding.Mesh`,
`NamedSharding` annotations on the batch axis, and XLA-inserted psums for
gradients inside the jitted train step. Parameters and EMA are replicated;
batches are sharded on axis 0.

Multi-slice (SURVEY §5.8): `make_mesh(num_slices=k)` builds a hybrid
('slice', 'data', 'model') mesh — the 'data' axis lies within a slice (its
gradient all-reduce rides ICI) and 'slice' crosses DCN, so the cross-slice
traffic is one slice-level partial per step. Batches shard over
('slice', 'data') combined. On real multi-slice hardware the layout comes
from `jax.experimental.mesh_utils.create_hybrid_device_mesh` (slice_index
aware); virtual/CPU meshes fall back to contiguous-order grouping.

Multi-host input: `shard_batch` detects `jax.process_count() > 1` and
assembles the global batch from each process's LOCAL batch via
`jax.make_array_from_process_local_data` — no host ever materializes the
global array.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SLICE_AXIS = "slice"
DATA_AXIS = "data"
MODEL_AXIS = "model"

_active_mesh: Optional[Mesh] = None


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
    num_slices: int = 1,
) -> Mesh:
    """Create a ('data', 'model') mesh — or, with num_slices > 1, a hybrid
    ('slice', 'data', 'model') mesh whose slice axis crosses DCN.
    model_parallel=1 => pure DP."""
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
    if n % (model_parallel * num_slices) != 0:
        raise ValueError(
            f"{n} devices not divisible by tp={model_parallel} x "
            f"slices={num_slices}"
        )
    if num_slices > 1:
        dp = n // (model_parallel * num_slices)
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_hybrid_device_mesh(
                (1, dp, model_parallel), (num_slices, 1, 1), devices=devs
            )
        except (ValueError, AssertionError, AttributeError):
            # Virtual/CPU devices carry no slice_index topology info; the
            # flat enumeration order is ICI-contiguous per (virtual) slice.
            grid = np.asarray(devs).reshape(num_slices, dp, model_parallel)
        _active_mesh = Mesh(grid, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))
        return _active_mesh
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


def batch_axes(mesh: Optional[Mesh] = None):
    """Mesh axis name(s) the batch dimension shards over."""
    mesh = mesh or get_mesh()
    if SLICE_AXIS in mesh.axis_names:
        return (SLICE_AXIS, DATA_AXIS)
    return DATA_AXIS


def batch_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split over the data (and, on a
    hybrid mesh, slice) axes."""
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh: Optional[Mesh] = None) -> NamedSharding:
    return NamedSharding(mesh or get_mesh(), P())


def shard_batch(tree, mesh: Optional[Mesh] = None):
    """Device-put every array in a pytree with its batch axis sharded.

    Single-process: a plain device_put (no copy when already resident with
    the right sharding). Multi-process (jax.process_count() > 1): each
    process passes its LOCAL batch shard and the global array is assembled
    in place via `jax.make_array_from_process_local_data` — the input path
    survives multi-host runs without any host holding the global batch.
    """
    mesh = mesh or get_mesh()
    sh = batch_sharding(mesh)
    multiproc = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        if isinstance(x, jax.Array) and x.sharding == sh:
            # Already laid out (e.g. cache_device_batches re-fed through the
            # loop) — a no-op, and under multi-process the np.asarray below
            # would crash on a global (non-fully-addressable) array.
            return x
        if multiproc:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, tree)
