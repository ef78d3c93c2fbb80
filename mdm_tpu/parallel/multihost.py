"""Multi-host (multi-process) bootstrap and replication helpers.

The reference's distributed setup is dead code (its torch.distributed init
is commented out, /root/reference/utils/dist_util.py:18-41). Here the
multi-host path is real and executed: `jax.distributed` processes, one per
host, each feeding ONLY its row range of every global batch
(data/loader.py `shard=`), assembled in place by
`parallel.mesh.shard_batch` via `jax.make_array_from_process_local_data`.

Activation is launcher-driven through environment variables, so the same
`mdm_tpu.cli.train` invocation works single-process, on a TPU pod slice
(where `jax.distributed.initialize()` auto-detects), or under an explicit
coordinator:

  MDM_TPU_COORDINATOR   host:port of process 0 (presence turns this on)
  MDM_TPU_NUM_PROCESSES world size
  MDM_TPU_PROCESS_ID    this process's rank
  MDM_TPU_MULTIHOST=auto  use jax.distributed.initialize() auto-detection
                          (TPU pod metadata) instead of explicit env vars

`launch_local_multihost` spawns an N-process world on localhost over
virtual CPU devices — the same code path a real pod takes, executable on
one machine. It backs `tests/test_multihost.py` and the driver's
`__graft_entry__.dryrun_multichip` multi-process phase.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import Optional

import numpy as np


def maybe_initialize_distributed() -> int:
    """Initialize jax.distributed from the environment; return process_index.

    Must run before the first JAX backend use in the process. No-op (returns
    0) when the env doesn't request multi-process mode or when already
    initialized.
    """
    import jax

    mode = os.environ.get("MDM_TPU_MULTIHOST", "")
    coord = os.environ.get("MDM_TPU_COORDINATOR", "")
    if not coord and mode != "auto":
        return 0
    # The axon PJRT plugin can override JAX_PLATFORMS at import time (see
    # tests/conftest.py); in multihost mode, honor the launcher's explicit
    # platform request before the backend comes up.
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    already = False
    try:  # best-effort idempotence probe (private API; absence is fine)
        already = jax._src.distributed.global_state.client is not None
    except AttributeError:
        pass
    if not already:
        if mode == "auto":
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["MDM_TPU_NUM_PROCESSES"]),
                process_id=int(os.environ["MDM_TPU_PROCESS_ID"]),
            )
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns file-side effects (logs, args.json)."""
    import jax

    return jax.process_index() == 0


def replicate(tree, mesh=None):
    """Re-home a per-process pytree as fully-replicated GLOBAL arrays.

    Under `jax.distributed` a pytree built process-locally (e.g. params from
    a local `model.init`, optimizer state from `create_train_state`) lives on
    the process's own devices only; a jit spanning the global mesh rejects
    such inputs. Every process holds the identical value (inits are
    deterministic in the seed), so each leaf IS its own global replica:
    assemble with `make_array_from_process_local_data` on a fully-replicated
    spec. Single-process: returns the tree unchanged.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return tree
    from .mesh import get_mesh

    sh = NamedSharding(mesh or get_mesh(), P())

    def put(x):
        if x is None or not hasattr(x, "shape"):
            return x
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def find_free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch_local_multihost(
    num_processes: int,
    devices_per_process: int,
    module: str = "mdm_tpu.parallel.multihost",
    extra_argv: Optional[list] = None,
    extra_env: Optional[dict] = None,
    timeout: float = 600.0,
) -> list:
    """Spawn an N-process jax.distributed world on localhost CPU devices.

    Each process gets `devices_per_process` virtual CPU devices and the
    MDM_TPU_* coordinator env vars; `module` is run with `-m`. Returns the
    list of completed processes; raises on any nonzero exit, with both
    processes' output attached.
    """
    port = find_free_port()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.update(extra_env or {})
        env["JAX_PLATFORMS"] = "cpu"
        flags = [
            f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")
        ]
        flags.append(
            f"--xla_force_host_platform_device_count={devices_per_process}"
        )
        env["XLA_FLAGS"] = " ".join(flags)
        env["MDM_TPU_COORDINATOR"] = f"localhost:{port}"
        env["MDM_TPU_NUM_PROCESSES"] = str(num_processes)
        env["MDM_TPU_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-u", "-m", module] + (extra_argv or []),
                env=env, cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs, rcs = [], []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        rcs.append(p.returncode)
    if any(rcs):
        raise RuntimeError(
            "multihost launch failed (rcs=%s)\n%s"
            % (rcs, "\n".join(f"--- process {i} ---\n{o}" for i, o in enumerate(outs)))
        )
    return outs


def _dryrun_worker() -> None:
    """One process of the multi-host dryrun: global DP mesh over all
    processes' devices, per-process LOCAL batch rows assembled by
    `shard_batch`'s `make_array_from_process_local_data` branch, one fused
    train step, loss printed (identical across processes by construction).
    """
    maybe_initialize_distributed()
    import jax
    import jax.numpy as jnp

    from ..diffusion import LossConfig, Schedule
    from ..models import MDM, Conditioning, MDMConfig
    from ..train import OptimConfig, TrainStepConfig, create_train_state, make_train_step
    from .mesh import make_mesh, shard_batch

    rank, world = jax.process_index(), jax.process_count()
    n = len(jax.devices())
    mesh = make_mesh(n_devices=n)
    B, T = n, 32  # one sample per device globally
    local = B // world

    cfg = MDMConfig(njoints=263, nfeats=1, latent_dim=64, ff_size=128,
                    num_layers=2, num_heads=4)
    model = MDM(cfg)
    x0 = jnp.zeros((local, T, 263), jnp.float32)
    cond_local = Conditioning(
        frames_mask=np.ones((local, T), bool),
        text_embed=np.zeros((local, 512), np.float32),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((local,), jnp.int32),
        Conditioning(frames_mask=jnp.asarray(cond_local.frames_mask),
                     text_embed=jnp.asarray(cond_local.text_embed)),
    )["params"]

    sched = Schedule.create("cosine", 50)
    config = TrainStepConfig(loss=LossConfig(), optim=OptimConfig(lr=1e-4))
    state = replicate(create_train_state(params, config.optim), mesh)
    step = make_train_step(model.apply, sched, config)

    # Each process contributes ONLY its row range of the global batch; the
    # full [B, T, 263] array never exists on any single host.
    rng = np.random.default_rng(0)
    x_global = rng.normal(size=(B, T, 263)).astype(np.float32)
    batch = shard_batch(
        {
            "x": x_global[rank * local:(rank + 1) * local],
            "mask": np.ones((local, T), bool),
            "cond": cond_local,
        },
        mesh,
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), loss
    print(f"multihost dryrun p{rank}/{world}: devices={n} loss={loss:.6f} ok",
          flush=True)


if __name__ == "__main__":
    _dryrun_worker()
