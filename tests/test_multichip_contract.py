"""Driver-contract test for __graft_entry__.dryrun_multichip.

Round-1 failure mode (VERDICT.md item 1): the driver calls
``dryrun_multichip(8)`` from an env where JAX_PLATFORMS=axon yields one real
device; the function must bootstrap an 8-way virtual CPU mesh itself.  This
test reproduces the driver invocation exactly — a fresh interpreter, no
pre-forced CPU mesh — and requires success.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_from_underprovisioned_env():
    # Fresh interpreter, JAX_PLATFORMS=cpu with NO forced host device count
    # -> exactly 1 device, like the driver's axon-pinned env.  (We use cpu
    # rather than axon so the test does not depend on the TPU tunnel.)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "_MDM_TPU_DRYRUN_NESTED")
    }
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8); "
        "print('CONTRACT-OK')" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CONTRACT-OK" in proc.stdout


def test_make_mesh_raises_on_underprovisioned_device_count():
    import jax

    from mdm_tpu.parallel import make_mesh

    n = len(jax.devices())
    with pytest.raises(ValueError, match="device"):
        make_mesh(n_devices=n + 1)


def test_make_mesh_raises_on_indivisible_tp():
    from mdm_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="divisible"):
        make_mesh(n_devices=3, model_parallel=2)
