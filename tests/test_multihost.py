"""Multi-host (2-process jax.distributed) execution tests.

These spawn REAL multi-process worlds on localhost (2 processes x 4 virtual
CPU devices), driving the code paths that single-process tests cannot:
`shard_batch`'s `jax.make_array_from_process_local_data` branch
(parallel/mesh.py), the per-process loader row-range (cli/train.py `shard=`
wiring, data/loader.py), `multihost.replicate`, and collective orbax saves.

Reference contrast: its torch.distributed setup is entirely commented out
(/root/reference/utils/dist_util.py:18-41) — this capability is
beyond-reference, so the oracle is self-consistency: the 2-process world
must reproduce the checkpoint a 1-process 8-device run does (up to
collective reduction-order rounding; see the test docstrings).
"""
import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def synthetic_humanml(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "HumanML3D"
    (root / "new_joint_vecs").mkdir(parents=True)
    (root / "texts").mkdir()
    for i in range(12):
        name = f"{i:06d}"
        L = int(rng.integers(45, 190))
        np.save(root / "new_joint_vecs" / f"{name}.npy",
                rng.normal(size=(L, 263)).astype(np.float32))
        (root / "texts" / f"{name}.txt").write_text(
            "a person walks#a/DET person/NOUN walk/VERB#0.0#0.0\n"
        )
    for split in ("train", "test"):
        (root / f"{split}.txt").write_text("\n".join(f"{i:06d}" for i in range(12)))
    np.save(root / "Mean.npy", np.zeros(263, np.float32))
    np.save(root / "Std.npy", np.ones(263, np.float32))
    return str(root)


def test_two_process_train_step_identical_loss():
    """2x4-device world: per-process local batches assembled via
    make_array_from_process_local_data, one fused train step, identical
    loss on both processes."""
    from mdm_tpu.parallel.multihost import launch_local_multihost

    outs = launch_local_multihost(2, 4, timeout=420)
    losses = []
    for out in outs:
        m = re.search(r"multihost dryrun p\d/2: devices=8 loss=([0-9.]+) ok", out)
        assert m, out
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1]


def _run_train_cli_multihost(data_dir, save_dir, extra_env=None):
    from mdm_tpu.parallel.multihost import launch_local_multihost

    argv = [
        "--save_dir", save_dir, "--dataset", "humanml",
        "--data_dir", data_dir, "--overwrite", "--use_ema",
        "--batch_size", "8", "--latent_dim", "32", "--layers", "2",
        "--diffusion_steps", "8", "--num_steps", "2", "--save_interval", "2",
        "--log_interval", "1", "--seed", "7",
    ]
    # Match the in-process control's conftest matmul precision so rounding
    # differences come from the collectives alone.
    env = {"MDM_TPU_TRAINING_TEST": "1", "MDM_TPU_NO_RENDER": "1",
           "JAX_DEFAULT_MATMUL_PRECISION": "highest"}
    env.update(extra_env or {})
    return launch_local_multihost(
        2, 4, module="mdm_tpu.cli.train", extra_argv=argv, extra_env=env,
        timeout=420,
    )


def test_train_cli_two_process_matches_single_process(tmp_path, synthetic_humanml,
                                                      monkeypatch):
    """The train CLI under a 2-process world reproduces the checkpoint of
    the same run on one 8-device process: the loader's per-process row-range
    (cli/train.py shard wiring) + spawned per-row augmentation streams
    reconstruct the exact global batches. Cross-TOPOLOGY bit-equality is not
    achievable — the cross-process gradient all-reduce (Gloo) sums in a
    different order than the in-process collective (observed ~7e-11 on
    ~2e-4 grads) — and Adam amplifies that rounding noise to O(1e-6) on
    degenerate leaves whose true gradient is ~0 (k-projection biases: a
    per-row constant logit shift is a softmax no-op), hence the absolute
    tolerance. Within a topology the run IS deterministic (see
    test_two_process_train_step_identical_loss)."""
    from mdm_tpu.cli import train as train_cli
    from mdm_tpu.train.checkpoints import restore_pytree_numpy

    # -- control: single process, 8 virtual devices (this test process).
    ctrl_dir = str(tmp_path / "ctrl")
    monkeypatch.setenv("MDM_TPU_TRAINING_TEST", "1")
    # --use_ema so the checkpoint carries ema_params (opt-in since the
    # EMA-parity change mirrored the reference's off-by-default use_ema)
    # and the cross-topology comparison covers the EMA update too.
    train_cli.main([
        "--save_dir", ctrl_dir, "--dataset", "humanml",
        "--data_dir", synthetic_humanml, "--use_ema",
        "--batch_size", "8", "--latent_dim", "32", "--layers", "2",
        "--diffusion_steps", "8", "--num_steps", "2", "--save_interval", "2",
        "--log_interval", "1", "--seed", "7",
    ])

    # -- 2-process world, same config, shared save_dir.
    mh_dir = str(tmp_path / "mh")
    outs = _run_train_cli_multihost(synthetic_humanml, mh_dir)
    assert all("saved checkpoint" in o for o in outs), outs[0]

    assert os.path.exists(os.path.join(mh_dir, "args.json"))
    with open(os.path.join(mh_dir, "args.json")) as f:
        assert json.load(f)["batch_size"] == 8

    def load_params(d):
        ckpts = sorted(f for f in os.listdir(d) if f.startswith("ckpt_"))
        assert ckpts, os.listdir(d)
        tree = restore_pytree_numpy(os.path.join(d, ckpts[-1]))
        return tree["params"], tree["ema_params"]

    cp, ce = load_params(ctrl_dir)
    mp_, me = load_params(mh_dir)
    flat_c = jax.tree_util.tree_leaves_with_path(cp)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(mp_))
    assert flat_m, "empty multihost checkpoint"
    for path, leaf in flat_c:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_m[path]),
            rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(ce)[0]),
        np.asarray(jax.tree_util.tree_leaves(me)[0]),
        rtol=1e-4, atol=1e-5,
    )


def test_loader_shard_rows_bit_equal_global_batch(synthetic_humanml):
    """Each rank's local batch equals the corresponding row slice of the
    unsharded global batch (loader.py spawn-per-row contract)."""
    from mdm_tpu.data import get_dataset_loader

    full = get_dataset_loader("humanml", 8, num_frames=196,
                              data_root=synthetic_humanml)
    gb = next(iter(full))
    for rank in (0, 1):
        part = get_dataset_loader("humanml", 8, num_frames=196,
                                  data_root=synthetic_humanml,
                                  shard=(rank, 2))
        lb = next(iter(part))
        sl = slice(rank * 4, (rank + 1) * 4)
        np.testing.assert_array_equal(lb["x"], gb["x"][sl])
        np.testing.assert_array_equal(lb["mask"], gb["mask"][sl])
        assert list(lb["text"]) == list(gb["text"][sl])
