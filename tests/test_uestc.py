"""UESTC loader on a synthetic vibe cache (camera-depth + view rotation)."""
import os
import pickle

import numpy as np
import pytest

from mdm_tpu.data.a2m import A2MConfig, UESTC, solve_camera_depth, trans_from_vibe

RNG = np.random.default_rng(61)


@pytest.fixture()
def uestc_dir(tmp_path):
    d = tmp_path / "uestc"
    (d / "info").mkdir(parents=True)
    names, poses, joints, cams = [], [], [], []
    n_frames = []
    for i in range(6):
        action = i % 3
        view = i % 8
        subject = [1, 3][i % 2]  # 1 is train, 3 is test
        side = 1 + (i % 2)
        names.append(f"a{action}_d{view}_p{subject}_c{side}_color.avi")
        L = int(RNG.integers(50, 80))
        poses.append(RNG.normal(size=(L, 72)).astype(np.float32) * 0.1)
        joints.append(RNG.normal(size=(L, 49, 3)).astype(np.float32))
        cams.append(
            np.concatenate(
                [RNG.uniform(0.5, 1.5, (L, 2)), RNG.normal(size=(L, 2)) * 0.1], axis=1
            ).astype(np.float32)
        )
        n_frames.append(L)
    with open(d / "vibe_cache_refined.pkl", "wb") as f:
        pickle.dump({"pose": poses, "joints3d": joints, "orig_cam": cams}, f)
    (d / "info" / "names.txt").write_text("\n".join(names))
    (d / "info" / "num_frames_min.txt").write_text("\n".join(map(str, n_frames)))
    (d / "info" / "action_classes.txt").write_text("\n".join(f"act{i}" for i in range(40)))
    return str(d)


def test_camera_depth_positive():
    joints = RNG.normal(size=(49, 3)).astype(np.float32)
    z = solve_camera_depth(1.0, np.zeros(2), joints)
    assert z > 0


def test_trans_from_vibe_starts_at_origin():
    cams = RNG.normal(size=(10, 4)).astype(np.float32)
    cams[:, 0] = 1.0
    joints = RNG.normal(size=(10, 49, 3)).astype(np.float32)
    tr = trans_from_vibe(cams, joints)
    np.testing.assert_allclose(tr[0], 0.0)


def test_uestc_loader_splits_and_samples(uestc_dir):
    ds = UESTC(A2MConfig(num_frames=30), datapath=uestc_dir)
    assert ds.num_actions == 40
    assert len(ds._train) > 0 and len(ds._test) > 0
    # side-2 view-8 entries would be dropped; all subjects partitioned
    ds.split = "train"
    s = ds.sample(0, RNG)
    assert s["motion"].shape == (30, 25 * 6)
    assert s["action_text"].startswith("act")


@pytest.mark.slow
def test_train_uestc_cli(uestc_dir, tmp_path, monkeypatch):
    """UESTC training path through the CLI (40 actions, rot6d, view/camera
    preprocessing) — end to end to a checkpoint + args.json."""
    import json
    import os

    from mdm_tpu.cli import train as train_cli

    save_dir = str(tmp_path / "run_uestc")
    monkeypatch.setenv("MDM_TPU_TRAINING_TEST", "1")
    train_cli.main([
        "--save_dir", save_dir, "--dataset", "uestc",
        "--data_dir", uestc_dir,
        "--batch_size", "2", "--latent_dim", "32", "--layers", "2",
        "--diffusion_steps", "8", "--num_steps", "2", "--save_interval", "2",
        "--log_interval", "1", "--num_frames", "60",
    ])
    assert any(f.startswith("ckpt_") for f in os.listdir(save_dir))
    with open(os.path.join(save_dir, "args.json")) as f:
        saved = json.load(f)
    assert saved["cond_mode"] == "action"


@pytest.mark.slow
def test_eval_a2m_cli_uestc(uestc_dir, tmp_path, monkeypatch):
    """eval_a2m CLI on UESTC: rot6d features through the STGCN(smpl layout)
    classifier protocol (reference stgcn_eval.py), degraded-stamped without
    the classifier asset."""
    import json
    import os

    import numpy as np

    from mdm_tpu.cli import eval_a2m as ev_cli
    from mdm_tpu.cli import train as train_cli

    save_dir = str(tmp_path / "run_uestc_ev")
    monkeypatch.setenv("MDM_TPU_TRAINING_TEST", "1")
    train_cli.main([
        "--save_dir", save_dir, "--dataset", "uestc",
        "--data_dir", uestc_dir,
        "--batch_size", "2", "--latent_dim", "32", "--layers", "2",
        "--diffusion_steps", "8", "--num_steps", "2", "--save_interval", "2",
        "--log_interval", "1", "--num_frames", "60",
    ])
    ckpts = sorted(f for f in os.listdir(save_dir) if f.startswith("ckpt_"))
    summary = ev_cli.main([
        "--model_path", os.path.join(save_dir, ckpts[-1]),
        "--dataset", "uestc", "--data_dir", uestc_dir,
        "--eval_mode", "debug",
    ])
    for metric in ("accuracy_gen", "fid_gen"):
        assert metric in summary
        assert np.isfinite(summary[metric]["mean"])
    assert summary["comparable"] is False


@pytest.mark.slow
def test_train_a2m_classifier_uestc(uestc_dir, tmp_path, monkeypatch):
    """--stage a2m_classifier --dataset uestc trains the protocol's own
    architecture — an STGCN on rot6d [B,T,24,6] (reference
    eval/a2m/stgcn_eval.py:58-60) — records arch/feature in the blob, and
    the eval CLI reconstructs the identical pipeline from
    --a2m_classifier_path (self-trained, not degraded)."""
    import numpy as np

    from mdm_tpu.cli import eval_a2m as ev_cli
    from mdm_tpu.cli import train as train_cli
    from mdm_tpu.cli import train_evaluators as tev_cli
    from mdm_tpu.eval.train_evaluators import load_evaluator_params

    clf_path = str(tmp_path / "uestc_stgcn.npy")
    tev_cli.main([
        "--stage", "a2m_classifier", "--dataset", "uestc",
        "--data_dir", uestc_dir, "--save_path", clf_path,
        "--batch_size", "2", "--num_steps", "3", "--log_every", "1",
    ])
    blob = load_evaluator_params(clf_path)
    assert blob["arch"] == "stgcn" and blob["feature"] == "rot6d"
    assert blob["num_actions"] == 40 and blob["input_size"] == 6

    save_dir = str(tmp_path / "run_uestc_clf")
    monkeypatch.setenv("MDM_TPU_TRAINING_TEST", "1")
    train_cli.main([
        "--save_dir", save_dir, "--dataset", "uestc",
        "--data_dir", uestc_dir,
        "--batch_size", "2", "--latent_dim", "32", "--layers", "2",
        "--diffusion_steps", "8", "--num_steps", "2", "--save_interval", "2",
        "--log_interval", "1", "--num_frames", "60",
    ])
    ckpts = sorted(f for f in os.listdir(save_dir) if f.startswith("ckpt_"))
    summary = ev_cli.main([
        "--model_path", os.path.join(save_dir, ckpts[-1]),
        "--dataset", "uestc", "--data_dir", uestc_dir,
        "--eval_mode", "debug", "--a2m_classifier_path", clf_path,
    ])
    assert np.isfinite(summary["accuracy_gen"]["mean"])
    assert np.isfinite(summary["fid_gen"]["mean"])
    assert summary["classifier"] == "self-trained"
