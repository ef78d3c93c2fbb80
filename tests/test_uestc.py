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
