"""Visualization + SMPL fitting tests (synthetic SMPL model)."""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.core import rotations as R
from mdm_tpu.smpl import SMPLModel, lbs
from mdm_tpu.visualize.joints2smpl import FitConfig, fit_smpl, motions_to_euler
from mdm_tpu.visualize.plot_script import plot_3d_motion

RNG = np.random.default_rng(41)


def synthetic_model():
    V, J, NB = 60, 24, 10
    parents = np.array(
        [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21]
    )
    jr = RNG.random((J, V)) ** 6
    jr /= jr.sum(axis=1, keepdims=True)
    w = RNG.random((V, J)) ** 6
    w /= w.sum(axis=1, keepdims=True)
    return SMPLModel(
        v_template=(RNG.normal(size=(V, 3)) * 0.4).astype(np.float32),
        shapedirs=(RNG.normal(size=(V, 3, NB)) * 0.01).astype(np.float32),
        posedirs=(RNG.normal(size=((J - 1) * 9, V * 3)) * 0.001).astype(np.float32),
        j_regressor=jr.astype(np.float32),
        parents=parents,
        lbs_weights=w.astype(np.float32),
        extra_vertex_ids=np.arange(21, dtype=np.int32),
    )


def test_fit_smpl_recovers_joints():
    model = synthetic_model()
    T = 4
    # Ground truth: small random pose
    q = RNG.normal(size=(T, 24, 4)).astype(np.float32) * 0.1
    q[..., 0] += 1.0
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rots = np.asarray(R.quaternion_to_matrix(jnp.asarray(q)))
    out = lbs(model, jnp.zeros((T, 10)), jnp.asarray(rots[:, 0]), jnp.asarray(rots[:, 1:]))
    target = np.asarray(out["joints"][:, :22])

    fit = fit_smpl(model, target, FitConfig(iterations=300, lr=0.03, pose_reg=1e-5))
    err = np.abs(fit["joints"][:, :22] - target).mean()
    init_err = np.abs(
        np.asarray(
            lbs(model, jnp.zeros((T, 10)),
                jnp.broadcast_to(jnp.eye(3), (T, 3, 3)),
                jnp.broadcast_to(jnp.eye(3), (T, 23, 3, 3)))["joints"][:, :22]
        ) - target
    ).mean()
    assert err < init_err * 0.5  # fitting clearly reduces joint error
    assert fit["thetas"].shape == (T, 25, 6)
    assert np.all(np.diff([fit["losses"][0], fit["losses"][-1]]) < 0)


def test_motions_to_euler_roundtrip():
    q = RNG.normal(size=(3, 24, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    d6 = np.asarray(R.matrix_to_rotation_6d(R.quaternion_to_matrix(jnp.asarray(q))))
    euler = motions_to_euler(d6, "XYZ")
    back = R.euler_angles_to_matrix(jnp.asarray(np.radians(euler)), "XYZ")
    orig = R.rotation_6d_to_matrix(jnp.asarray(d6))
    np.testing.assert_allclose(np.asarray(back), np.asarray(orig), atol=1e-4)


def test_plot_3d_motion_renders(tmp_path):
    joints = np.cumsum(RNG.normal(scale=0.01, size=(8, 22, 3)), axis=0)
    path = plot_3d_motion(str(tmp_path / "m.mp4"), joints, title="test walk", fps=4)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 0


def test_motions2hik_from_thetas():
    from mdm_tpu.visualize.joints2smpl import HIK_JOINT_MAP, motions2hik

    q = RNG.normal(size=(2, 5, 25, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    d6 = np.asarray(R.matrix_to_rotation_6d(R.quaternion_to_matrix(jnp.asarray(q))))
    out = motions2hik(d6)
    assert out["joint_map"] == HIK_JOINT_MAP
    thetas = np.asarray(out["thetas"])
    assert thetas.shape == (2, 5, 24, 3)
    trans = np.asarray(out["root_translation"])
    assert trans.shape == (2, 5, 3)


def test_render_mesh_cli(tmp_path, monkeypatch):
    """render_mesh CLI: results.npy -> smpl_params.npy + per-frame .obj
    (reference visualize/render_mesh.py + vis_utils.npy2obj), on the
    synthetic small-mesh SMPL."""
    import mdm_tpu.visualize.joints2smpl as j2s
    from mdm_tpu.cli import render_mesh as rm_cli

    model = synthetic_model()
    monkeypatch.setattr(j2s.SMPLModel, "load", classmethod(lambda cls, *a, **k: model))

    T, J = 3, 22
    motion = RNG.normal(size=(1, T, J, 3)).astype(np.float32) * 0.2
    npy_path = str(tmp_path / "results.npy")
    np.save(npy_path, {"motion": motion, "text": ["x"], "lengths": np.array([T]),
                       "num_samples": 1, "num_repetitions": 1})

    out_dir = str(tmp_path / "objs")
    rm_cli.main(["--input_path", npy_path, "--iterations", "8",
                 "--out_dir", out_dir])
    assert os.path.exists(os.path.join(out_dir, "smpl_params.npy"))
    objs = [f for f in os.listdir(out_dir) if f.endswith(".obj")]
    assert len(objs) == T
    first = open(os.path.join(out_dir, sorted(objs)[0])).read()
    assert first.startswith("v ")  # vertices (synthetic model has no faces)
