"""SMPL LBS: validated against an independent straight-line numpy
implementation on a synthetic small-mesh model (the real SMPL_NEUTRAL.pkl is
a downloaded asset; math must be correct regardless of mesh size)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.core import rotations as R
from mdm_tpu.smpl import Rot2XYZConfig, SMPLModel, lbs, rot2xyz

RNG = np.random.default_rng(21)
V, J, NB = 40, 24, 10


def synthetic_model():
    parents = np.array(
        [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21]
    )
    jr = RNG.random((J, V)) ** 4
    jr = jr / jr.sum(axis=1, keepdims=True)
    w = RNG.random((V, J)) ** 4
    w = w / w.sum(axis=1, keepdims=True)
    return SMPLModel(
        v_template=RNG.normal(size=(V, 3)).astype(np.float32),
        shapedirs=(RNG.normal(size=(V, 3, NB)) * 0.01).astype(np.float32),
        posedirs=(RNG.normal(size=((J - 1) * 9, V * 3)) * 0.01).astype(np.float32),
        j_regressor=jr.astype(np.float32),
        parents=parents,
        lbs_weights=w.astype(np.float32),
        extra_vertex_ids=np.arange(21, dtype=np.int32),  # synthetic mesh is small
        j_regressor_extra=(RNG.random((9, V)).astype(np.float32)),
    )


def numpy_lbs_reference(model, betas, global_orient, body_pose):
    """Independent dense-loop implementation of standard SMPL LBS."""
    B = betas.shape[0]
    out_verts = np.zeros((B, V, 3))
    out_joints = np.zeros((B, J, 3))
    for b in range(B):
        v_shaped = model.v_template + model.shapedirs @ betas[b]
        j_rest = model.j_regressor @ v_shaped
        rots = np.concatenate([global_orient[b][None], body_pose[b]], axis=0)
        pose_feat = (rots[1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + (pose_feat @ model.posedirs).reshape(V, 3)

        # build global transforms
        G = np.zeros((J, 4, 4))
        for j in range(J):
            A = np.eye(4)
            A[:3, :3] = rots[j]
            p = model.parents[j]
            A[:3, 3] = j_rest[j] - (j_rest[p] if p >= 0 else 0)
            G[j] = A if p < 0 else G[p] @ A
        out_joints[b] = G[:, :3, 3]
        # remove rest-pose joint contribution
        Grel = G.copy()
        for j in range(J):
            Grel[j, :3, 3] -= G[j, :3, :3] @ j_rest[j]
        T = np.einsum("vj,jik->vik", model.lbs_weights, Grel)
        vh = np.concatenate([v_posed, np.ones((V, 1))], axis=1)
        out_verts[b] = np.einsum("vik,vk->vi", T, vh)[:, :3]
    return out_verts, out_joints


def random_rotmats(*shape):
    q = RNG.normal(size=shape + (4,)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(R.quaternion_to_matrix(jnp.asarray(q)))


class TestLBS:
    def test_vs_numpy_reference(self):
        model = synthetic_model()
        B = 3
        betas = RNG.normal(size=(B, NB)).astype(np.float32)
        go = random_rotmats(B)
        bp = random_rotmats(B, J - 1)
        ref_v, ref_j = numpy_lbs_reference(model, betas, go, bp)
        out = lbs(model, jnp.asarray(betas), jnp.asarray(go), jnp.asarray(bp))
        np.testing.assert_allclose(np.asarray(out["vertices"]), ref_v, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["joints"][:, :J]), ref_j, atol=1e-4
        )
        # joint sets present
        assert out["smpl"].shape == (B, 24, 3)
        assert out["a2m"].shape == (B, 18, 3)
        assert out["vibe"].shape == (B, 49, 3)

    def test_differentiable(self):
        model = synthetic_model()
        B = 2
        go = random_rotmats(B)
        bp6 = np.asarray(R.matrix_to_rotation_6d(jnp.asarray(random_rotmats(B, J - 1))))

        def loss(bp6):
            bp = R.rotation_6d_to_matrix(bp6)
            out = lbs(model, jnp.zeros((B, NB)), jnp.asarray(go), bp)
            return jnp.sum(out["smpl"] ** 2)

        g = jax.grad(loss)(jnp.asarray(bp6))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestRot2XYZ:
    def test_rot6d_pipeline(self):
        model = synthetic_model()
        B, T = 2, 5
        rots = random_rotmats(B * T, J)
        r6 = np.asarray(R.matrix_to_rotation_6d(jnp.asarray(rots))).reshape(B, T, J, 6)
        transl = RNG.normal(size=(B, T, 1, 6)).astype(np.float32)
        x = np.concatenate([r6, transl], axis=2)  # 25th row = translation
        out = rot2xyz(model, jnp.asarray(x), Rot2XYZConfig(jointstype="smpl"))
        assert out.shape == (B, T, 24, 3)
        # root centered
        np.testing.assert_allclose(np.asarray(out[:, :, 0]), 0.0, atol=1e-5)

    def test_mask_zeroes(self):
        model = synthetic_model()
        B, T = 2, 4
        x = np.asarray(
            R.matrix_to_rotation_6d(jnp.asarray(random_rotmats(B, T, J + 1)))
        )
        mask = np.array([[True, True, False, False], [True] * 4])
        out = rot2xyz(
            model, jnp.asarray(x), Rot2XYZConfig(jointstype="a2m"), mask=jnp.asarray(mask)
        )
        assert np.abs(np.asarray(out[0, 2:])).sum() == 0
