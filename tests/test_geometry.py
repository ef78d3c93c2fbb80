"""Golden-value tests: mdm_tpu.core vs the reference torch implementation.

The reference at /root/reference is imported (read-only) and run on CPU as
the oracle; our JAX implementations must match its numerics.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mdm_tpu.core import hml_codec, quaternions as Q, rotations as R
from mdm_tpu.core.skeleton import t2m_skeleton, T2M_FACE_JOINTS

RNG = np.random.default_rng(0)


def random_quats(*shape):
    q = RNG.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def ref(reference_path):
    import data_loaders.humanml.common.quaternion as ref_quat
    return ref_quat


@pytest.fixture(scope="module")
def ref_rot(reference_path):
    import utils.rotation_conversions as rc
    return rc


class TestQuaternions:
    def test_qmul(self, ref):
        import torch
        q, r = random_quats(7, 3), random_quats(7, 3)
        ours = np.asarray(Q.qmul(jnp.asarray(q), jnp.asarray(r)))
        theirs = ref.qmul(torch.from_numpy(q), torch.from_numpy(r)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_qrot(self, ref):
        import torch
        q = random_quats(5, 4)
        v = RNG.normal(size=(5, 4, 3)).astype(np.float32)
        ours = np.asarray(Q.qrot(jnp.asarray(q), jnp.asarray(v)))
        theirs = ref.qrot(torch.from_numpy(q), torch.from_numpy(v)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_qinv_qbetween(self, ref):
        import torch
        q = random_quats(6)
        np.testing.assert_allclose(
            np.asarray(Q.qinv(jnp.asarray(q))),
            ref.qinv(torch.from_numpy(q)).numpy(),
            atol=1e-6,
        )
        v0 = RNG.normal(size=(6, 3)).astype(np.float32)
        v1 = RNG.normal(size=(6, 3)).astype(np.float32)
        ours = np.asarray(Q.qbetween(jnp.asarray(v0), jnp.asarray(v1)))
        theirs = ref.qbetween(torch.from_numpy(v0), torch.from_numpy(v1)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_qfix(self, ref):
        q = random_quats(10, 4)
        np.testing.assert_allclose(Q.qfix(q), ref.qfix(q), atol=0)

    def test_quat_matrix_cont6d(self, ref):
        import torch
        q = random_quats(8)
        np.testing.assert_allclose(
            np.asarray(Q.quaternion_to_matrix(jnp.asarray(q))),
            ref.quaternion_to_matrix(torch.from_numpy(q)).numpy(),
            atol=1e-5,
        )
        c6 = np.asarray(Q.quaternion_to_cont6d(jnp.asarray(q)))
        np.testing.assert_allclose(
            c6, ref.quaternion_to_cont6d(torch.from_numpy(q)).numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(Q.cont6d_to_matrix(jnp.asarray(c6))),
            ref.cont6d_to_matrix(torch.from_numpy(c6)).numpy(),
            atol=1e-5,
        )

    def test_qeuler_euler2quat(self, ref):
        import torch
        q = random_quats(9)
        for order in ["xyz", "yxz", "zyx"]:
            np.testing.assert_allclose(
                np.asarray(Q.qeuler(jnp.asarray(q), order)),
                ref.qeuler(torch.from_numpy(q), order, deg=False).numpy(),
                atol=1e-4,
            )
        # deg=True path matches the reference's default output units
        np.testing.assert_allclose(
            np.asarray(Q.qeuler(jnp.asarray(q), "xyz", deg=True)),
            ref.qeuler(torch.from_numpy(q), "xyz", deg=True).numpy(),
            atol=1e-3,
        )
        e = (RNG.uniform(-0.9, 0.9, size=(9, 3)) * 90).astype(np.float32)
        # incl. the antipodal-flip orders (reference quaternion.py:209-211)
        for order in ["yxz", "xyz", "yzx", "zxy", "zyx"]:
            np.testing.assert_allclose(
                np.asarray(Q.euler_to_quaternion(jnp.asarray(e), order, deg=True)),
                ref.euler2quat(torch.from_numpy(e), order, deg=True).numpy(),
                atol=1e-5, err_msg=f"order={order}",
            )

    def test_expmap_to_quaternion(self, ref):
        e = (RNG.normal(size=(11, 3)) * 1.5).astype(np.float32)
        e[0] = 0.0  # zero-rotation corner
        np.testing.assert_allclose(
            np.asarray(Q.expmap_to_quaternion(jnp.asarray(e))),
            ref.expmap_to_quaternion(e),
            atol=1e-5,
        )

    def test_qpow_qslerp_lerp(self, ref):
        import torch

        # The reference qpow crashes on torch 2.x (`1 - bool_mask`,
        # quaternion.py:354) for ALL inputs, so — as with PLMS order=1 —
        # the oracle is a numpy re-derivation of the same formula.
        def np_qnorm(q):
            q = q.copy()
            q[..., -1] += 1e-4
            return q / np.linalg.norm(q, axis=-1, keepdims=True)

        def np_qpow(q0, t):
            q0 = np_qnorm(q0)
            theta0 = np.arccos(np.clip(q0[..., 0], -1.0, 1.0))
            theta0 = np.where(np.abs(theta0) <= 1e-9, 1e-9, theta0)
            v0 = q0[..., 1:] / np.sin(theta0)[..., None]
            theta = t.reshape(t.shape + (1,) * theta0.ndim) * theta0
            return np.concatenate(
                [
                    np.cos(theta)[..., None],
                    np.broadcast_to(v0, t.shape + v0.shape) * np.sin(theta)[..., None],
                ],
                axis=-1,
            )

        q0, q1 = random_quats(5), random_quats(5)
        t = np.linspace(0.0, 1.0, 4).astype(np.float32)
        ours = np.asarray(Q.qpow(jnp.asarray(q0), jnp.asarray(t)))
        np.testing.assert_allclose(ours, np_qpow(q0, t), atol=1e-5)

        s = np.asarray(Q.qslerp(jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(t)))
        # endpoints (up to the 1e-4 norm-guard and quaternion sign)
        np.testing.assert_allclose(np.abs((s[0] * q0).sum(-1)), 1.0, atol=1e-3)
        np.testing.assert_allclose(np.abs((s[-1] * q1).sum(-1)), 1.0, atol=1e-3)
        # all interpolants are unit quaternions
        np.testing.assert_allclose(np.linalg.norm(s, axis=-1), 1.0, atol=1e-4)

        p0 = RNG.normal(size=(5, 3)).astype(np.float32)
        p1 = RNG.normal(size=(5, 3)).astype(np.float32)
        ours = np.asarray(Q.lerp(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(t)))
        theirs = ref.lerp(
            torch.from_numpy(p0), torch.from_numpy(p1), torch.from_numpy(t)
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestRotationConversions:
    def test_rotation_6d(self, ref_rot):
        import torch
        q = random_quats(11)
        m_ref = ref_rot.quaternion_to_matrix(torch.from_numpy(q))
        d6_ref = ref_rot.matrix_to_rotation_6d(m_ref).numpy()
        m_ours = R.quaternion_to_matrix(jnp.asarray(q))
        d6_ours = np.asarray(R.matrix_to_rotation_6d(m_ours))
        np.testing.assert_allclose(d6_ours, d6_ref, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(R.rotation_6d_to_matrix(jnp.asarray(d6_ref))),
            ref_rot.rotation_6d_to_matrix(torch.from_numpy(d6_ref)).numpy(),
            atol=1e-5,
        )

    def test_axis_angle(self, ref_rot):
        import torch
        aa = RNG.normal(size=(13, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa))),
            ref_rot.axis_angle_to_matrix(torch.from_numpy(aa)).numpy(),
            atol=1e-5,
        )
        m = ref_rot.axis_angle_to_matrix(torch.from_numpy(aa))
        np.testing.assert_allclose(
            np.asarray(R.matrix_to_axis_angle(jnp.asarray(m.numpy()))),
            ref_rot.matrix_to_axis_angle(m).numpy(),
            atol=1e-4,
        )

    def test_matrix_to_quaternion(self, ref_rot):
        import torch
        q = random_quats(17)
        m = ref_rot.quaternion_to_matrix(torch.from_numpy(q))
        ours = np.asarray(R.matrix_to_quaternion(jnp.asarray(m.numpy())))
        theirs = ref_rot.matrix_to_quaternion(m).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_euler(self, ref_rot):
        import torch
        e = RNG.uniform(-1.2, 1.2, size=(8, 3)).astype(np.float32)
        for conv in ["XYZ", "ZYX"]:
            m_ours = np.asarray(R.euler_angles_to_matrix(jnp.asarray(e), conv))
            m_ref = ref_rot.euler_angles_to_matrix(torch.from_numpy(e), conv).numpy()
            np.testing.assert_allclose(m_ours, m_ref, atol=1e-5)
            back = np.asarray(R.matrix_to_euler_angles(jnp.asarray(m_ref), conv))
            back_ref = ref_rot.matrix_to_euler_angles(torch.from_numpy(m_ref), conv).numpy()
            np.testing.assert_allclose(back, back_ref, atol=1e-4)


class TestRandomRotations:
    def test_random_rotations_are_valid(self):
        import jax

        m = np.asarray(R.random_rotations(jax.random.PRNGKey(3), 16))
        np.testing.assert_allclose(
            m @ m.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)
        q = np.asarray(R.random_quaternions(jax.random.PRNGKey(3), 16))
        assert (q[:, 0] >= 0).all()
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
        assert R.random_rotation(jax.random.PRNGKey(0)).shape == (3, 3)


class TestSkeletonFK:
    def _reference_skeleton(self, reference_path):
        import torch
        from data_loaders.humanml.common.skeleton import Skeleton as RefSkeleton
        from data_loaders.humanml.utils.paramUtil import (
            t2m_kinematic_chain,
            t2m_raw_offsets,
        )
        return RefSkeleton(torch.from_numpy(t2m_raw_offsets), t2m_kinematic_chain, "cpu")

    def test_fk_quat(self, reference_path):
        import torch
        ref_skel = self._reference_skeleton(reference_path)
        skel = t2m_skeleton()
        rest = RNG.normal(size=(22, 3)).astype(np.float32)
        offsets = skel.offsets_from_rest_pose(rest)
        ref_skel.set_offset(torch.from_numpy(offsets))

        quats = random_quats(4, 22)
        root = RNG.normal(size=(4, 3)).astype(np.float32)
        ours = np.asarray(
            skel.forward_kinematics(
                jnp.asarray(quats), jnp.asarray(root), jnp.asarray(offsets)
            )
        )
        theirs = ref_skel.forward_kinematics(
            torch.from_numpy(quats), torch.from_numpy(root)
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_fk_cont6d(self, reference_path):
        import torch
        ref_skel = self._reference_skeleton(reference_path)
        skel = t2m_skeleton()
        rest = RNG.normal(size=(22, 3)).astype(np.float32)
        offsets = skel.offsets_from_rest_pose(rest)
        ref_skel.set_offset(torch.from_numpy(offsets))

        quats = random_quats(3, 22)
        c6 = np.asarray(Q.quaternion_to_cont6d(jnp.asarray(quats)))
        root = RNG.normal(size=(3, 3)).astype(np.float32)
        ours = np.asarray(
            skel.forward_kinematics_cont6d(
                jnp.asarray(c6), jnp.asarray(root), jnp.asarray(offsets)
            )
        )
        theirs = ref_skel.forward_kinematics_cont6d(
            torch.from_numpy(c6), torch.from_numpy(root)
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_ik_matches_reference(self, reference_path):
        ref_skel = self._reference_skeleton(reference_path)
        skel = t2m_skeleton()
        rest = np.abs(RNG.normal(size=(22, 3))).astype(np.float64) + 0.1
        offsets = skel.offsets_from_rest_pose(rest)
        quats = random_quats(6, 22)
        root = RNG.normal(size=(6, 3)).astype(np.float32)
        joints = np.asarray(
            skel.forward_kinematics(jnp.asarray(quats), jnp.asarray(root), jnp.asarray(offsets))
        ).astype(np.float64)
        ours = skel.inverse_kinematics(joints, T2M_FACE_JOINTS)
        theirs = ref_skel.inverse_kinematics_np(joints, T2M_FACE_JOINTS)
        np.testing.assert_allclose(ours, theirs, atol=1e-3)


class TestHmlCodec:
    def test_recover_from_ric(self, reference_path):
        import torch
        from data_loaders.humanml.scripts.motion_process import (
            recover_from_ric as ref_recover,
        )
        data = RNG.normal(size=(2, 30, 263)).astype(np.float32) * 0.1
        ours = np.asarray(hml_codec.recover_from_ric(jnp.asarray(data), 22))
        theirs = ref_recover(torch.from_numpy(data), 22).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_recover_from_ric_kit(self, reference_path):
        """KIT family: 21 joints / 251-dim feature vector."""
        import torch
        from data_loaders.humanml.scripts.motion_process import (
            recover_from_ric as ref_recover,
        )
        data = RNG.normal(size=(2, 30, 251)).astype(np.float32) * 0.1
        ours = np.asarray(hml_codec.recover_from_ric(jnp.asarray(data), 21))
        theirs = ref_recover(torch.from_numpy(data), 21).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_recover_rot(self, reference_path):
        import torch
        from data_loaders.humanml.scripts.motion_process import recover_rot as ref_rr
        data = RNG.normal(size=(20, 263)).astype(np.float32) * 0.1
        ours = np.asarray(hml_codec.recover_rot(jnp.asarray(data)))
        theirs = ref_rr(torch.from_numpy(data)).numpy().reshape(20, 23, 6)
        np.testing.assert_allclose(ours.reshape(20, 23, 6), theirs, atol=1e-4)

    def test_extract_features_parity_and_roundtrip(self, reference_path):
        """Our encode matches the reference encode bit-for-bit, and our
        decode's round-trip error equals the reference's own (the codec is
        inherently lossy on synthetic motion; parity is the contract)."""
        import torch
        import data_loaders.humanml.scripts.motion_process as mp
        import data_loaders.humanml.utils.paramUtil as pu

        if not hasattr(np, "float"):  # reference uses the removed np.float alias
            np.float = float

        skel = t2m_skeleton()
        offsets = skel.offsets_from_rest_pose(
            np.abs(RNG.normal(size=(22, 3))).astype(np.float64) + 0.2
        )
        T = 40
        base = np.zeros((T, 22, 4), np.float32)
        base[..., 0] = 1.0
        quats = base + np.cumsum(
            RNG.normal(scale=0.01, size=(T, 22, 4)), axis=0
        ).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        root = np.cumsum(RNG.normal(scale=0.02, size=(T, 3)), axis=0).astype(np.float32)
        root[:, 1] += 1.0
        joints = np.asarray(
            skel.forward_kinematics(jnp.asarray(quats), jnp.asarray(root), jnp.asarray(offsets))
        ).astype(np.float64)

        ref_feats = mp.extract_features(
            joints.copy(), 0.002, torch.from_numpy(pu.t2m_raw_offsets),
            pu.t2m_kinematic_chain, T2M_FACE_JOINTS, [8, 11], [7, 10],
        )
        my_feats = hml_codec.extract_features(
            joints.copy(), 0.002, skel, T2M_FACE_JOINTS, [8, 11], [7, 10]
        )
        np.testing.assert_allclose(my_feats, ref_feats, atol=1e-5)

        rec_ref = mp.recover_from_ric(torch.from_numpy(ref_feats).float(), 22).numpy()
        rec_my = np.asarray(hml_codec.recover_from_ric(jnp.asarray(my_feats), 22))
        err_ref = np.abs(rec_ref - joints[:-1]).max()
        err_my = np.abs(rec_my - joints[:-1]).max()
        assert abs(err_my - err_ref) < 1e-4

    def test_recover_heading(self, reference_path):
        import torch
        from data_loaders.humanml.scripts.motion_process import (
            recover_root_rot_heading_ang as ref_heading,
        )
        joints = RNG.normal(size=(5, 22, 3)).astype(np.float32)
        ours = np.asarray(hml_codec.recover_root_rot_heading_ang(jnp.asarray(joints)))
        # Reference expects a [B, J, 3, T] layout; add a singleton time axis.
        theirs = ref_heading(torch.from_numpy(joints[..., None])).numpy()[..., 0]
        np.testing.assert_allclose(ours, theirs, atol=1e-4)
