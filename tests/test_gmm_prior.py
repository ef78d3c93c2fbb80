"""GMM pose-prior parity vs the reference SMPLify stack.

Oracle tests load the reference's own prior.py / customloss.py (torch CPU,
/root/reference/visualize/joints2smpl/src) and the published gmm_08.pkl
tables; the fit-quality test runs the reference's full SMPLify3D staged
LBFGS fit (smplify.py:44-279) against our batched Adam/rot6d fit on the
same synthetic model and target motion, asserting ours reaches at least
the reference's mean per-joint error.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

REF_SRC = "/root/reference/visualize/joints2smpl/src"
GMM_PKL = os.path.join(REF_SRC, "..", "smpl_models", "gmm_08.pkl")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GMM_PKL), reason="reference gmm_08.pkl not available"
)

RNG = np.random.default_rng(7)


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub_ref_packages():
    """Fake `visualize.joints2smpl.src` package tree so the reference's
    intra-repo imports resolve without installing the reference."""
    if "visualize.joints2smpl.src.config" in sys.modules:
        return sys.modules["visualize.joints2smpl.src.config"]
    sys.modules.setdefault("smplx", types.ModuleType("smplx"))
    visualize_pkg = types.ModuleType("visualize")
    j2s_pkg = types.ModuleType("visualize.joints2smpl")
    src_pkg = types.ModuleType("visualize.joints2smpl.src")
    ref_config = _load_ref_module("ref_j2s_config", os.path.join(REF_SRC, "config.py"))
    ref_config.GMM_MODEL_DIR = os.path.dirname(GMM_PKL)
    src_pkg.config = ref_config
    j2s_pkg.src = src_pkg
    visualize_pkg.joints2smpl = j2s_pkg
    sys.modules["visualize"] = visualize_pkg
    sys.modules["visualize.joints2smpl"] = j2s_pkg
    sys.modules["visualize.joints2smpl.src"] = src_pkg
    sys.modules["visualize.joints2smpl.src.config"] = ref_config
    return ref_config


@pytest.fixture(scope="module")
def ref_prior_mod():
    return _load_ref_module("ref_prior", os.path.join(REF_SRC, "prior.py"))


def test_max_mixture_prior_matches_reference(ref_prior_mod):
    import torch

    from mdm_tpu.visualize.prior import MaxMixturePrior

    ref = ref_prior_mod.MaxMixturePrior(
        prior_folder=os.path.dirname(GMM_PKL), num_gaussians=8,
        dtype=torch.float32,
    )
    ours = MaxMixturePrior.load(GMM_PKL)

    pose = (RNG.normal(size=(16, 69)) * 0.5).astype(np.float32)
    betas = np.zeros((16, 10), np.float32)
    want = ref(torch.from_numpy(pose), torch.from_numpy(betas)).numpy()
    got = np.asarray(ours(jnp.asarray(pose)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_angle_and_gmof_match_reference():
    import torch

    _stub_ref_packages()
    custom = _load_ref_module("ref_customloss", os.path.join(REF_SRC, "customloss.py"))
    from mdm_tpu.visualize.prior import angle_prior, gmof

    pose = (RNG.normal(size=(8, 69)) * 0.6).astype(np.float32)
    want = custom.angle_prior(torch.from_numpy(pose)).numpy()
    got = np.asarray(angle_prior(jnp.asarray(pose)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    x = (RNG.normal(size=(5, 22, 3)) * 0.3).astype(np.float32)
    want = custom.gmof(torch.from_numpy(x), 100.0).numpy()
    got = np.asarray(gmof(jnp.asarray(x), 100.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# Fit quality: reference SMPLify3D (staged LBFGS, GMM prior) vs our fit_smpl
# ---------------------------------------------------------------------------


def _torch_lbs(model, pose_aa, betas, transl=None):
    """Torch twin of mdm_tpu.smpl.lbs for the synthetic model (axis-angle
    input, as the reference SMPLify optimizes): used ONLY to let the
    reference fitter run without the smplx package."""
    import torch

    B = pose_aa.shape[0]
    J = model.parents.shape[0]
    rot = _torch_rodrigues(pose_aa.reshape(B * J, 3)).reshape(B, J, 3, 3)

    v_template = torch.from_numpy(model.v_template)
    shapedirs = torch.from_numpy(model.shapedirs)
    posedirs = torch.from_numpy(model.posedirs)
    j_regressor = torch.from_numpy(model.j_regressor)
    lbs_w = torch.from_numpy(model.lbs_weights)

    v_shaped = v_template[None] + torch.einsum("bl,vkl->bvk", betas, shapedirs)
    joints_rest = torch.einsum("jv,bvk->bjk", j_regressor, v_shaped)

    ident = torch.eye(3)
    pose_feature = (rot[:, 1:] - ident).reshape(B, -1)
    v_posed = v_shaped + torch.matmul(pose_feature, posedirs).reshape(B, -1, 3)

    rel_joints = joints_rest.clone()
    rel_joints[:, 1:] -= joints_rest[:, model.parents[1:]]
    tfs = torch.zeros(B, J, 4, 4)
    tfs[:, :, :3, :3] = rot
    tfs[:, :, :3, 3] = rel_joints
    tfs[:, :, 3, 3] = 1.0
    chain = [tfs[:, 0]]
    for j in range(1, J):
        chain.append(chain[int(model.parents[j])] @ tfs[:, j])
    transforms = torch.stack(chain, dim=1)
    posed_joints = transforms[:, :, :3, 3]

    joints_h = torch.cat([joints_rest, torch.zeros(B, J, 1)], dim=-1)
    corr = torch.einsum("bjik,bjk->bji", transforms, joints_h)
    rel = transforms.clone()
    rel[:, :, :3, 3] -= corr[:, :, :3]

    T = torch.einsum("vj,bjik->bvik", lbs_w, rel)
    v_h = torch.cat([v_posed, torch.ones(B, v_posed.shape[1], 1)], dim=-1)
    vertices = torch.einsum("bvik,bvk->bvi", T, v_h)[..., :3]
    if transl is not None:
        vertices = vertices + transl[:, None]
        posed_joints = posed_joints + transl[:, None]
    return vertices, posed_joints


def _torch_rodrigues(aa):
    import torch

    angle = torch.norm(aa + 1e-8, dim=-1, keepdim=True)
    axis = aa / angle
    c, s = torch.cos(angle)[..., None], torch.sin(angle)[..., None]
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = torch.zeros_like(x)
    K = torch.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], dim=-1
    ).reshape(-1, 3, 3)
    ident = torch.eye(3)[None]
    return ident + s * K + (1 - c) * (K @ K)


def _synthetic_model():
    from mdm_tpu.smpl import SMPLModel

    V, J, NB = 60, 24, 10
    parents = np.array(
        [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
         18, 19, 20, 21]
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


class _StubSMPL:
    """Duck-typed smplx layer over the synthetic model for SMPLify3D."""

    def __init__(self, model):
        import torch

        self.model = model
        self.faces_tensor = torch.zeros((4, 3), dtype=torch.long)

    def __call__(self, global_orient=None, body_pose=None, betas=None,
                 return_full_pose=False):
        import torch

        pose = torch.cat([global_orient, body_pose], dim=-1).reshape(-1, 24, 3)
        vertices, joints = _torch_lbs(self.model, pose, betas)
        out = types.SimpleNamespace(vertices=vertices, joints=joints)
        return out


@pytest.mark.slow
def test_fit_quality_at_least_reference(monkeypatch):
    """Our Adam/rot6d fit with the ported GMM prior must reach at least the
    reference staged-LBFGS fit's mean per-joint error on the same target."""
    import torch

    # --- target motion: a true pose of the synthetic model (fit exists)
    from mdm_tpu.core import rotations as R
    from mdm_tpu.smpl import lbs as jax_lbs
    from mdm_tpu.visualize.joints2smpl import FitConfig, fit_smpl

    model = _synthetic_model()
    T = 3
    rng = np.random.default_rng(123)  # own stream: order-independent target
    q = rng.normal(size=(T, 24, 4)).astype(np.float32) * 0.08
    q[..., 0] += 1.0
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rots = np.asarray(R.quaternion_to_matrix(jnp.asarray(q)))
    out = jax_lbs(model, jnp.zeros((T, 10)), jnp.asarray(rots[:, 0]),
                  jnp.asarray(rots[:, 1:]))
    target = np.asarray(out["joints"][:, :22])

    # --- reference SMPLify3D with stubbed smplx + absolute GMM dir
    _stub_ref_packages()
    monkeypatch.syspath_prepend(REF_SRC)
    ref_smplify = _load_ref_module("ref_smplify", os.path.join(REF_SRC, "smplify.py"))

    fitter = ref_smplify.SMPLify3D(
        smplxmodel=_StubSMPL(model),
        step_size=1e-2,
        batch_size=T,
        num_iters=30,
        use_lbfgs=True,
        joints_category="AMASS",
        device=torch.device("cpu"),
    )
    init_pose = torch.zeros(T, 72)
    init_betas = torch.zeros(T, 10)
    init_cam = torch.zeros(T, 1, 3)
    j3d = torch.from_numpy(target)
    verts, ref_joints, pose, betas, cam_t, _loss = fitter(
        init_pose, init_betas, init_cam, j3d, conf_3d=1.0, seq_ind=0
    )
    ref_pred = (ref_joints[:, :22] + cam_t).detach().numpy()
    ref_err = np.linalg.norm(ref_pred - target, axis=-1).mean()

    # --- our fit with the same GMM prior; per_frame_betas + no smoothness
    # matches the reference's parameterization exactly (independent frames)
    monkeypatch.setenv("MDM_TPU_GMM_PRIOR", os.path.abspath(GMM_PKL))
    fit = fit_smpl(model, target, FitConfig(iterations=1500, lr=0.03,
                                            use_gmm_prior=True,
                                            smooth_weight=0.0,
                                            per_frame_betas=True))
    our_err = np.linalg.norm(fit["joints"][:, :22] - target, axis=-1).mean()

    print(f"mean per-joint error: ours={our_err:.5f} reference={ref_err:.5f}")
    assert np.isfinite(our_err)
    assert our_err <= ref_err + 1e-4, (
        f"our fit ({our_err:.5f}) worse than reference SMPLify ({ref_err:.5f})"
    )
