"""Additional reference-parity coverage: warm-start sampling, feature masks,
rotation-based decode."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.core import hml_codec
from mdm_tpu.core.hml_masks import (
    HML_LOWER_BODY_MASK,
    HML_ROOT_MASK,
    HML_UPPER_BODY_MASK,
)
from mdm_tpu.core.skeleton import t2m_skeleton
from mdm_tpu.diffusion import (
    SamplerConfig,
    Schedule,
    ddim_sample_loop,
    named_beta_schedule,
)

RNG = np.random.default_rng(91)


def test_hml_masks_match_reference(reference_path):
    import data_loaders.humanml_utils as hu

    np.testing.assert_array_equal(HML_ROOT_MASK, hu.HML_ROOT_MASK)
    np.testing.assert_array_equal(HML_LOWER_BODY_MASK, hu.HML_LOWER_BODY_MASK)
    np.testing.assert_array_equal(HML_UPPER_BODY_MASK, hu.HML_UPPER_BODY_MASK)


def test_ddim_warm_start_matches_reference(reference_path):
    """skip_timesteps + init_image (the edit/inpaint warm start) must match
    the reference DDIM loop exactly."""
    import torch
    import diffusion.gaussian_diffusion as gd

    betas = named_beta_schedule("cosine", 16)
    sched = Schedule.from_betas(betas)
    ref = gd.GaussianDiffusion(
        betas=betas, model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL, loss_type=gd.LossType.MSE,
    )
    shape = (2, 8, 6)
    w = RNG.normal(scale=0.05, size=shape[1:]).astype(np.float32)

    class M:
        def __call__(self, x, t, **kw):
            return torch.tanh(x * 0.9 + torch.from_numpy(w))

        @staticmethod
        def jax_fn(x, t):
            return jnp.tanh(x * 0.9 + jnp.asarray(w))

    noise = RNG.normal(size=shape).astype(np.float32)
    init = RNG.normal(size=shape).astype(np.float32)
    skip = 5

    theirs = ref.ddim_sample_loop(
        M(), shape, noise=torch.from_numpy(noise.copy()), clip_denoised=False,
        model_kwargs={"y": {}}, eta=0.0, device="cpu",
        skip_timesteps=skip, init_image=torch.from_numpy(init.copy()),
    ).numpy()
    ours = ddim_sample_loop(
        M.jax_fn, sched, jnp.asarray(noise), jax.random.PRNGKey(0),
        SamplerConfig(clip_denoised=False, skip_timesteps=skip),
        init_image=jnp.asarray(init),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_recover_from_rot_matches_reference(reference_path):
    import torch
    from data_loaders.humanml.common.skeleton import Skeleton as RefSkeleton
    from data_loaders.humanml.scripts.motion_process import (
        recover_from_rot as ref_rfr,
    )
    from data_loaders.humanml.utils.paramUtil import (
        t2m_kinematic_chain,
        t2m_raw_offsets,
    )

    skel = t2m_skeleton()
    rest = np.abs(RNG.normal(size=(22, 3))).astype(np.float32) + 0.2
    offsets = skel.offsets_from_rest_pose(rest)
    ref_skel = RefSkeleton(torch.from_numpy(t2m_raw_offsets), t2m_kinematic_chain, "cpu")
    ref_skel.set_offset(torch.from_numpy(offsets))

    data = (RNG.normal(size=(12, 263)) * 0.1).astype(np.float32)
    theirs = ref_rfr(torch.from_numpy(data), 22, ref_skel).numpy()
    ours = np.asarray(
        hml_codec.recover_from_rot(jnp.asarray(data), 22, skel, jnp.asarray(offsets))
    )
    np.testing.assert_allclose(ours.reshape(theirs.shape), theirs, atol=2e-4)
