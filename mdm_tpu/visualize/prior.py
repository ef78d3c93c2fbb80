"""Pose priors for SMPLify fitting (reference joints2smpl/src/prior.py).

The reference fit regularizes body pose with a max-of-mixture Gaussian
prior over the 69-d axis-angle body pose (MaxMixturePrior, reference
visualize/joints2smpl/src/prior.py:101-226, weights from `gmm_08.pkl`) plus
an elbow/knee bending-direction prior (SMPLifyAnglePrior, prior.py:52-90 /
customloss.py:15-21). Both are pure functions here, differentiable and
jit-friendly; the GMM tables are loaded once from the pickled sklearn dump.

The gmm_08.pkl asset ships with SMPLify (prepare/download_smpl_files.sh);
when absent, `fit_smpl` falls back to its L2 stand-in so asset-free smoke
paths keep working.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Optional

import numpy as np

# elbow/knee axis-angle components (body pose WITHOUT global orient, hence
# the -3 of reference customloss.py:19-21): left elbow 52, right elbow 55,
# left knee 9, right knee 12; signs penalize backwards bending.
_ANGLE_IDX = (55 - 3, 58 - 3, 12 - 3, 15 - 3)
_ANGLE_SIGN = (1.0, -1.0, -1.0, -1.0)

_SEARCH_PATHS = (
    "body_models/joints2smpl/gmm_08.pkl",
    "visualize/joints2smpl/smpl_models/gmm_08.pkl",
)


def find_gmm_asset() -> Optional[str]:
    """Locate gmm_08.pkl: $MDM_TPU_GMM_PRIOR, then the standard layouts."""
    env = os.environ.get("MDM_TPU_GMM_PRIOR")
    if env:
        return env if os.path.exists(env) else None
    for p in _SEARCH_PATHS:
        if os.path.exists(p):
            return p
    return None


@dataclass(frozen=True)
class MaxMixturePrior:
    """min-over-components negative log likelihood of the SMPL pose GMM.

    Mirrors the reference's merged_log_likelihood (prior.py:181-197, the
    use_merged=True default used by SMPLify3D): per-component
    0.5 * (x-mu)^T P (x-mu) - log(nll_weight), minimized over components.
    nll_weights fold the (2*pi)^(69/2) normalizer and the det-ratio
    rescaling exactly as prior.py:152-158 does.
    """

    means: np.ndarray        # [M, 69]
    precisions: np.ndarray   # [M, 69, 69]
    log_nll_weights: np.ndarray  # [M]

    @classmethod
    def from_tables(cls, means: np.ndarray, covs: np.ndarray,
                    weights: np.ndarray) -> "MaxMixturePrior":
        # Precisions inverted in float32 like the reference (prior.py:145):
        # the covariances are ill-conditioned enough that an f64 inverse
        # gives a visibly different quadratic form.
        precisions = np.stack(
            [np.linalg.inv(c) for c in covs.astype(np.float32)]
        )
        sqrdets = np.sqrt(np.linalg.det(covs.astype(np.float64)))
        # Deliberate parity quirk: the reference stores nll_weights as f32
        # (prior.py:152-158) where the (2pi)^(69/2) * det-ratio denominator
        # UNDERFLOWS several components to 0 — their log becomes -inf, so
        # those mixture components never win the min. Computing the log in
        # f64 would keep them alive and change which mode each pose snaps to.
        d = means.shape[1]
        const = (2.0 * np.pi) ** (d / 2.0)
        nll_weights = (
            weights.astype(np.float64) / (const * (sqrdets / sqrdets.min()))
        ).astype(np.float32)
        with np.errstate(divide="ignore"):
            log_nll = np.log(nll_weights)
        return cls(
            means=means.astype(np.float32),
            precisions=precisions.astype(np.float32),
            log_nll_weights=log_nll,
        )

    @classmethod
    def load(cls, path: Optional[str] = None) -> "MaxMixturePrior":
        path = path or find_gmm_asset()
        if path is None:
            raise FileNotFoundError(
                "gmm_08.pkl not found (set $MDM_TPU_GMM_PRIOR or place it "
                f"under one of {_SEARCH_PATHS})"
            )
        with open(path, "rb") as f:
            gmm = pickle.load(f, encoding="latin1")
        return cls.from_tables(gmm["means"], gmm["covars"], gmm["weights"])

    def __call__(self, body_pose):
        """body_pose [..., 69] axis-angle -> NLL [...] (min over modes)."""
        import jax.numpy as jnp

        diff = body_pose[..., None, :] - self.means          # [..., M, 69]
        prec_diff = jnp.einsum("mij,...mj->...mi", self.precisions, diff)
        quad = jnp.sum(prec_diff * diff, axis=-1)            # [..., M]
        ll = 0.5 * quad - self.log_nll_weights
        return jnp.min(ll, axis=-1)


def angle_prior(body_pose):
    """Knee/elbow bending-direction penalty (customloss.py:15-21):
    exp(signed component)^2 per joint. body_pose [..., 69] -> [..., 4]."""
    import jax.numpy as jnp

    comps = body_pose[..., jnp.asarray(_ANGLE_IDX)]
    return jnp.exp(comps * jnp.asarray(_ANGLE_SIGN)) ** 2


def gmof(x, sigma: float):
    """Geman-McClure robust error (customloss.py:6-12)."""
    x2 = x * x
    s2 = sigma * sigma
    return (s2 * x2) / (s2 + x2)
