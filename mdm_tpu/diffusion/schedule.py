"""Diffusion noise schedules and timestep respacing.

All per-timestep coefficient tables are computed once in float64 numpy at
setup (matching the reference's precision discipline,
/root/reference/diffusion/gaussian_diffusion.py:165-202) and stored as a
single frozen pytree of float32 device arrays. Inside a jitted sampler the
per-step coefficients are fetched with static or dynamic gathers from these
tables — there is no object dispatch at trace time.

Respacing (the reference's SpacedDiffusion, respace.py) is a *constructor*
here: `Schedule.respaced(...)` recomputes betas over the retained subset and
keeps the original-timestep map, so a 50-step schedule behaves like the
1000-step one. The model always sees original timesteps via `timestep_map`.
"""
from __future__ import annotations

import enum
import math
from typing import Iterable, Sequence, Set, Union

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "MeanType",
    "VarType",
    "named_beta_schedule",
    "space_timesteps",
    "Schedule",
]


class MeanType(enum.Enum):
    """What the denoiser predicts."""

    PREVIOUS_X = "previous_x"
    START_X = "start_x"  # MDM's choice (utils/model_util.py:77 in reference)
    EPSILON = "epsilon"


class VarType(enum.Enum):
    """Reverse-process variance handling."""

    FIXED_SMALL = "fixed_small"  # MDM's choice (posterior variance)
    FIXED_LARGE = "fixed_large"
    LEARNED = "learned"
    LEARNED_RANGE = "learned_range"


def _cosine_alpha_bar(t: float) -> float:
    return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2


def named_beta_schedule(
    name: str, num_timesteps: int, scale_betas: float = 1.0
) -> np.ndarray:
    """Linear (Ho et al.) or cosine (Nichol & Dhariwal) beta schedule, f64."""
    if name == "linear":
        scale = scale_betas * 1000 / num_timesteps
        return np.linspace(scale * 1e-4, scale * 0.02, num_timesteps, dtype=np.float64)
    if name == "cosine":
        ts = np.arange(num_timesteps, dtype=np.float64)
        a1 = np.array([_cosine_alpha_bar(t / num_timesteps) for t in ts])
        a2 = np.array([_cosine_alpha_bar((t + 1) / num_timesteps) for t in ts])
        return np.minimum(1.0 - a2 / a1, 0.999)
    raise ValueError(f"unknown beta schedule {name!r}")


def space_timesteps(
    num_timesteps: int, section_counts: Union[str, Sequence[int]]
) -> Set[int]:
    """Subset of original timesteps for a respaced process.

    Same contract as the reference (respace.py:9-62): a list of per-section
    counts, a comma string, or "ddimN" for DDIM striding.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(
                f"cannot create exactly {desired} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1.0 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += stride
        start_idx += size
    return set(all_steps)


@struct.dataclass
class Schedule:
    """Frozen pytree of per-timestep diffusion coefficients (float32).

    Every field is a `[T]` table; samplers index them with the (possibly
    respaced) step index. `timestep_map` maps respaced index -> original
    timestep for the model call (identity when not respaced).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    fixed_large_variance: jnp.ndarray
    log_fixed_large_variance: jnp.ndarray
    log_betas: jnp.ndarray
    timestep_map: jnp.ndarray
    # static metadata (not traced)
    num_timesteps: int = struct.field(pytree_node=False)
    original_num_timesteps: int = struct.field(pytree_node=False)

    @classmethod
    def from_betas(
        cls,
        betas: np.ndarray,
        timestep_map: Iterable[int] | None = None,
        original_num_timesteps: int | None = None,
        dtype=jnp.float32,
    ) -> "Schedule":
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        T = len(betas)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)

        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        if T > 1:
            post_logvar_clipped = np.log(np.append(post_var[1], post_var[1:]))
            fixed_large = np.append(post_var[1], betas[1:])
        else:
            # Degenerate single-step schedule: variance at t=0 is never used
            # (no noise added at the final step); keep tables finite.
            post_logvar_clipped = np.log(np.maximum(post_var, 1e-20))
            fixed_large = betas.copy()

        if timestep_map is None:
            timestep_map = np.arange(T)
        tmap = np.asarray(list(timestep_map), dtype=np.int32)

        as_dev = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            betas=as_dev(betas),
            alphas_cumprod=as_dev(acp),
            alphas_cumprod_prev=as_dev(acp_prev),
            alphas_cumprod_next=as_dev(acp_next),
            sqrt_alphas_cumprod=as_dev(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - acp)),
            log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - acp)),
            sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=as_dev(post_var),
            posterior_log_variance_clipped=as_dev(post_logvar_clipped),
            posterior_mean_coef1=as_dev(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=as_dev((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
            fixed_large_variance=as_dev(fixed_large),
            log_fixed_large_variance=as_dev(np.log(fixed_large)),
            log_betas=as_dev(np.log(betas)),
            timestep_map=jnp.asarray(tmap),
            num_timesteps=T,
            original_num_timesteps=int(original_num_timesteps or T),
        )

    @classmethod
    def create(
        cls,
        noise_schedule: str = "cosine",
        diffusion_steps: int = 1000,
        timestep_respacing: Union[str, Sequence[int], None] = None,
        scale_betas: float = 1.0,
    ) -> "Schedule":
        """Build a (possibly respaced) schedule the way the reference's
        model factory does (utils/model_util.py:75-116)."""
        betas = named_beta_schedule(noise_schedule, diffusion_steps, scale_betas)
        if not timestep_respacing:
            return cls.from_betas(betas)
        use_timesteps = space_timesteps(diffusion_steps, timestep_respacing)
        return cls.respaced(betas, use_timesteps)

    @classmethod
    def respaced(cls, base_betas: np.ndarray, use_timesteps: Iterable[int]) -> "Schedule":
        """Recompute betas over a retained-subset so T'-step sampling matches
        the T-step process (reference respace.py:65-115)."""
        base_betas = np.asarray(base_betas, dtype=np.float64)
        acp = np.cumprod(1.0 - base_betas)
        last_alpha_cumprod = 1.0
        new_betas, tmap = [], []
        use = set(use_timesteps)
        for i in range(len(base_betas)):
            if i in use:
                new_betas.append(1.0 - acp[i] / last_alpha_cumprod)
                last_alpha_cumprod = acp[i]
                tmap.append(i)
        return cls.from_betas(
            np.asarray(new_betas), timestep_map=tmap,
            original_num_timesteps=len(base_betas),
        )

    def model_timesteps(self, t: jnp.ndarray) -> jnp.ndarray:
        """Respaced step index -> original timestep fed to the model."""
        return self.timestep_map[t]
