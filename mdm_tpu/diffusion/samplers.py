"""Scan-based diffusion samplers: ancestral, DDIM, PLMS.

Each loop is a single `jax.lax.scan` over timesteps — one XLA program, no
host round-trips — unlike the reference's Python step loops
(/root/reference/diffusion/gaussian_diffusion.py:591-727, 876-990,
1076-1187). PRNG is threaded via key splitting inside the scan carry.

The `model_fn` passed in closes over parameters and conditioning (CFG
double-batching, text embeds, prefixes); it receives `(x, t_model)` where
`t_model` is already mapped to original-process timesteps for respaced
schedules.

Supported reference features: skip_timesteps + init_image warm start,
const_noise, inpainting (mask applied to the x0 prediction every step),
cond_fn guidance, dump of intermediate steps, eta for DDIM, PLMS order 1-4
with the Pseudo-Improved-Euler first step.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from . import gaussian as G
from .schedule import MeanType, Schedule, VarType

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
CondFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclass(frozen=True)
class SamplerConfig:
    """Static sampler options (hashable; part of the jit cache key)."""

    mean_type: MeanType = MeanType.START_X
    var_type: VarType = VarType.FIXED_SMALL
    clip_denoised: bool = False
    const_noise: bool = False
    eta: float = 0.0  # DDIM stochasticity
    order: int = 2  # PLMS order
    skip_timesteps: int = 0
    guidance_mode: str = "mean"  # how cond_fn conditions: "mean" | "score"


def _init_state(
    sched: Schedule,
    noise: jnp.ndarray,
    init_image: Optional[jnp.ndarray],
    skip_timesteps: int,
):
    """Starting x and the (static, reversed) step index list."""
    num_steps = sched.num_timesteps - skip_timesteps
    indices = jnp.arange(num_steps - 1, -1, -1)
    x = noise
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros_like(noise)
    if init_image is not None:
        t0 = jnp.full((noise.shape[0],), num_steps - 1, dtype=jnp.int32)
        x = G.q_sample(sched, init_image, t0, noise)
    return x, indices


def _step_noise(key, x, const_noise: bool):
    if const_noise:
        n = jax.random.normal(key, (1,) + x.shape[1:], dtype=x.dtype)
        return jnp.broadcast_to(n, x.shape)
    return jax.random.normal(key, x.shape, dtype=x.dtype)


def _p_mean_variance_step(
    sched, model_fn, cond_fn, cfg: SamplerConfig, x, t,
    inpainting_mask, inpainted_motion, model_state=None, force_score=False,
):
    """Returns PMeanVariance (stateless) or (PMeanVariance, new_model_state).

    `force_score`: the ddim/plms/dpmpp callers pass True — the reference's
    ddim_sample/plms_sample ALWAYS apply condition_score when a cond_fn is
    given (gaussian_diffusion.py:753-756, 1024-1031); guidance_mode only
    selects mean-vs-score conditioning for the ancestral sampler.
    """
    if model_state is not None:
        model_out, model_state = model_fn(x, sched.model_timesteps(t), model_state)
    else:
        model_out = model_fn(x, sched.model_timesteps(t))
    out = G.p_mean_variance(
        sched, model_out, x, t,
        mean_type=cfg.mean_type, var_type=cfg.var_type,
        clip_denoised=cfg.clip_denoised,
        inpainting_mask=inpainting_mask, inpainted_motion=inpainted_motion,
    )
    if cond_fn is not None and (force_score or cfg.guidance_mode == "score"):
        out = G.condition_score(sched, cond_fn(x, sched.model_timesteps(t)), out, x, t)
    if model_state is not None:
        return out, model_state
    return out


def p_sample_loop(
    model_fn: ModelFn,
    sched: Schedule,
    noise: jnp.ndarray,
    key: jax.Array,
    config: SamplerConfig = SamplerConfig(),
    *,
    init_image: Optional[jnp.ndarray] = None,
    cond_fn: Optional[CondFn] = None,
    inpainting_mask: Optional[jnp.ndarray] = None,
    inpainted_motion: Optional[jnp.ndarray] = None,
    dump_steps: Optional[Sequence[int]] = None,
    model_state=None,
    step_noise: Optional[jnp.ndarray] = None,
):
    """Ancestral sampling. Returns final x, or stacked dumps if requested.

    `dump_steps` indexes into the step sequence (0 = first/most-noised).
    `model_state`: optional carry for stateful model_fns (e.g. cached-CFG);
    signature becomes model_fn(x, t, state) -> (out, state).
    `step_noise`: optional [num_steps, *x.shape] per-step transition noise
    replacing the PRNG draws — the determinism hook that lets end-to-end
    tests feed the reference loop and this scan identical noise (the
    reference's equivalent seams are fixseed + const_noise,
    gaussian_diffusion.py:526-528).
    """
    B = noise.shape[0]
    x, indices = _init_state(sched, noise, init_image, config.skip_timesteps)

    def step(carry, xs):
        i, ns = xs
        x, key, mstate = carry
        key, nk = jax.random.split(key)
        t = jnp.full((B,), i, dtype=jnp.int32)
        res = _p_mean_variance_step(
            sched, model_fn, cond_fn, config, x, t, inpainting_mask,
            inpainted_motion, mstate,
        )
        out, mstate = res if mstate is not None else (res, mstate)
        mean = out.mean
        if cond_fn is not None and config.guidance_mode == "mean":
            mean = G.condition_mean(cond_fn(x, sched.model_timesteps(t)), out)
        noise_step = ns if ns is not None else _step_noise(nk, x, config.const_noise)
        nonzero = (i != 0).astype(x.dtype)
        x_next = mean + nonzero * jnp.exp(0.5 * out.log_variance) * noise_step
        return (x_next, key, mstate), (x_next if dump_steps is not None else None)

    (x_final, _, _), dumps = jax.lax.scan(
        step, (x, key, model_state), (indices, step_noise)
    )
    if dump_steps is not None:
        return jnp.stack([dumps[i] for i in dump_steps])
    return x_final


def ddim_sample_loop(
    model_fn: ModelFn,
    sched: Schedule,
    noise: jnp.ndarray,
    key: jax.Array,
    config: SamplerConfig = SamplerConfig(),
    *,
    init_image: Optional[jnp.ndarray] = None,
    cond_fn: Optional[CondFn] = None,
    inpainting_mask: Optional[jnp.ndarray] = None,
    inpainted_motion: Optional[jnp.ndarray] = None,
    model_state=None,
):
    """DDIM sampling (eta=0 deterministic)."""
    B = noise.shape[0]
    nd = noise.ndim
    x, indices = _init_state(sched, noise, init_image, config.skip_timesteps)

    def step(carry, i):
        x, key, mstate = carry
        key, nk = jax.random.split(key)
        t = jnp.full((B,), i, dtype=jnp.int32)
        res = _p_mean_variance_step(
            sched, model_fn, cond_fn, config, x, t, inpainting_mask,
            inpainted_motion, mstate, force_score=True,
        )
        out, mstate = res if mstate is not None else (res, mstate)
        eps = G.predict_eps_from_xstart(sched, x, t, out.pred_xstart)
        alpha_bar = G.extract(sched.alphas_cumprod, t, nd)
        alpha_bar_prev = G.extract(sched.alphas_cumprod_prev, t, nd)
        sigma = (
            config.eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        mean_pred = (
            out.pred_xstart * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero = (i != 0).astype(x.dtype)
        x_next = mean_pred + nonzero * sigma * jax.random.normal(nk, x.shape, x.dtype)
        return (x_next, key, mstate), None

    (x_final, _, _), _ = jax.lax.scan(step, (x, key, model_state), indices)
    return x_final


def ddim_reverse_sample_loop(
    model_fn: ModelFn,
    sched: Schedule,
    x0: jnp.ndarray,
    config: SamplerConfig = SamplerConfig(),
):
    """Deterministic DDIM encoding x_0 -> x_T (reverse ODE)."""
    B, nd = x0.shape[0], x0.ndim
    indices = jnp.arange(sched.num_timesteps)

    def step(x, i):
        t = jnp.full((B,), i, dtype=jnp.int32)
        out = _p_mean_variance_step(sched, model_fn, None, config, x, t, None, None)
        eps = (
            G.extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x - out.pred_xstart
        ) / G.extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)
        alpha_bar_next = G.extract(sched.alphas_cumprod_next, t, nd)
        x_next = (
            out.pred_xstart * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1 - alpha_bar_next) * eps
        )
        return x_next, None

    x_final, _ = jax.lax.scan(step, x0, indices)
    return x_final


def plms_sample_loop(
    model_fn: ModelFn,
    sched: Schedule,
    noise: jnp.ndarray,
    key: jax.Array,
    config: SamplerConfig = SamplerConfig(),
    *,
    init_image: Optional[jnp.ndarray] = None,
    cond_fn: Optional[CondFn] = None,
    inpainting_mask: Optional[jnp.ndarray] = None,
    inpainted_motion: Optional[jnp.ndarray] = None,
):
    """Pseudo Linear Multistep (Adams-Bashforth) sampling, order 1-4.

    First step uses the Pseudo-Improved-Euler double evaluation when
    order > 1 (reference gaussian_diffusion.py:1042-1049); subsequent steps
    run inside one scan with a fixed-size ring of past epsilons.
    """
    order = config.order
    if not 1 <= order <= 4:
        raise ValueError("PLMS order must be in [1, 4]")
    B, nd = noise.shape[0], noise.ndim
    x, indices = _init_state(sched, noise, init_image, config.skip_timesteps)

    def model_eps(x, t):
        out = _p_mean_variance_step(
            sched, model_fn, cond_fn, config, x, t, inpainting_mask,
            inpainted_motion, force_score=True,
        )
        eps = G.predict_eps_from_xstart(sched, x, t, out.pred_xstart)
        return eps, out

    def mean_from_eps(eps_prime, x, t):
        pred_prime = G.predict_xstart_from_eps(sched, x, t, eps_prime)
        alpha_bar_prev = G.extract(sched.alphas_cumprod_prev, t, nd)
        return pred_prime * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev) * eps_prime

    # --- first step (outside the scan: different program when order > 1) ---
    i0 = indices[0]
    t0 = jnp.full((B,), i0, dtype=jnp.int32)
    eps0, out0 = model_eps(x, t0)
    if order > 1:
        alpha_bar_prev = G.extract(sched.alphas_cumprod_prev, t0, nd)
        euler_pred = out0.pred_xstart * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev) * eps0
        eps2, _ = model_eps(euler_pred, t0 - 1)
        eps_prime = (eps0 + eps2) / 2
    else:
        eps_prime = eps0
    mean_pred = mean_from_eps(eps_prime, x, t0)
    nonzero = (i0 != 0).astype(x.dtype)
    x = mean_pred * nonzero + out0.pred_xstart * (1 - nonzero)

    # Ring buffer of past epsilons, most recent last.
    ring = jnp.stack([eps0] * order)

    ab_coeffs = {
        1: [1.0],
        2: [-1.0 / 2.0, 3.0 / 2.0],
        3: [5.0 / 12.0, -16.0 / 12.0, 23.0 / 12.0],
        4: [-9.0 / 24.0, 37.0 / 24.0, -59.0 / 24.0, 55.0 / 24.0],
    }

    def step(carry, args):
        x, ring, count = carry
        i = args
        t = jnp.full((B,), i, dtype=jnp.int32)
        eps, out = model_eps(x, t)
        ring_new = jnp.concatenate([ring[1:], eps[None]], axis=0)
        count_new = jnp.minimum(count + 1, order)

        def eps_for(cur_order):
            coeffs = ab_coeffs[cur_order]
            acc = jnp.zeros_like(eps)
            for k, c in enumerate(coeffs):
                acc = acc + c * ring_new[order - len(coeffs) + k]
            return acc

        branches = [lambda co=co: eps_for(co) for co in range(1, order + 1)]
        eps_prime = jax.lax.switch(jnp.clip(count_new, 1, order) - 1, branches)
        mean_pred = mean_from_eps(eps_prime, x, t)
        nz = (i != 0).astype(x.dtype)
        x_next = mean_pred * nz + out.pred_xstart * (1 - nz)
        return (x_next, ring_new, count_new), None

    if len(indices) > 1:
        (x, _, _), _ = jax.lax.scan(step, (x, ring, jnp.asarray(1)), indices[1:])
    return x


def dpmpp_2m_sample_loop(
    model_fn: ModelFn,
    sched: Schedule,
    noise: jnp.ndarray,
    key: jax.Array,
    config: SamplerConfig = SamplerConfig(),
    *,
    init_image: Optional[jnp.ndarray] = None,
    cond_fn: Optional[CondFn] = None,
    inpainting_mask: Optional[jnp.ndarray] = None,
    inpainted_motion: Optional[jnp.ndarray] = None,
    model_state=None,
):
    """DPM-Solver++(2M), data-prediction form (Lu et al. 2022).

    A second-order multistep ODE solver over log-SNR time: matches DDIM
    quality with ~2-3x fewer steps — capability beyond the reference's
    sampler set, natural here because MDM already predicts x0. One model
    call per step inside a single scan; deterministic.
    """
    B, nd = noise.shape[0], noise.ndim
    x, indices = _init_state(sched, noise, init_image, config.skip_timesteps)
    n = len(indices)

    alpha = jnp.sqrt(sched.alphas_cumprod)
    sigma = jnp.sqrt(1.0 - sched.alphas_cumprod)
    lam = jnp.log(alpha) - jnp.log(sigma)

    def pred_x0(x, i, mstate):
        t = jnp.full((B,), i, dtype=jnp.int32)
        res = _p_mean_variance_step(
            sched, model_fn, cond_fn, config, x, t, inpainting_mask,
            inpainted_motion, mstate, force_score=True,
        )
        out, mstate = res if mstate is not None else (res, mstate)
        return out.pred_xstart, mstate

    # First step: first-order (DDIM-style) update from t=indices[0] to indices[1].
    i0 = indices[0]
    d0, model_state = pred_x0(x, i0, model_state)

    def solver_update(x, d_tilde, i_from, i_to):
        h = lam[i_to] - lam[i_from]
        return (sigma[i_to] / sigma[i_from]) * x - alpha[i_to] * jnp.expm1(-h) * d_tilde

    if n == 1:
        return d0  # single-step: return the x0 prediction

    x = solver_update(x, d0, i0, indices[1])

    def step(carry, args):
        x, d_prev, i_prev2, i_prev, mstate = carry
        i_next = args
        d_cur, mstate = pred_x0(x, i_prev, mstate)
        h_prev = lam[i_prev] - lam[i_prev2]
        h = lam[i_next] - lam[i_prev]
        r = h_prev / h
        d_tilde = (1.0 + 1.0 / (2.0 * r)) * d_cur - (1.0 / (2.0 * r)) * d_prev
        x_next = solver_update(x, d_tilde, i_prev, i_next)
        return (x_next, d_cur, i_prev, i_next, mstate), None

    if n > 2:
        (x, _, _, i_last, model_state), _ = jax.lax.scan(
            step, (x, d0, i0, indices[1], model_state), indices[2:]
        )
    else:
        i_last = indices[1]

    # Final step to clean data: evaluate at the last timestep and take x0.
    d_final, _ = pred_x0(x, i_last, model_state)
    return d_final


SAMPLERS = {
    "ddpm": p_sample_loop,
    "ddim": ddim_sample_loop,
    "plms": plms_sample_loop,
    "dpmpp_2m": dpmpp_2m_sample_loop,
}
