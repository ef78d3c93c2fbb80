"""Gaussian diffusion q/p algebra as pure JAX functions.

Functional redesign of the reference engine
(/root/reference/diffusion/gaussian_diffusion.py:105-1622): no diffusion
object carries state into traced code — everything is `f(schedule, arrays,
static-config) -> arrays`, so each sampler / loss compiles into one XLA
program.

Feature parity surface: q_sample, posterior, predict-{x0,eps,xprev},
p_mean_variance with the inpainting hook, all four variance modes, cond-fn
guidance (mean & score), VLB terms in bits, prior KL.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import MeanType, Schedule, VarType

ModelFn = Callable[..., jnp.ndarray]


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample coefficients and shape-broadcast: [T] x [B] -> [B,1,..]."""
    return table[t].reshape(t.shape + (1,) * (ndim - 1))


def q_mean_variance(sched: Schedule, x_start, t):
    nd = x_start.ndim
    mean = extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(sched: Schedule, x_start, t, noise):
    """Sample x_t ~ q(x_t | x_0)."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(sched: Schedule, x_start, x_t, t):
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    variance = extract(sched.posterior_variance, t, nd)
    log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, variance, log_variance


def predict_xstart_from_eps(sched: Schedule, x_t, t, eps):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_xstart_from_xprev(sched: Schedule, x_t, t, xprev):
    nd = x_t.ndim
    return (
        extract(1.0 / sched.posterior_mean_coef1, t, nd) * xprev
        - extract(sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, nd) * x_t
    )


def predict_eps_from_xstart(sched: Schedule, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


class PMeanVariance(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray


def apply_inpainting(model_output, inpainting_mask, inpainted_motion):
    """Overwrite the x0 prediction inside the mask with ground truth.

    The reference applies this inside p_mean_variance every step
    (gaussian_diffusion.py:300-307); only valid for START_X prediction.
    """
    return jnp.where(inpainting_mask, inpainted_motion, model_output)


def p_mean_variance(
    sched: Schedule,
    model_output: jnp.ndarray,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = False,
    denoised_fn: Optional[Callable] = None,
    model_var_values: Optional[jnp.ndarray] = None,
    inpainting_mask: Optional[jnp.ndarray] = None,
    inpainted_motion: Optional[jnp.ndarray] = None,
) -> PMeanVariance:
    """Turn a raw model output into (mean, var, pred_x0) of p(x_{t-1}|x_t)."""
    nd = x.ndim

    if inpainting_mask is not None and inpainted_motion is not None:
        assert mean_type == MeanType.START_X, "inpainting requires START_X prediction"
        model_output = apply_inpainting(model_output, inpainting_mask, inpainted_motion)

    if var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        assert model_var_values is not None
        if var_type == VarType.LEARNED:
            model_log_variance = model_var_values
        else:
            min_log = extract(sched.posterior_log_variance_clipped, t, nd)
            max_log = extract(sched.log_betas, t, nd)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
        model_variance = jnp.exp(model_log_variance)
    elif var_type == VarType.FIXED_LARGE:
        model_variance = extract(sched.fixed_large_variance, t, nd)
        model_log_variance = extract(sched.log_fixed_large_variance, t, nd)
    else:  # FIXED_SMALL
        model_variance = extract(sched.posterior_variance, t, nd)
        model_log_variance = extract(sched.posterior_log_variance_clipped, t, nd)

    def process_xstart(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    if mean_type == MeanType.PREVIOUS_X:
        pred_xstart = process_xstart(predict_xstart_from_xprev(sched, x, t, model_output))
        model_mean = model_output
    else:
        if mean_type == MeanType.START_X:
            pred_xstart = process_xstart(model_output)
        else:  # EPSILON
            pred_xstart = process_xstart(predict_xstart_from_eps(sched, x, t, model_output))
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)

    return PMeanVariance(model_mean, model_variance, model_log_variance, pred_xstart)


def condition_mean(cond_grad, out: PMeanVariance) -> jnp.ndarray:
    """Sohl-Dickstein style mean shift: mean + var * grad(log p(y|x))."""
    return out.mean + out.variance * cond_grad


def condition_score(sched: Schedule, cond_grad, out: PMeanVariance, x, t) -> PMeanVariance:
    """Song et al. score conditioning: shift eps, re-derive x0 and mean."""
    nd = x.ndim
    alpha_bar = extract(sched.alphas_cumprod, t, nd)
    eps = predict_eps_from_xstart(sched, x, t, out.pred_xstart)
    eps = eps - jnp.sqrt(1.0 - alpha_bar) * cond_grad
    pred_xstart = predict_xstart_from_eps(sched, x, t, eps)
    mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    return PMeanVariance(mean, out.variance, out.log_variance, pred_xstart)


# ---------------------------------------------------------------------------
# Likelihood terms (engine-surface parity; MDM's default config never uses
# them, see reference utils/model_util.py:95-110).
# ---------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized (255-bin) Gaussian."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.maximum(cdf_delta, 1e-12))),
    )


def mean_flat(x):
    return x.mean(axis=tuple(range(1, x.ndim)))


def sum_flat(x):
    return x.sum(axis=tuple(range(1, x.ndim)))


def vb_terms_bpd(
    sched: Schedule, model_output, x_start, x_t, t, *, mean_type, var_type,
    model_var_values=None, clip_denoised=False,
):
    """KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) in bits; decoder NLL at t=0."""
    true_mean, _, true_logvar = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(
        sched, model_output, x_t, t, mean_type=mean_type, var_type=var_type,
        model_var_values=model_var_values, clip_denoised=clip_denoised,
    )
    kl = mean_flat(normal_kl(true_mean, true_logvar, out.mean, out.log_variance)) / np.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
    return jnp.where(t == 0, decoder_nll, kl), out.pred_xstart


def prior_bpd(sched: Schedule, x_start):
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, dtype=jnp.int32)
    mean, _, log_variance = q_mean_variance(sched, x_start, t)
    kl = normal_kl(mean, log_variance, jnp.zeros_like(mean), jnp.zeros_like(mean))
    return mean_flat(kl) / np.log(2.0)


def calc_bpd_loop(
    model_fn, sched: Schedule, x_start, key, *, mean_type, var_type,
    clip_denoised=False,
):
    """Full bits-per-dim evaluation over all timesteps as ONE lax.scan
    (reference calc_bpd_loop, gaussian_diffusion.py:1544-1600: a reversed
    python loop with per-step host syncs).

    Returns dict(total_bpd [B], prior_bpd [B], vb [B, T], xstart_mse [B, T],
    mse [B, T]).
    """
    B = x_start.shape[0]

    def step(key, t_scalar):
        key, nk = jax.random.split(key)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        noise = jax.random.normal(nk, x_start.shape, x_start.dtype)
        x_t = q_sample(sched, x_start, t, noise)
        model_out = model_fn(x_t, sched.model_timesteps(t))
        vb, pred_xstart = vb_terms_bpd(
            sched, model_out, x_start, x_t, t, mean_type=mean_type,
            var_type=var_type, clip_denoised=clip_denoised,
        )
        xstart_mse = mean_flat((pred_xstart - x_start) ** 2)
        eps = predict_eps_from_xstart(sched, x_t, t, pred_xstart)
        mse = mean_flat((eps - noise) ** 2)
        return key, (vb, xstart_mse, mse)

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    _, (vb, xstart_mse, mse) = jax.lax.scan(step, key, ts)
    vb = vb.T  # [B, T] (reversed-t order, like the reference's append loop)
    prior = prior_bpd(sched, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + prior,
        "prior_bpd": prior,
        "vb": vb,
        "xstart_mse": xstart_mse.T,
        "mse": mse.T,
    }
