"""Variational-bound loss terms for learned-σ diffusion training.

Functional port of the reference's vendored losses
(/root/reference/src/models/guided_diffusion/losses.py: normal_kl,
discretized_gaussian_log_likelihood; gaussian_diffusion.py _vb_terms_bpd) —
the L_vb half of the improved-DDPM hybrid objective. Pure jnp functions,
scan/vmap-friendly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.schedule import DiffusionSchedule, alpha_bar


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, e^{logvar1}) || N(mean2, e^{logvar2})), elementwise in nats."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """log p(x) for images discretised to 255 bins (x in [-1, 1])."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        ),
    )


def q_posterior_mean_logvar(schedule: DiffusionSchedule, x0, xt, t):
    """Mean/log-variance of q(x_{t-1} | x_t, x_0) (DDPM posterior)."""
    at = alpha_bar(schedule, t)
    t_prev = jnp.maximum(t - 1.0, 0.0)
    at_prev = jnp.where(t < 1.0, jnp.ones_like(at), alpha_bar(schedule, t_prev))
    bt = 1.0 - at / at_prev
    shape = (-1,) + (1,) * (x0.ndim - 1)
    at, at_prev, bt = (v.reshape(shape) for v in (at, at_prev, bt))
    coef0 = jnp.sqrt(at_prev) * bt / (1.0 - at)
    coeft = jnp.sqrt(1.0 - bt) * (1.0 - at_prev) / (1.0 - at)
    mean = coef0 * x0 + coeft * xt
    var = bt * (1.0 - at_prev) / (1.0 - at)
    return mean, jnp.log(jnp.clip(var, min=1e-20))


def vb_term(schedule: DiffusionSchedule, x0, xt, t, eps_pred, logvar_pred):
    """Per-sample L_vb term in bits/dim for a learned-σ model output.

    The model logvar is the improved-DDPM interpolation between β_t and the
    posterior variance; here ``logvar_pred`` is the raw channel half and is
    range-interpolated exactly as gaussian_diffusion.py does.
    """
    from ..ops.ddim import predict_x0
    from ..ops.schedule import beta as beta_lookup

    at = alpha_bar(schedule, t)
    shape = (-1,) + (1,) * (x0.ndim - 1)
    pred_x0 = predict_x0(eps_pred, xt, at.reshape(shape))

    true_mean, true_logvar = q_posterior_mean_logvar(schedule, x0, xt, t)
    # model mean from predicted x0 through the same posterior
    model_mean, _ = q_posterior_mean_logvar(schedule, pred_x0, xt, t)

    # interpolate logvar between posterior (min) and β_t (max)
    bt = beta_lookup(schedule, t).reshape(shape)
    max_log = jnp.log(jnp.clip(bt, min=1e-20))
    min_log = true_logvar
    frac = (logvar_pred + 1.0) / 2.0
    model_logvar = frac * max_log + (1.0 - frac) * min_log

    kl = normal_kl(true_mean, true_logvar, model_mean, model_logvar)
    kl = kl.reshape(kl.shape[0], -1).mean(axis=1) / math.log(2.0)

    decoder_nll = -discretized_gaussian_log_likelihood(
        x0, model_mean, 0.5 * model_logvar
    )
    decoder_nll = decoder_nll.reshape(decoder_nll.shape[0], -1).mean(axis=1) / math.log(2.0)

    return jnp.where(t < 1.0, decoder_nll, kl)
