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
    """Mean/log-variance of q(x_{t-1} | x_t, x_0) (DDPM posterior).

    The t=0 posterior variance is 0; like the reference's
    ``posterior_log_variance_clipped`` (gaussian_diffusion.py) the returned
    log-variance at t<1 is clipped to the t=1 value so downstream
    logvar-interpolation/decoder-NLL terms stay finite and parity-exact."""
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
    # t=1 variance for the clip
    at1 = alpha_bar(schedule, jnp.ones_like(t)).reshape(shape)
    at0 = alpha_bar(schedule, jnp.zeros_like(t)).reshape(shape)
    bt1 = 1.0 - at1 / at0
    var1 = bt1 * (1.0 - at0) / (1.0 - at1)
    var = jnp.where(jnp.reshape(t, shape) < 1.0, var1, var)
    return mean, jnp.log(jnp.clip(var, min=1e-20))


def vb_term(schedule: DiffusionSchedule, x0, xt, t, eps_pred, logvar_pred,
            clip_x0: bool = False):
    """Per-sample L_vb term in bits/dim for a learned-σ model output.

    The model logvar is the improved-DDPM interpolation between β_t and the
    posterior variance; here ``logvar_pred`` is the raw channel half and is
    range-interpolated exactly as gaussian_diffusion.py does. ``clip_x0``
    clamps the predicted x̂₀ to [-1, 1] first (the reference's
    clip_denoised, p_mean_variance)."""
    from ..ops.ddim import predict_x0
    from ..ops.schedule import beta as beta_lookup

    at = alpha_bar(schedule, t)
    shape = (-1,) + (1,) * (x0.ndim - 1)
    pred_x0 = predict_x0(eps_pred, xt, at.reshape(shape))
    if clip_x0:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

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


def prior_bpd(schedule: DiffusionSchedule, x0):
    """KL(q(x_T | x_0) ‖ N(0, I)) in bits/dim — the L_T prior term
    (reference _prior_bpd, guided_diffusion/gaussian_diffusion.py)."""
    t = jnp.full((x0.shape[0],), float(schedule.num_train_timesteps - 1))
    at = alpha_bar(schedule, t).reshape((-1,) + (1,) * (x0.ndim - 1))
    mean = jnp.sqrt(at) * x0
    logvar = jnp.log(jnp.clip(1.0 - at, min=1e-20))
    kl = normal_kl(mean, logvar, jnp.zeros_like(mean), jnp.zeros_like(logvar))
    return kl.reshape(kl.shape[0], -1).mean(axis=1) / math.log(2.0)


def calc_bpd_loop(schedule: DiffusionSchedule, model_fn, x0, key=None,
                  noise=None, clip_x0: bool = True):
    """Full-chain variational bound in bits/dim (reference calc_bpd_loop,
    guided_diffusion/gaussian_diffusion.py): for every t in [T-1 … 0] draw
    x_t ~ q(x_t | x_0), evaluate the model, and accumulate the per-step
    L_vb plus the prior term — one jitted `lax.scan` over the t axis
    instead of the reference's T-iteration Python loop.

    ``model_fn(xt, t) -> (eps_pred, logvar_raw)`` with t of shape (B,);
    supply either ``key`` (fresh per-step noise) or ``noise`` of shape
    (T, *x0.shape) for deterministic evaluation. Returns a dict with
    ``total_bpd``/``prior_bpd`` (B,), and per-step ``vb``/``xstart_mse``/
    ``mse`` of shape (T, B), ordered t = T-1 … 0 as the reference's.
    """
    if (key is None) == (noise is None):
        raise ValueError("pass exactly one of key= or noise=")
    T = schedule.num_train_timesteps
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.float32)
    shape = (-1,) + (1,) * (x0.ndim - 1)

    def body(carry, inp):
        k = carry
        if noise is None:
            k, sub = jax.random.split(k)
            t, n = inp, jax.random.normal(sub, x0.shape, x0.dtype)
        else:
            t, n = inp
        tb = jnp.full((x0.shape[0],), t)
        at = alpha_bar(schedule, tb).reshape(shape)
        xt = jnp.sqrt(at) * x0 + jnp.sqrt(1.0 - at) * n
        eps, logvar = model_fn(xt, tb)
        vb = vb_term(schedule, x0, xt, tb, eps, logvar, clip_x0=clip_x0)
        from ..ops.ddim import predict_x0

        px0 = predict_x0(eps, xt, at)
        if clip_x0:
            px0 = jnp.clip(px0, -1.0, 1.0)
        xs_mse = ((px0 - x0) ** 2).reshape(x0.shape[0], -1).mean(axis=1)
        # ε is recomputed from the (possibly clipped) x̂₀, exactly as the
        # reference's _predict_eps_from_xstart re-derivation
        eps_used = (xt - jnp.sqrt(at) * px0) / jnp.sqrt(1.0 - at)
        mse = ((eps_used - n) ** 2).reshape(x0.shape[0], -1).mean(axis=1)
        return k, (vb, xs_mse, mse)

    xs = ts if noise is None else (ts, noise)
    _, (vb, xs_mse, mse) = jax.lax.scan(
        body, key if key is not None else jax.random.key(0), xs
    )
    prior = prior_bpd(schedule, x0)
    return {
        "total_bpd": vb.sum(axis=0) + prior,
        "prior_bpd": prior,
        "vb": vb,
        "xstart_mse": xs_mse,
        "mse": mse,
    }
