"""DDIM / DDPM step math as pure, branchless, scan-friendly functions.

Parity targets (reference = enkeejunior1/Diffusion-Pullback):
  - `YHCustomScheduler.step` (src/utils/utils.py:1197-1241) and the identical
    SD monkey-patch (src/utils/utils.py:288-315):
        P_xt    = (x_t - sqrt(1-ᾱ_t) ε) / sqrt(ᾱ_t)
        σ_t     = sqrt((1 - ᾱ_t/ᾱ_next)(1 - ᾱ_next)/(1 - ᾱ_t))
        D_xt    = sqrt(1 - ᾱ_next - η σ_t²) ε        # NOTE: η·σ², not (ησ)²
        x_next  = sqrt(ᾱ_next) P_xt + D_xt + η σ_t z
    The η = 0 deterministic branch is the same formula with z-term and σ²
    correction dropped; we keep one branchless form (valid for traced η,
    which is how 'performance boosting' toggles η inside a lax.scan) plus a
    cheap deterministic specialisation.
  - learned-σ DDPM ancestral step (utils.py:1234-1239).

All functions take ᾱ values directly (already gathered via
`schedule.alpha_bar`) so they are trivially vmappable/scannable and have no
table state of their own.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class DDIMStepOutput(NamedTuple):
    prev_sample: jax.Array       # x at t_next
    pred_original: jax.Array     # P_xt, the Tweedie x0 estimate


def predict_x0(et: jax.Array, xt: jax.Array, at: jax.Array) -> jax.Array:
    """Tweedie estimate P_xt = (x_t − sqrt(1−ᾱ_t)·ε) / sqrt(ᾱ_t)."""
    return (xt - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)


def ddim_step(
    et: jax.Array,
    xt: jax.Array,
    at: jax.Array,
    at_next: jax.Array,
    eta: jax.Array | float = 0.0,
    noise: Optional[jax.Array] = None,
) -> DDIMStepOutput:
    """One DDIM update x_t → x_{t_next} (works for inversion and forward).

    ``at`` / ``at_next`` are scalars or arrays broadcastable against ``xt``.
    With ``noise=None`` the step is the deterministic ODE branch (η is
    ignored, reference utils.py:1223-1225). With a noise array, η may be a
    *traced* scalar — η=0 then still reproduces the deterministic branch
    exactly, which lets `lax.scan` loops switch η per step without `cond`.
    """
    p_x0 = predict_x0(et, xt, at)
    if noise is None:
        d = jnp.sqrt(1.0 - at_next) * et
        return DDIMStepOutput(jnp.sqrt(at_next) * p_x0 + d, p_x0)

    eta = jnp.asarray(eta, dtype=xt.dtype)
    sigma = jnp.sqrt((1.0 - at / at_next) * (1.0 - at_next) / (1.0 - at))
    # Reference subtracts η·σ² (not η²σ²) inside the direction term.
    d = jnp.sqrt(jnp.maximum(1.0 - at_next - eta * sigma**2, 0.0)) * et
    prev = jnp.sqrt(at_next) * p_x0 + d + eta * sigma * noise
    return DDIMStepOutput(prev, p_x0)


def ddpm_step_learned_sigma(
    et: jax.Array,
    logvar: jax.Array,
    xt: jax.Array,
    at: jax.Array,
    bt: jax.Array,
    noise: jax.Array,
) -> DDIMStepOutput:
    """Ancestral DDPM step with model-predicted log-variance.

    Reference utils.py:1234-1239: the model output is split channel-wise into
    (ε, logvar) by the caller; here both halves arrive pre-split.
    """
    mean = (xt - bt / jnp.sqrt(1.0 - at) * et) / jnp.sqrt(1.0 - bt)
    prev = mean + jnp.exp(0.5 * logvar) * noise
    return DDIMStepOutput(prev, predict_x0(et, xt, at))


def split_learned_sigma(model_out: jax.Array, axis: int = -1):
    """Split a learned-σ model output into (ε, logvar) halves along ``axis``
    (default: the trailing channel axis — this framework is NHWC; the
    reference splits torch NCHW outputs on dim 1, utils.py:1203)."""
    axis = axis % model_out.ndim
    c = model_out.shape[axis] // 2
    et = jax.lax.slice_in_dim(model_out, 0, c, axis=axis)
    logvar = jax.lax.slice_in_dim(model_out, c, 2 * c, axis=axis)
    return et, logvar
