"""DDIM sampling / inversion loops as single fused `lax.scan`s.

Replaces the reference's Python step loops with their chunked 'memory_bound'
buffering and CPU staging (/root/reference/src/modules/edit.py:112-183
run_DDIMinversion, :385-482 and :1601-1714 DDIMforwardsteps): under jit the
whole trajectory is one XLA program; the batch axis is just an array axis
(shard it over a mesh for data parallelism instead of chunking), and
'performance boosting' (η=1 below a timestep threshold,
edit.py:1650-1653) becomes a per-step η array fed to the scan — no Python
branching inside the loop.

Partial traversals (edit at intermediate t) slice the *static* grid arrays
before the scan, mirroring t_start_idx/t_end_idx index semantics.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.ddim import ddim_step
from ..ops.schedule import DiffusionSchedule, TimestepGrid, alpha_bar

# eps_fn(x, t) -> ε ; already closed over params / prompt conditioning / CFG
EpsFn = Callable[[jax.Array, jax.Array], jax.Array]


def performance_boost_etas(num_steps: int, boost_start_idx: Optional[int]):
    """η per forward step: 0 before ``boost_start_idx``, 1 from it on —
    including the final step. The reference's only exception (edit.py:1650)
    is the degenerate boost index == last step, where boosting is disabled
    entirely (the gate checks the *boost index*, not the current step).
    Host-side numpy on purpose: the schedule is static config, so it must
    stay a constant (bool()-able) even when built inside a jit trace.
    """
    import numpy as np

    etas = np.zeros((num_steps,), np.float32)
    if boost_start_idx is not None and boost_start_idx < num_steps - 1:
        etas[boost_start_idx:] = 1.0
    return etas


def ddim_scan(
    eps_fn: EpsFn,
    x: jax.Array,
    schedule: DiffusionSchedule,
    timesteps: jax.Array,
    timesteps_next: jax.Array,
    etas: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    collect_trajectory: bool = False,
    collect_eps: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scan x through the (t, t_next) pairs. Returns (x_final, trajectory).

    ``etas`` is a per-step array (requires ``key``); None → fully
    deterministic. ``collect_trajectory`` stacks each step's output; with
    ``collect_eps`` the trajectory is the pair (x_t stack, ε_t stack) —
    both feed the PSD/trajectory visualisation (reference edit.py:1632-1709).
    """
    stochastic = etas is not None
    if stochastic and key is None:
        raise ValueError("stochastic ddim_scan requires a PRNG key")
    if not stochastic:
        etas = jnp.zeros_like(timesteps)
    if key is None:
        key = jax.random.key(0)

    def body(carry, inp):
        xt, k = carry
        t, tn, eta = inp
        et = eps_fn(xt, t)
        k, sub = jax.random.split(k)
        noise = (
            jax.random.normal(sub, xt.shape, xt.dtype)
            if stochastic
            else None
        )
        out = ddim_step(
            et, xt, alpha_bar(schedule, t), alpha_bar(schedule, tn),
            eta=eta, noise=noise,
        )
        if collect_trajectory and collect_eps:
            ys = (out.prev_sample, et)
        elif collect_trajectory:
            ys = out.prev_sample
        elif collect_eps:
            ys = et
        else:
            ys = None
        return (out.prev_sample, k), ys

    (x_final, _), traj = jax.lax.scan(
        body, (x, key), (timesteps, timesteps_next, etas)
    )
    return x_final, traj


def ddim_invert(
    eps_fn: EpsFn,
    x0: jax.Array,
    schedule: DiffusionSchedule,
    grid: TimestepGrid,
) -> jax.Array:
    """x0 → x_T over the inversion grid (reference run_DDIMinversion loop,
    edit.py:152-178, :613-678). The reference loop breaks BEFORE its final
    timestep entry (`if i == len(timesteps) - 1: break`), so with an
    n-point grid (n−1 pairs) it executes only the first n−2 pairs and its
    "xT" sits at seq[n−2], not t_max — we scan the same n−2 pairs for
    output parity (verified against the executed reference loop in
    tests/test_fullscale_convert.py)."""
    xT, _ = ddim_scan(
        eps_fn, x0, schedule, grid.timesteps[:-1], grid.timesteps_next[:-1]
    )
    return xT


def ddim_forward(
    eps_fn: EpsFn,
    xT: jax.Array,
    schedule: DiffusionSchedule,
    grid: TimestepGrid,
    start_idx: int = 0,
    end_idx: Optional[int] = None,
    boost_start_idx: Optional[int] = None,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Denoise from grid index ``start_idx`` (inclusive) to ``end_idx``
    (exclusive; None = all the way to x0) — the scan equivalent of
    DDIMforwardsteps(zt, t_start_idx, t_end_idx)."""
    end = grid.num_steps if end_idx is None else end_idx
    ts = grid.timesteps[start_idx:end]
    tn = grid.timesteps_next[start_idx:end]
    etas = None
    if boost_start_idx is not None:
        etas_np = performance_boost_etas(grid.num_steps, boost_start_idx)[start_idx:end]
        etas = jnp.asarray(etas_np) if (etas_np > 0).any() else None
    x, _ = ddim_scan(eps_fn, xT, schedule, ts, tn, etas=etas, key=key)
    return x


def make_ddim_step_fn(eps_fn: EpsFn, schedule: DiffusionSchedule):
    """One fused (ε-eval + DDIM update) step for host-driven loops."""

    def step(x, t, t_next):
        et = eps_fn(x, t)
        return ddim_step(
            et, x, alpha_bar(schedule, t), alpha_bar(schedule, t_next)
        ).prev_sample

    return step


def ddim_loop_host(
    step_fn,
    x: jax.Array,
    timesteps,
    timesteps_next,
) -> jax.Array:
    """Host-driven traversal: ONE compiled step re-dispatched per (t, t_next)
    pair (t passed as a traced array → a single compilation total).

    Trade-off vs the fused `lax.scan`: ~ms-scale dispatch overhead per step,
    but compile time equals a single forward pass — the right choice for
    SD/SDXL-sized U-Nets where the scan program takes many minutes to build
    through a remote compiler, and for interactive/debug use.
    """
    for t, tn in zip(timesteps, timesteps_next):
        x = step_fn(x, t, tn)
    return x


def ddpm_forward(
    model_fn: Callable[[jax.Array, jax.Array], jax.Array],
    x: jax.Array,
    schedule: DiffusionSchedule,
    key: jax.Array,
    timesteps: Optional[jax.Array] = None,
    learn_sigma: bool = False,
    cond_fn=None,
) -> jax.Array:
    """Ancestral DDPM sampling loop (the vendored GaussianDiffusion
    p_sample_loop, /root/reference/src/models/guided_diffusion/
    gaussian_diffusion.py:397-482) as one `lax.scan`.

    - fixed small variance (β̃ posterior, ModelVarType.FIXED_SMALL) when
      ``learn_sigma`` is False; with True, ``model_fn`` returns [ε, v]
      stacked on channels where v∈[-1,1] is the ModelVarType.LEARNED_RANGE
      output (every published ADM/P2 learn_sigma checkpoint): the log
      variance is the improved-DDPM interpolation
      frac·log β_t + (1−frac)·log β̃_t with frac=(v+1)/2
      (gaussian_diffusion.py:262-275).
    - ``cond_fn`` applies the Sohl-Dickstein conditioning strategy
      (condition_mean, gaussian_diffusion.py:356-369): μ ← μ + Σ·∇ log p(y|x).
    - noise is masked at t == 0 (the reference's nonzero_mask).
    - ``timesteps``: descending int steps (default full T−1…0); pass the
      retained steps of `space_timesteps` for respaced sampling — β̃ and the
      mean coefficient are then computed from the RESPACED β
      (1 − ᾱ_t/ᾱ_prev), matching SpacedDiffusion exactly.
    """
    from ..ops.ddim import predict_x0, split_learned_sigma
    from ..ops.schedule import alpha_bar
    from ..samplers.guidance import condition_mean

    if timesteps is None:
        timesteps = jnp.arange(schedule.num_train_timesteps - 1, -1, -1,
                               dtype=jnp.float32)
    timesteps = jnp.asarray(timesteps, jnp.float32)
    # previous retained step (ᾱ_prev = 1 at the final step, reference
    # q_posterior semantics via alphas_cumprod_prev)
    t_prev = jnp.concatenate([timesteps[1:], jnp.full((1,), -1.0)])

    def body(carry, inp):
        xt, k = carry
        t, tp = inp
        ab_t = alpha_bar(schedule, t)
        ab_prev = jnp.where(tp < 0, 1.0, alpha_bar(schedule, tp))
        beta_t = 1.0 - ab_t / ab_prev            # respaced-exact β
        out = model_fn(xt, t)
        tilde = (1.0 - ab_prev) / (1.0 - ab_t) * beta_t
        # the 1e-20 floor stands in for posterior_log_variance_clipped; it
        # only differs at the final transition, where noise is masked anyway
        min_log = jnp.log(jnp.maximum(tilde, 1e-20))
        if learn_sigma:
            et, v = split_learned_sigma(out)
            frac = (v + 1.0) / 2.0
            logvar = frac * jnp.log(beta_t) + (1.0 - frac) * min_log
            variance = jnp.exp(logvar)
        else:
            et = out
            variance = jnp.broadcast_to(jnp.exp(min_log), xt.shape)
            logvar = jnp.broadcast_to(min_log, xt.shape)
        # posterior mean in ε form (gaussian_diffusion q_posterior through
        # _predict_xstart_from_eps)
        x0 = jnp.clip(predict_x0(et, xt, ab_t), -1.0, 1.0)
        coef1 = beta_t * jnp.sqrt(ab_prev) / (1.0 - ab_t)
        coef2 = (1.0 - ab_prev) * jnp.sqrt(1.0 - beta_t) / (1.0 - ab_t)
        mean = coef1 * x0 + coef2 * xt
        if cond_fn is not None:
            mean = condition_mean(mean, variance, cond_fn(xt, t))
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, xt.shape, xt.dtype)
        # the final grid transition (no previous retained step) is the
        # deterministic t→x0 step — the reference's nonzero_mask at index 0
        nonzero = (tp >= 0).astype(xt.dtype)
        x_next = mean + nonzero * jnp.exp(0.5 * logvar) * noise
        return (x_next, k), None

    (x0_final, _), _ = jax.lax.scan(body, (x, key), (timesteps, t_prev))
    return x0_final
