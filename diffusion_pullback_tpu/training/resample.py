"""Timestep schedule samplers: uniform and loss-second-moment importance.

Functional port of the vendored resampler
(/root/reference/src/models/guided_diffusion/resample.py: UniformSampler:61,
LossSecondMomentResampler:124). The torch version all-gathers per-rank losses
over MPI (resample.py:70-123); here the state is an ordinary pytree carried
through the (possibly dp-sharded) train step — a mean over the global batch
IS the collective.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def uniform_sample_t(key, batch: int, num_timesteps: int):
    """(t, weights) — uniform timesteps, unit weights."""
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)


class LossAwareState(NamedTuple):
    history: jax.Array  # (T, history_per_term) squared losses
    counts: jax.Array   # (T,) int32 — entries filled per t


def init_loss_aware(num_timesteps: int, history_per_term: int = 10) -> LossAwareState:
    return LossAwareState(
        history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
        counts=jnp.zeros((num_timesteps,), jnp.int32),
    )


def loss_aware_weights(
    state: LossAwareState, uniform_prob: float = 0.001
) -> jax.Array:
    """Sampling distribution over t ∝ sqrt(E[loss²]), mixed with uniform —
    exactly LossSecondMomentResampler.weights (resample.py:135-144), falling
    back to uniform until every term has a full history ('warmed up')."""
    T = state.history.shape[0]
    warmed = jnp.all(state.counts == state.history.shape[1])
    w = jnp.sqrt(jnp.mean(state.history**2, axis=-1))
    w = w / jnp.maximum(w.sum(), 1e-20)
    w = w * (1 - uniform_prob) + uniform_prob / T
    return jnp.where(warmed, w, jnp.full((T,), 1.0 / T))


def loss_aware_sample_t(
    state: LossAwareState, key, batch: int
) -> Tuple[jax.Array, jax.Array]:
    """(t, importance weights 1/(T p(t)))."""
    p = loss_aware_weights(state)
    t = jax.random.choice(key, p.shape[0], (batch,), p=p)
    w = 1.0 / (p.shape[0] * p[t])
    return t, w


def update_loss_aware(
    state: LossAwareState, t: jax.Array, losses: jax.Array
) -> LossAwareState:
    """Record per-sample losses into the per-t ring buffers (functional
    update of LossSecondMomentResampler.update_with_all_losses)."""

    def body(carry, inp):
        hist, cnt = carry
        ti, li = inp
        c = cnt[ti]
        hist_t = hist[ti]
        # ring-buffer: shift-left when full, else append at c
        full = c == hist.shape[1]
        shifted = jnp.concatenate([hist_t[1:], jnp.array([li])])
        appended = hist_t.at[jnp.minimum(c, hist.shape[1] - 1)].set(li)
        hist = hist.at[ti].set(jnp.where(full, shifted, appended))
        cnt = cnt.at[ti].set(jnp.minimum(c + 1, hist.shape[1]))
        return (hist, cnt), None

    (hist, cnt), _ = jax.lax.scan(
        body, (state.history, state.counts), (t, losses)
    )
    return LossAwareState(hist, cnt)
