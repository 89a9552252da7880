"""Diffusion training: ε-prediction MSE, EMA, mesh-sharded data parallelism.

TPU-native replacement for the reference's vendored OpenAI trainer stack
(/root/reference/src/models/guided_diffusion/train_util.py TrainLoop,
dist_util.py MPI→NCCL bootstrap, fp16_util.py manual loss scaling,
resample.py schedule samplers):

  - DDP/MPI → a `jax.sharding.Mesh`: the batch axis is sharded over 'dp',
    parameters/optimizer state optionally sharded over 'fsdp' — XLA inserts
    the all-reduce/all-gather collectives over ICI; there is no rank
    bootstrap, no broadcast-from-rank-0 (orbax/`jax.device_put` handle
    placement).
  - manual loss-scale fp16 → native bf16 compute with f32 master params
    (bf16 needs no loss scaling on TPU).
  - microbatching → bigger per-step batches; remat if memory-bound.
  - UniformSampler → uniform timesteps from `jax.random` (LossSecondMoment
    importance sampling can be layered on the same pure step).

Everything is a pure function of (state, batch, key); one jit contains the
whole step, so the EMA update and optimizer fuse into the same program.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.schedule import DiffusionSchedule, alpha_bar


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any


def create_train_state(
    params: Any, optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
    )


def make_train_step(
    apply_fn: Callable[[Any, jax.Array, jax.Array], jax.Array],
    schedule: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    ema_rate: float = 0.9999,
    learn_sigma_vb_weight: Optional[float] = None,
):
    """Build the pure train step: (state, x0 batch, key) → (state, metrics).

    ``apply_fn(params, x_t, t)`` predicts ε (learned-σ heads train their ε
    half against MSE like the reference's simplified objective; the vb term
    can be added via ``learn_sigma_vb_weight`` later).
    """

    def loss_fn(params, x0, t, noise):
        at = alpha_bar(schedule, t.astype(jnp.float32))
        at = at.reshape((-1,) + (1,) * (x0.ndim - 1))
        xt = jnp.sqrt(at) * x0 + jnp.sqrt(1.0 - at) * noise
        pred = apply_fn(params, xt, t.astype(jnp.float32))
        if pred.shape[-1] != noise.shape[-1]:  # learned-sigma head: ε half
            pred = pred[..., : noise.shape[-1]]
        return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

    def train_step(state: TrainState, x0: jax.Array, key: jax.Array):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(
            kt, (x0.shape[0],), 0, schedule.num_train_timesteps
        )
        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x0, t, noise)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = jax.tree.map(
            lambda e, p: e * ema_rate + p * (1.0 - ema_rate),
            state.ema_params,
            params,
        )
        new_state = TrainState(state.step + 1, params, ema_params, opt_state)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "step": new_state.step,
        }
        return new_state, metrics

    return train_step
