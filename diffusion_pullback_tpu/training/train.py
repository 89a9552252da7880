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
  - microbatching → prefer bigger per-step batches / remat; when true
    accumulation is needed, `accum_steps` scans microbatches inside one jit.
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
    params: Any, optimizer: optax.GradientTransformation, n_ema: int = 1
) -> TrainState:
    """``n_ema > 1`` keeps one EMA copy per rate — the reference TrainLoop's
    comma-separated ``ema_rate`` list (train_util.py:58-62 keeps
    ``self.ema_params`` as a list); ``ema_params`` is then a tuple of
    pytrees, matching a tuple ``ema_rate`` in :func:`make_train_step`."""
    copy = lambda: jax.tree.map(jnp.copy, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=copy() if n_ema == 1 else tuple(copy() for _ in range(n_ema)),
        opt_state=optimizer.init(params),
    )


def make_train_step(
    apply_fn: Callable[[Any, jax.Array, jax.Array], jax.Array],
    schedule: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    ema_rate=0.9999,  # float, or tuple of floats for one EMA copy per rate
    learn_sigma_vb_weight: Optional[float] = None,
    loss_aware: bool = False,
    accum_steps: int = 1,
):
    """Build the pure train step.

    Plain:       (state, x0, key) → (state, metrics)
    loss_aware:  (state, x0, key, sampler_state) → (state, metrics,
                 sampler_state) — LossSecondMomentResampler semantics
                 (importance-sampled t + history update, training/resample.py).

    ``accum_steps > 1`` accumulates gradients over that many microbatches
    (batch must divide evenly) inside one compiled step via lax.scan — the
    reference's host-side microbatch loop (train_util.py:forward_backward)
    without per-microbatch dispatch; optimizer + EMA apply once per step.

    ``apply_fn(params, x_t, t)`` predicts ε; a learned-σ head (2× channels)
    trains its ε half with MSE plus ``learn_sigma_vb_weight``·L_vb (the
    improved-DDPM hybrid objective; stop-gradient on the mean inside L_vb is
    inherited from predicting ε in both terms).
    """
    from .losses import vb_term
    from .resample import loss_aware_sample_t, update_loss_aware, uniform_sample_t

    if isinstance(ema_rate, (tuple, list)) and len(ema_rate) == 1:
        # create_train_state(n_ema=1) stores a bare pytree, not a 1-tuple —
        # a single-rate list is the scalar case
        ema_rate = ema_rate[0]

    def per_sample_losses(params, x0, t, noise):
        at = alpha_bar(schedule, t.astype(jnp.float32))
        at = at.reshape((-1,) + (1,) * (x0.ndim - 1))
        xt = jnp.sqrt(at) * x0 + jnp.sqrt(1.0 - at) * noise
        pred = apply_fn(params, xt, t.astype(jnp.float32))
        if pred.shape[-1] != noise.shape[-1]:  # learned-sigma head
            eps_pred = pred[..., : noise.shape[-1]]
            logvar = pred[..., noise.shape[-1]:]
        else:
            eps_pred, logvar = pred, None
        mse = jnp.mean(
            (eps_pred.astype(jnp.float32) - noise) ** 2,
            axis=tuple(range(1, x0.ndim)),
        )
        if learn_sigma_vb_weight and logvar is not None:
            vb = vb_term(
                schedule, x0, xt, t.astype(jnp.float32),
                jax.lax.stop_gradient(eps_pred.astype(jnp.float32)),
                logvar.astype(jnp.float32),
            )
            mse = mse + learn_sigma_vb_weight * vb
        return mse

    def loss_fn(params, x0, t, noise, weights):
        losses = per_sample_losses(params, x0, t, noise)
        return jnp.mean(losses * weights), losses

    def sample_t_noise(kt, kn, batch, x0_shape, x0_dtype, sampler_state):
        if loss_aware:
            t, weights = loss_aware_sample_t(sampler_state, kt, batch)
        else:
            t, weights = uniform_sample_t(
                kt, batch, schedule.num_train_timesteps
            )
        noise = jax.random.normal(kn, x0_shape, x0_dtype)
        return t, weights, noise

    def train_step(state: TrainState, x0: jax.Array, key: jax.Array,
                   sampler_state=None):
        if accum_steps > 1:
            if x0.shape[0] % accum_steps:
                raise ValueError(
                    f"batch {x0.shape[0]} not divisible by accum_steps"
                    f" {accum_steps}"
                )
            mb = x0.shape[0] // accum_steps
            x0_mb = x0.reshape((accum_steps, mb) + x0.shape[1:])
            keys = jax.random.split(key, accum_steps)

            def micro(carry, inp):
                grads_acc, loss_acc = carry
                x0_i, key_i = inp
                kt, kn = jax.random.split(key_i)
                t, weights, noise = sample_t_noise(
                    kt, kn, mb, x0_i.shape, x0_i.dtype, sampler_state
                )
                (loss_i, losses_i), grads_i = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, x0_i, t, noise, weights)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads_i)
                return (grads_acc, loss_acc + loss_i), (t, losses_i)

            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.result_type(p)), state.params
            )
            (grads, loss), (t, losses) = jax.lax.scan(
                micro, (zero_grads, jnp.zeros(())), (x0_mb, keys)
            )
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss / accum_steps
            t, losses = t.reshape(-1), losses.reshape(-1)
        else:
            kt, kn = jax.random.split(key)
            t, weights, noise = sample_t_noise(
                kt, kn, x0.shape[0], x0.shape, x0.dtype, sampler_state
            )
            (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, x0, t, noise, weights
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_one = lambda rate, tree: jax.tree.map(
            lambda e, p: e * rate + p * (1.0 - rate), tree, params
        )
        if isinstance(ema_rate, (tuple, list)):
            # one EMA copy per rate (reference ema_rate="0.9999,0.99995",
            # train_util.py:58-62); state from create_train_state(n_ema=len)
            if not (isinstance(state.ema_params, tuple)
                    and len(state.ema_params) == len(ema_rate)):
                raise ValueError(
                    f"ema_rate has {len(ema_rate)} entries but the state "
                    "does not hold a matching tuple of EMA copies — build "
                    f"it with create_train_state(n_ema={len(ema_rate)})"
                )
            ema_params = tuple(
                ema_one(r, e) for r, e in zip(ema_rate, state.ema_params)
            )
        else:
            ema_params = ema_one(ema_rate, state.ema_params)
        new_state = TrainState(state.step + 1, params, ema_params, opt_state)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "step": new_state.step,
        }
        if loss_aware:
            sampler_state = update_loss_aware(sampler_state, t, losses)
            return new_state, metrics, sampler_state
        return new_state, metrics

    return train_step
