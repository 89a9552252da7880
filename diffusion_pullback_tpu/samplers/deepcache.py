"""Encoder-reuse (DeepCache-style) DDIM sampling.

Deep U-Net features change slowly across adjacent timesteps (the observation
behind 'Faster Diffusion' / DeepCache — see PAPERS.md); the expensive deep
path (down blocks 1.., mid, up blocks ..n-2) is therefore cached and only
refreshed every ``interval`` steps, while the shallow slice (conv_in + first
down block) and the last up block + head recompute every step. Built
entirely on the tap API: the cache is the ('up', n-2) tap activation, the
per-step shallow pass is UNet2D.shallow_encode, and the cheap step is
decode_with_state — no special-cased model code.

One fused lax.scan; the full-vs-reuse choice is a lax.cond on the step
index, so the whole trajectory stays a single XLA program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.unet2d import TapPoint, TapState, UNet2D
from ..ops.ddim import ddim_step
from ..ops.schedule import DiffusionSchedule, TimestepGrid, alpha_bar


def ddim_forward_deepcache(
    model: UNet2D,
    params,
    x: jax.Array,
    schedule: DiffusionSchedule,
    grid: TimestepGrid,
    interval: int = 3,
    start_idx: int = 0,
    end_idx: Optional[int] = None,
) -> jax.Array:
    """Denoise with deep-feature reuse. interval=1 ≡ the exact full model."""
    n_up = len(model.config.up_block_types)
    if n_up < 2:
        raise ValueError("deepcache needs at least 2 up blocks")
    tap = TapPoint("up", n_up - 2)

    end = grid.num_steps if end_idx is None else end_idx
    ts = grid.timesteps[start_idx:end]
    tn = grid.timesteps_next[start_idx:end]
    idx = jnp.arange(ts.shape[0])

    h_shape = jax.eval_shape(
        lambda z, t: model.apply(params, z, t, tap, method=UNet2D.encode),
        x, jnp.float32(0.0),
    )

    def body(carry, inp):
        xt, h_cache = carry
        t, t_next, i = inp

        def full(_):
            h, state = model.apply(
                params, xt, t, tap, method=UNet2D.encode_with_state
            )
            eps = model.apply(
                params, h, state, tap, method=UNet2D.decode_with_state
            )
            return eps, h

        def reuse(_):
            shallow = model.apply(params, xt, t, method=UNet2D.shallow_encode)
            eps = model.apply(
                params, h_cache, shallow, tap, method=UNet2D.decode_with_state
            )
            return eps, h_cache

        eps, h_new = jax.lax.cond(i % interval == 0, full, reuse, None)
        out = ddim_step(
            eps, xt, alpha_bar(schedule, t), alpha_bar(schedule, t_next)
        )
        return (out.prev_sample, h_new), None

    (x_final, _), _ = jax.lax.scan(
        body, (x, jnp.zeros(h_shape.shape, h_shape.dtype)), (ts, tn, idx)
    )
    return x_final


def ddim_forward_deepcache_cond(
    model,
    params,
    x: jax.Array,
    context: jax.Array,
    schedule: DiffusionSchedule,
    grid: TimestepGrid,
    interval: int = 3,
    start_idx: int = 0,
    end_idx: Optional[int] = None,
    added_cond=None,
    neg_context: Optional[jax.Array] = None,
    neg_added_cond=None,
    guidance_scale: float = 0.0,
) -> jax.Array:
    """Conditioned (SD-family) flavour of `ddim_forward_deepcache`: the
    cached deep path includes the cross-attention blocks; the per-step
    shallow slice is UNet2DCondition.shallow_encode (conv_in + first down
    block) and the reuse step runs only the last up block + head.
    interval=1 ≡ the exact full model.

    With ``neg_context`` and ``guidance_scale`` > 1, every ε evaluation is
    classifier-free guidance as one fused 2·B batch ([neg; cond] rows, the
    eps_with discipline, reference edit.py:446-463) — the deep-feature cache
    then covers both rows, so the reuse step still runs only the cheap
    slice once per CFG pair."""
    from ..models.unet2d_condition import CondTapState, UNet2DCondition

    n_up = len(model.config.up_block_types)
    if n_up < 2:
        raise ValueError("deepcache needs at least 2 up blocks")
    tap = TapPoint("up", n_up - 2)

    end = grid.num_steps if end_idx is None else end_idx
    ts = grid.timesteps[start_idx:end]
    tn = grid.timesteps_next[start_idx:end]
    idx = jnp.arange(ts.shape[0])

    cfg_on = neg_context is not None and guidance_scale > 1.0
    b = x.shape[0]

    def _bcast(a, n):
        return jnp.broadcast_to(a, (n,) + a.shape[1:])

    if cfg_on:
        ctx2 = jnp.concatenate(
            [_bcast(neg_context, b), _bcast(context, b)], axis=0
        )
        if added_cond is not None:
            neg_added = neg_added_cond if neg_added_cond is not None \
                else added_cond
            added2 = jax.tree.map(
                lambda n, c: jnp.concatenate([_bcast(n, b), _bcast(c, b)],
                                             axis=0),
                neg_added, added_cond,
            )
            kw = {"added_cond": added2}
        else:
            kw = {}
        eval_ctx = ctx2
        model_in = lambda z: jnp.concatenate([z, z], axis=0)

        def combine(eps2):
            e_un, e_c = jnp.split(eps2, 2, axis=0)
            return e_un + guidance_scale * (e_c - e_un)
    else:
        kw = {} if added_cond is None else {"added_cond": added_cond}
        eval_ctx = context
        model_in = lambda z: z
        combine = lambda eps: eps

    h_shape = jax.eval_shape(
        lambda z, t: model.apply(
            params, model_in(z), t, eval_ctx, tap,
            method=UNet2DCondition.encode, **kw
        ),
        x, jnp.float32(0.0),
    )

    def body(carry, inp):
        xt, h_cache = carry
        t, t_next, i = inp

        def full(_):
            h, state = model.apply(
                params, model_in(xt), t, eval_ctx, tap,
                method=UNet2DCondition.encode_with_state, **kw
            )
            eps = model.apply(
                params, h, state, tap, method=UNet2DCondition.decode_with_state
            )
            return combine(eps), h

        def reuse(_):
            shallow = model.apply(
                params, model_in(xt), t, eval_ctx,
                method=UNet2DCondition.shallow_encode, **kw
            )
            eps = model.apply(
                params, h_cache, shallow, tap,
                method=UNet2DCondition.decode_with_state
            )
            return combine(eps), h_cache

        eps, h_new = jax.lax.cond(i % interval == 0, full, reuse, None)
        out = ddim_step(
            eps, xt, alpha_bar(schedule, t), alpha_bar(schedule, t_next)
        )
        return (out.prev_sample, h_new), None

    (x_final, _), _ = jax.lax.scan(
        body, (x, jnp.zeros(h_shape.shape, h_shape.dtype)), (ts, tn, idx)
    )
    return x_final
