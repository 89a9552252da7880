"""x-space guidance: edit a latent along a pullback direction.

Reference semantics (edit.py:484-502 for SD, :1716-1734 uncond): each
micro-step evaluates ε on the pair [z, z + step·v_k] (one 2-batch U-Net
call) and moves z by scale·(ε_edit − ε_null) — a DDS-regularised walk along
the discovered direction. The reference loops this in Python collecting a
list (edit.py:293-301); here it is one `lax.scan` whose stacked ys ARE the
trajectory, and (pc, ±direction) pairs can be vmapped as a leading batch
axis instead of looped.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

EpsFn = Callable[[jax.Array, jax.Array], jax.Array]


def x_space_guidance_step(
    eps_fn: EpsFn,
    z: jax.Array,
    t: jax.Array,
    vk: jax.Array,
    edit_step: float,
    scale: float,
) -> jax.Array:
    """One micro-step. ``z``/``vk``: (B, H, W, C)."""
    z_edit = z + edit_step * vk
    pair = jnp.concatenate([z, z_edit], axis=0)
    et = eps_fn(pair, t)
    et_null, et_edit = jnp.split(et, 2, axis=0)
    return z + scale * (et_edit - et_null)


def x_space_guidance_scan(
    eps_fn: EpsFn,
    z0: jax.Array,
    t: jax.Array,
    vk: jax.Array,
    num_steps: int,
    edit_step: float,
    scale: float,
) -> jax.Array:
    """Run ``num_steps`` micro-steps; returns the trajectory INCLUDING the
    starting latent: (num_steps + 1, B, H, W, C) — matching the reference's
    zt_list = [original, step_1, ..., step_N] (edit.py:293-301) so callers
    can subsample `traj[:: len // vis_num]` identically."""

    def body(z, _):
        z_next = x_space_guidance_step(eps_fn, z, t, vk, edit_step, scale)
        return z_next, z_next

    _, traj = jax.lax.scan(body, z0, None, length=num_steps)
    return jnp.concatenate([z0[None], traj], axis=0)
