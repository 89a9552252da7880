"""Decompose the config-1 edit stage (VERDICT r4 item 6): the fused
walk+finish program runs at HALF the MFU of the plain DDIM scan (0.25 vs
0.56) and bf16 weight storage does not move it — so neither weight traffic
nor the program split explains the gap. Time each piece on-chip:

  a. one batch-1 eps eval          (the DDIM scan's per-step cost)
  b. one batch-2 eps eval          (the walk's per-step cost)
  c. the 16-step walk scan alone
  d. the 13-step finish scan alone
  e. the fused walk+finish program (what bench config1 measures)

Usage: python scripts/probe_edit_decomp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from bench import _sync, _w
from diffusion_pullback_tpu.models import UNet2D, ddpm_celebahq_256
from diffusion_pullback_tpu.ops import DiffusionSchedule, ddim_timestep_grid
from diffusion_pullback_tpu.samplers import ddim_forward, x_space_guidance_scan


def t_of(f, *args, n=5):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    cfg = ddpm_celebahq_256()
    sched = DiffusionSchedule.linear()
    x = jax.random.normal(jax.random.key(1), (1, 256, 256, 3), jnp.float32)
    vk = jax.random.normal(jax.random.key(3), (1, 256, 256, 3), jnp.float32)
    t_edit = jnp.float32(699.3)
    params = jax.jit(lambda k: UNet2D(cfg).init(k, x, t_edit))(
        jax.random.key(0))
    grid20 = ddim_timestep_grid(20)
    edit_idx = 6

    model = UNet2D(dataclasses.replace(cfg, dtype="bfloat16"))
    p = _w(params, "bfloat16")
    eps = lambda pp: (lambda z, t: model.apply(pp, z, t).astype(jnp.float32))

    e1 = t_of(jax.jit(lambda p, z: eps(p)(z, t_edit)), p, x, n=20)
    x2 = jnp.concatenate([x, x], axis=0)
    e2 = t_of(jax.jit(lambda p, z: eps(p)(z, t_edit)), p, x2, n=20)
    print(f"a. eps batch-1: {e1 * 1e3:.2f} ms   b. eps batch-2: "
          f"{e2 * 1e3:.2f} ms (ratio {e2 / e1:.2f})", flush=True)

    walk = jax.jit(lambda p, z, v: x_space_guidance_scan(
        eps(p), z, grid20.timesteps[edit_idx], v,
        num_steps=16, edit_step=0.1, scale=0.1)[-1])
    w = t_of(walk, p, x, vk)
    print(f"c. 16-step walk scan: {w * 1e3:.1f} ms "
          f"({w / 16 * 1e3:.2f} ms/step vs 2x-eval {2 * e1 * 1e3:.2f})",
          flush=True)

    fin = jax.jit(lambda p, z: ddim_forward(
        eps(p), z, sched, grid20, start_idx=edit_idx))
    f = t_of(fin, p, x)
    print(f"d. 13-step finish scan: {f * 1e3:.1f} ms "
          f"({f / 13 * 1e3:.2f} ms/step vs eval {e1 * 1e3:.2f})", flush=True)

    fused = jax.jit(lambda p, z, v: ddim_forward(
        eps(p),
        x_space_guidance_scan(eps(p), z, grid20.timesteps[edit_idx], v,
                              num_steps=16, edit_step=0.1, scale=0.1)[-1],
        sched, grid20, start_idx=edit_idx))
    fu = t_of(fused, p, x, vk)
    print(f"e. fused walk+finish: {fu * 1e3:.1f} ms "
          f"(walk+finish separate: {(w + f) * 1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
