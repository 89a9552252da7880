"""Diffusion noise schedules and DDIM timestep grids as pure data + functions.

Behavioral parity targets (reference = enkeejunior1/Diffusion-Pullback at
/root/reference):
  - `YHCustomScheduler.get_alphas_cumprod` / `linear_beta_schedule` /
    `cosine_beta_schedule` (src/utils/utils.py:1243-1281): beta tables are
    built in float64 and only then cast down, so we do the same on host
    numpy before materialising f32 device arrays.
  - `set_timesteps` (src/utils/utils.py:1182-1195 and the SD monkey-patch at
    src/utils/utils.py:273-286): *float* timestep grids over [0, 999] with the
    inversion grid shifted by +1e-6 and paired so that inversion and forward
    sampling traverse the exact same (alpha_t, alpha_next) pairs in opposite
    order — the reference's inversion-fidelity trick.
  - `extract` (src/utils/utils.py:1302-1315): alpha-bar lookup floors the
    float timestep to an integer index.

Everything here is shape-static and jit/scan friendly: a schedule is a small
NamedTuple of device arrays (a pytree), grids are fixed-length arrays, and the
alpha lookup is a gather.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Immutable noise schedule: beta table and its cumulative-alpha table.

    Both are float32 device arrays of length ``num_train_timesteps`` (1000 for
    every supported model family). The tables are precomputed in float64.
    """

    betas: jax.Array           # (T,)
    alphas_cumprod: jax.Array  # (T,)

    @property
    def num_train_timesteps(self) -> int:
        return self.betas.shape[0]

    @property
    def t_max(self) -> int:
        # Reference fixes t_max = 999 (utils.py:1174); equal to T - 1 here.
        return self.betas.shape[0] - 1

    # ---- constructors -----------------------------------------------------

    @staticmethod
    def from_betas(betas_f64: np.ndarray) -> "DiffusionSchedule":
        betas_f64 = np.asarray(betas_f64, dtype=np.float64)
        alphas_cumprod = np.cumprod(1.0 - betas_f64, axis=0)
        return DiffusionSchedule(
            betas=jnp.asarray(betas_f64, dtype=jnp.float32),
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        )

    @staticmethod
    def linear(
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        num_train_timesteps: int = 1000,
    ) -> "DiffusionSchedule":
        """DDPM linear schedule (reference utils.py:1263-1264)."""
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
        return DiffusionSchedule.from_betas(betas)

    @staticmethod
    def scaled_linear(
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        num_train_timesteps: int = 1000,
    ) -> "DiffusionSchedule":
        """Stable-Diffusion 'scaled_linear' schedule: linear in sqrt(beta).

        Matches diffusers' DDIMScheduler config used by the SD pipelines the
        reference loads (utils.py:340).
        """
        betas = (
            np.linspace(
                math.sqrt(beta_start),
                math.sqrt(beta_end),
                num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
        return DiffusionSchedule.from_betas(betas)

    @staticmethod
    def cosine(num_train_timesteps: int = 1000, s: float = 0.008) -> "DiffusionSchedule":
        """Improved-DDPM cosine schedule (reference utils.py:1271-1281).

        Note the reference calls this with ``timesteps = t_max + 1`` — i.e. a
        1000-entry table — which is what ``num_train_timesteps`` means here.
        """
        steps = num_train_timesteps + 1
        x = np.linspace(0, num_train_timesteps, steps, dtype=np.float64)
        ac = np.cos(((x / num_train_timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
        ac = ac / ac[0]
        betas = 1 - (ac[1:] / ac[:-1])
        betas = np.clip(betas, 0.0, 0.999)
        return DiffusionSchedule.from_betas(betas)

    @staticmethod
    def from_name(name: str, **kwargs) -> "DiffusionSchedule":
        try:
            return {
                "linear": DiffusionSchedule.linear,
                "cosine": DiffusionSchedule.cosine,
                "scaled_linear": DiffusionSchedule.scaled_linear,
            }[name](**kwargs)
        except KeyError:
            raise ValueError(f"unknown noise schedule: {name!r}") from None


class TimestepGrid(NamedTuple):
    """A fixed-length DDIM traversal: (t, t_next) pairs.

    ``timesteps`` are *float* (reference semantics), length num_steps - 1.
    For forward sampling they descend from t_max to the first positive grid
    point, with ``timesteps_next`` one grid point below; for inversion they
    ascend, shifted by +1e-6, with ``timesteps_next`` one grid point above.
    Inversion and forward traverse identical (ᾱ_t, ᾱ_next) pairs.
    """

    timesteps: jax.Array       # (num_steps - 1,)
    timesteps_next: jax.Array  # (num_steps - 1,)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def ddim_timestep_grid(
    num_steps: int, t_max: float = 999.0, inversion: bool = False
) -> TimestepGrid:
    """Build the reference's timestep pairing (utils.py:1182-1195).

    Forward (denoising):  t  = [t_max, ..., seq[1]],  t_next = [seq[n-2], ..., 0]
    Inversion (noising):  t  = [~0, ..., seq[n-2]],   t_next = [seq[1], ..., t_max]
    where seq = linspace(0, 1, num_steps) * t_max (+1e-6 for inversion).
    """
    seq = np.linspace(0.0, 1.0, num_steps, dtype=np.float64) * t_max
    if inversion:
        seq = seq + 1e-6
        ts = seq[:-1]
        ts_next = seq[1:]
    else:
        ts = seq[1:][::-1]
        ts_next = seq[:-1][::-1]
    return TimestepGrid(
        timesteps=jnp.asarray(ts, dtype=jnp.float32),
        timesteps_next=jnp.asarray(ts_next, dtype=jnp.float32),
    )


def alpha_bar(schedule: DiffusionSchedule, t: jax.Array) -> jax.Array:
    """ᾱ_t lookup with the reference's floor-to-int semantics (utils.py:1314).

    ``t`` may be a float scalar or any-shape float array; the result has the
    same shape. Indices are clamped into table range (the reference never
    gathers out of range by construction of the grids; clamping makes that
    explicit for the compiler).
    """
    idx = jnp.clip(
        jnp.asarray(t).astype(jnp.int32), 0, schedule.num_train_timesteps - 1
    )
    return jnp.take(schedule.alphas_cumprod, idx, axis=0)


def beta(schedule: DiffusionSchedule, t: jax.Array) -> jax.Array:
    """β_t lookup (floor-to-int), used by the learned-sigma DDPM step."""
    idx = jnp.clip(
        jnp.asarray(t).astype(jnp.int32), 0, schedule.num_train_timesteps - 1
    )
    return jnp.take(schedule.betas, idx, axis=0)
