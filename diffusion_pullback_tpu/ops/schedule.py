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


def space_timesteps(num_timesteps: int, section_counts) -> frozenset:
    """OpenAI respacing grid (reference
    /root/reference/src/models/guided_diffusion/respace.py:7-61): pick
    timesteps from equally-sized sections of the original process.

    ``section_counts``: list of per-section step counts, a comma-separated
    string, or ``"ddimN"`` for the DDIM paper's fixed integer striding.
    Returns the retained original-process steps. ADM/P2 checkpoints were
    published with these grids (e.g. "ddim25", "250"); the YH linspace grid
    (`ddim_timestep_grid`) does NOT visit the same steps.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return frozenset(range(0, num_timesteps, stride))
            raise ValueError(
                f"cannot create exactly {desired} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per, extra = divmod(num_timesteps, len(section_counts))
    start_idx, all_steps = 0, []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(
                f"cannot divide section of {size} steps into {section_count}"
            )
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur = 0.0
        for _ in range(section_count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return frozenset(all_steps)


def respaced_timestep_grid(
    section_counts,
    num_train_timesteps: int = 1000,
    inversion: bool = False,
) -> TimestepGrid:
    """A `TimestepGrid` visiting exactly the `space_timesteps` retained
    steps — sampling ADM checkpoints at their published grids through the
    same DDIM machinery as the YH grid. ᾱ lookups hit the retained original
    steps, which is what SpacedDiffusion's β-remap preserves
    (respace.py:77-88), so no table rebuild is needed for sampling.

    Pairing matches `ddim_timestep_grid`: forward descends through the
    retained steps; inversion ascends (+1e-6 float-tag) through the same
    (t, t_next) pairs reversed.
    """
    seq = np.asarray(
        sorted(space_timesteps(num_train_timesteps, section_counts)),
        dtype=np.float64,
    )
    if inversion:
        seq = seq + 1e-6
        ts, ts_next = seq[:-1], seq[1:]
    else:
        ts, ts_next = seq[1:][::-1], seq[:-1][::-1]
    return TimestepGrid(
        timesteps=jnp.asarray(ts, dtype=jnp.float32),
        timesteps_next=jnp.asarray(ts_next, dtype=jnp.float32),
    )


def respaced_betas(schedule: DiffusionSchedule, use_timesteps):
    """SpacedDiffusion's β table for a respaced process (respace.py:77-88):
    new β_i = 1 − ᾱ_i / ᾱ_prev over the retained steps, so the respaced
    process's cumulative ᾱ matches the original at every retained step.
    Needed for *training/VB losses* on respaced grids (sampling only needs
    `respaced_timestep_grid`). Returns (betas float64 array, timestep_map).
    """
    ac = np.cumprod(1.0 - np.asarray(schedule.betas, dtype=np.float64))
    keep = set(int(t) for t in use_timesteps)
    last, new_betas, tmap = 1.0, [], []
    for i, a in enumerate(ac):
        if i in keep:
            new_betas.append(1.0 - a / last)
            last = a
            tmap.append(i)
    return np.asarray(new_betas, dtype=np.float64), tmap


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
