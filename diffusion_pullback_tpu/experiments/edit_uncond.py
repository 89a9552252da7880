"""Unconditional (pixel-space DDPM) editing experiments.

The TPU-native counterpart of the reference's `EditUncondDiffusion`
(/root/reference/src/modules/edit.py:540-1734). Same experiment surface —
DDIM inversion / forward, local-encoder-pullback editing with x-space
guidance and performance boosting, basis caching, PNG idempotency — but the
orchestration is jit-compiled scans and a vmapped (pc, ±direction) batch
instead of nested Python loops with memory_bound chunking:

  reference loop structure                  here
  ------------------------------------      --------------------------------
  per (pc, dir): python micro-step loop  →  one vmapped guidance scan over
    each a 2-batch U-Net call                the stacked ±pc direction batch
  DDIMforwardsteps chunked by                one jitted forward scan over the
    memory_bound, CPU buffer staging         whole trajectory batch
  power iteration: chunked jacfwd +      →  geometry.local_pullback (single
    autograd.jacobian per iteration          linearize, fused while_loop)
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import local_pullback
from ..models.unet2d import TapPoint, UNet2D
from ..ops.schedule import DiffusionSchedule, ddim_timestep_grid
from ..samplers.ddim_loop import ddim_forward, ddim_invert
from ..samplers.guidance import x_space_guidance_scan
from ..utils.images import save_image_grid
from ..utils.logging import JSONLLogger
from .cache import BasisCache, basis_name


@dataclasses.dataclass
class UncondExperimentConfig:
    dataset_name: str = "noise"
    for_steps: int = 100
    inv_steps: int = 100
    edit_t: float = 0.7
    seed: int = 0
    # x-space guidance (reference scripts/main_celeba_hf_*.sh)
    x_space_guidance_edit_step: float = 1.0
    x_space_guidance_scale: float = 0.1
    x_space_guidance_num_step: int = 16
    # performance boosting: η=1 below this fraction of T (edit.py:1650)
    performance_boosting_t: float = 0.2
    use_performance_boosting: bool = True
    # pullback
    pca_rank: int = 2
    pullback_min_iter: int = 10
    pullback_max_iter: int = 50
    pullback_atol: float = 1e-4
    pullback_chunk_size: Optional[int] = None
    # io
    result_folder: str = "./runs/uncond"
    obs_folder: str = "./runs/uncond/obs"
    basis_folder: str = "./inputs/local_encoder_pullback_uncond"
    vis_num: int = 4
    vis_num_pc: int = 2


class EditUncondDiffusion:
    """Experiment driver bound to one (model, params, schedule) triple."""

    def __init__(
        self,
        model: UNet2D,
        params,
        schedule: DiffusionSchedule,
        dataset,
        config: UncondExperimentConfig,
        logger: Optional[JSONLLogger] = None,
    ):
        self.model = model
        self.params = params
        self.schedule = schedule
        self.dataset = dataset
        self.cfg = config
        self.log = logger or JSONLLogger(
            os.path.join(config.result_folder, "log.jsonl")
        )
        self.cache = BasisCache(config.basis_folder)

        self.fwd_grid = ddim_timestep_grid(config.for_steps)
        self.inv_grid = ddim_timestep_grid(config.inv_steps, inversion=True)
        # nearest grid index to edit_t·T (reference edit.py:95)
        self.edit_t_idx = int(
            jnp.argmin(jnp.abs(self.fwd_grid.timesteps - config.edit_t * 1000.0))
        )
        # boost index: first step below performance_boosting_t·T
        below = np.asarray(self.fwd_grid.timesteps) < (
            config.performance_boosting_t * 1000.0
        )
        self.boost_start_idx = int(below.argmax()) if below.any() else None

        self._jit_cache = {}

    # ---- building blocks --------------------------------------------------
    # NOTE: params are always explicit jit arguments — closing over them
    # would bake ~450MB of weights into the HLO as literals (and overflow
    # the axon remote-compile transport).

    def _eps_with(self, params):
        return lambda z, t: self.model.apply(params, z, t)

    def eps_fn(self, z, t):
        return self.model.apply(self.params, z, t)

    def _jitted(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def run_ddim_inversion(self, idx: int) -> jax.Array:
        """x0 → xT (reference run_DDIMinversion, edit.py:613-678)."""
        x0 = jnp.asarray(self.dataset[idx])
        invert = self._jitted(
            "invert",
            lambda p, x: ddim_invert(
                self._eps_with(p), x, self.schedule, self.inv_grid
            ),
        )
        t0 = time.perf_counter()
        xT = invert(self.params, x0)
        xT.block_until_ready()
        self.log.log("ddim_inversion", idx=idx, seconds=time.perf_counter() - t0)
        return xT

    def run_ddim_forward(self, num_samples: int = 4, key=None, save_as=None):
        """Sample from noise (reference run_DDIMforward — the 'debug model
        load' smoke path, main.py:96-98)."""
        key = jax.random.key(self.cfg.seed) if key is None else key
        s = self.model.config.sample_size
        xT = jax.random.normal(key, (num_samples, s, s, 3), jnp.float32)
        fwd = self._jitted(
            f"forward_{num_samples}",
            lambda p, x: ddim_forward(
                self._eps_with(p), x, self.schedule, self.fwd_grid
            ),
        )
        x0 = fwd(self.params, xT)
        x0.block_until_ready()
        if save_as:
            save_image_grid(np.asarray(x0), save_as)
        return x0

    def forward_to_edit_t(self, xT: jax.Array) -> jax.Array:
        fn = self._jitted(
            "fwd_to_edit_t",
            lambda p, x: ddim_forward(
                self._eps_with(p), x, self.schedule, self.fwd_grid,
                start_idx=0, end_idx=self.edit_t_idx,
            ),
        )
        return fn(self.params, xT)

    def compute_local_basis(
        self, xt: jax.Array, t: jax.Array, tap: TapPoint, pca_rank: int
    ):
        run = self._jitted(
            f"pullback_{tap}_{pca_rank}",
            lambda p, z, tt, k: local_pullback(
                lambda zz: self.model.apply(p, zz, tt, tap, method=UNet2D.encode),
                z, k,
                pca_rank=pca_rank,
                min_iter=self.cfg.pullback_min_iter,
                max_iter=self.cfg.pullback_max_iter,
                atol=self.cfg.pullback_atol,
                chunk_size=self.cfg.pullback_chunk_size,
            ),
        )
        t0 = time.perf_counter()
        res = run(self.params, xt, t, jax.random.key(self.cfg.seed))
        jax.block_until_ready(res)
        self.log.log(
            "local_pullback",
            seconds=time.perf_counter() - t0,
            iterations=int(res.iterations),
            final_delta=float(res.final_delta),
            top_s=np.asarray(res.s[:3]).round(4),
        )
        return res

    # ---- headline experiment ---------------------------------------------

    def run_edit_local_encoder_pullback_xt(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: Optional[int] = None,
        vis_num: Optional[int] = None,
        vis_num_pc: Optional[int] = None,
    ):
        """Reference run_edit_local_encoder_pullback_zt (uncond flavour,
        edit.py:680-779): invert → partial forward → pullback basis (cached)
        → ±pc x-space-guidance walks → finish sampling (boosted) → PNGs.

        All (pc, ±) walks and their trajectory finishes run as one vmapped
        batch per jit instead of the reference's nested Python loops."""
        cfg = self.cfg
        pca_rank = pca_rank or cfg.pca_rank
        vis_num = vis_num or cfg.vis_num
        vis_num_pc = vis_num_pc or cfg.vis_num_pc
        tap = TapPoint(op, block_idx)

        xT = self.run_ddim_inversion(idx)
        xt = self.forward_to_edit_t(xT)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]

        name = basis_name(
            cfg.dataset_name, idx, cfg.edit_t, op, block_idx, cfg.seed
        )
        cached = self.cache.load(name)
        if cached is not None:
            u, s, vT = map(jnp.asarray, cached)
            self.log.log("basis_cache_hit", name=name)
        else:
            res = self.compute_local_basis(xt, t_edit, tap, pca_rank)
            u, s, vT = res.u, res.s, res.vT
            self.cache.save(name, u, s, vT)

        # normalise (reference edit.py:267-268)
        u = u / jnp.linalg.norm(u, axis=0, keepdims=True)
        vT = vT / jnp.linalg.norm(vT, axis=1, keepdims=True)

        # direction batch: (2·vis_num_pc, H, W, C) = ±v_k
        shape = xt.shape[1:]
        vks = []
        names = []
        for pc in range(vis_num_pc):
            for sign, tag in ((1.0, "pos"), (-1.0, "neg")):
                vks.append(sign * vT[pc].reshape(shape))
                names.append(
                    f"Edit_xt-{cfg.dataset_name}_{idx}-edit_{cfg.edit_t}T-{op}"
                    f"-block_{block_idx}-pc_{pc:03d}_{tag}"
                )
        todo = [i for i, n in enumerate(names) if not os.path.exists(
            os.path.join(cfg.result_folder, n + ".png"))]
        if not todo:
            self.log.log("all_edits_cached", idx=idx)
            return names
        vk_batch = jnp.stack([vks[i] for i in todo])  # (D, H, W, C)

        stride = max(1, (cfg.x_space_guidance_num_step + 1) // vis_num)
        boost = self.boost_start_idx if cfg.use_performance_boosting else None

        def edit_one(p, vk, key):
            eps = self._eps_with(p)
            traj = x_space_guidance_scan(
                eps, xt, t_edit, vk[None],
                num_steps=cfg.x_space_guidance_num_step,
                edit_step=cfg.x_space_guidance_edit_step,
                scale=cfg.x_space_guidance_scale,
            )                                   # (S+1, 1, H, W, C)
            sel = traj[::stride, 0]             # (vis, H, W, C)
            return ddim_forward(
                eps, sel, self.schedule, self.fwd_grid,
                start_idx=self.edit_t_idx,
                boost_start_idx=boost,
                key=key,
            )

        run_all = self._jitted(
            f"edit_batch_{len(todo)}_{stride}",
            lambda p, vs, keys: jax.vmap(
                lambda vk, k: edit_one(p, vk, k)
            )(vs, keys),
        )
        keys = jax.random.split(jax.random.key(cfg.seed + 1), len(todo))
        t0 = time.perf_counter()
        imgs = run_all(self.params, vk_batch, keys)
        imgs.block_until_ready()
        self.log.log(
            "x_space_guidance_edit",
            directions=len(todo),
            seconds=time.perf_counter() - t0,
        )

        for j, i in enumerate(todo):
            save_image_grid(
                np.asarray(imgs[j]),
                os.path.join(cfg.result_folder, names[i] + ".png"),
            )
        return names

    # ---- tangent-space harvesting ----------------------------------------

    def run_sample_encoder_local_tangent_space_xt(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 50,
        t_grid: Optional[Tuple[float, ...]] = None,
    ):
        """Harvest pullback bases across a timestep grid (reference
        run_sample_encoder_local_tangent_space_zt, edit.py:1516-1599)."""
        cfg = self.cfg
        tap = TapPoint(op, block_idx)
        t_grid = t_grid or tuple(np.linspace(0.1, 1.0, 10).round(2))
        xT = self.run_ddim_inversion(idx)

        out = {}
        for et in t_grid:
            t_idx = int(
                jnp.argmin(jnp.abs(self.fwd_grid.timesteps - et * 1000.0))
            )
            name = basis_name(cfg.dataset_name, idx, et, op, block_idx, cfg.seed)
            if self.cache.load(name) is not None:
                continue
            xt = self._jitted(
                f"fwd_to_{t_idx}",
                lambda p, x, _t_idx=t_idx: ddim_forward(
                    self._eps_with(p), x, schedule=self.schedule,
                    grid=self.fwd_grid, start_idx=0, end_idx=_t_idx,
                ),
            )(self.params, xT)
            res = self.compute_local_basis(
                xt, self.fwd_grid.timesteps[t_idx], tap, pca_rank
            )
            out[et] = self.cache.save(name, res.u, res.s, res.vT)
        return out
