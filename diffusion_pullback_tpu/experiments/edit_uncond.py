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
from ._common import DriverCommonMixin
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
    # h-space guidance (working spec; 0 = reuse x_space_guidance_scale)
    h_space_guidance_scale: float = 0.0
    # post-edit latent regularizers (working specs of the reference's
    # undefined hooks, edit.py:1192-1198; defaults from its commented flags)
    use_dynamic_thresholding: bool = False
    dynamic_thresholding_q: float = 0.8
    use_preserve_contrast: bool = False
    use_preserve_norm: bool = False
    use_sega_reg: bool = False
    sega_reg_sigma: float = 1.0
    # OpenAI respacing grid spec ('' = YH linspace grid from for_steps)
    sampling_timesteps: str = ""
    # classifier guidance (ADM condition_score path) — recorded here so
    # cache keys can distinguish guided trajectories; the actual cond_fn
    # hook is set on the driver
    classifier_scale: float = 0.0
    classifier_label: int = 0
    # attention impl for the linearized pullback encoder ('' = the model's
    # own; 'flash' selects the fused custom_jvp/custom_vjp kernel pair —
    # required whenever the MODEL runs the flash primal, which has no
    # forward-mode rule)
    pullback_attn_impl: str = ""
    # performance boosting: η=1 below this fraction of T (edit.py:1650)
    performance_boosting_t: float = 0.2
    use_performance_boosting: bool = True
    # AOT program export (utils/aot.py): 'auto' serializes traced programs
    # on single-device accelerator runs so later processes skip re-tracing
    aot_export: str = "auto"
    # pullback
    pca_rank: int = 2
    pullback_min_iter: int = 10
    pullback_max_iter: int = 50
    pullback_atol: float = 1e-4
    pullback_chunk_size: Optional[int] = None
    # device mesh (jax.sharding.Mesh) — 'probe' axis shards the power
    # iteration, 'dp' shards sweep axes; None = single device
    mesh: Optional[object] = None
    # io
    result_folder: str = "./runs/uncond"
    obs_folder: str = "./runs/uncond/obs"
    basis_folder: str = "./inputs/local_encoder_pullback_uncond"
    vis_num: int = 4
    vis_num_pc: int = 2


class EditUncondDiffusion(DriverCommonMixin):
    """Experiment driver bound to one (model, params, schedule) triple."""

    @property
    def _arch_config(self):
        return self.model.config

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

        if config.sampling_timesteps:
            # OpenAI respacing grids ('ddim25', '250', '25,25,25') — the
            # published ADM checkpoint settings (respace.py:7-61); the YH
            # linspace grid does not visit the same steps
            from ..ops.schedule import respaced_timestep_grid

            self.fwd_grid = respaced_timestep_grid(config.sampling_timesteps)
            self.inv_grid = respaced_timestep_grid(
                config.sampling_timesteps, inversion=True
            )
        else:
            self.fwd_grid = ddim_timestep_grid(config.for_steps)
            self.inv_grid = ddim_timestep_grid(config.inv_steps,
                                               inversion=True)
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
        # classifier-guidance hook: set to a cond_fn(x, t) → ∇ log p(y|x)
        # (samplers/guidance.classifier_grad_fn) to guide every sampler loop
        self.cond_fn = None
        # UNet2DConfig calls it sample_size, ADMConfig image_size
        self._sample_size = getattr(
            model.config, "sample_size", None
        ) or model.config.image_size

        # place weights on the configured mesh once (replicated, or
        # tensor-parallel when the mesh has a 'tp' axis) so every jitted
        # program sees consistently-placed inputs
        self.params = self._place_weights(self.params)

    # ---- building blocks --------------------------------------------------
    # NOTE: params are always explicit jit arguments — closing over them
    # would bake ~450MB of weights into the HLO as literals (and overflow
    # the axon remote-compile transport).

    def _eps_with(self, params):
        """ε(z, t); learned-σ heads (ADM family) emit [ε, σ] stacked on the
        channel axis — DDIM sampling consumes the ε half (the reference's
        et.split(...) in YHCustomScheduler.step, utils.py:1212-1215).
        With a ``cond_fn`` set (classifier guidance, the vendored
        condition_score math — samplers/guidance.py), every sampler loop
        automatically runs guided."""
        if getattr(self.model.config, "learn_sigma", False):
            c = self.model.config.out_channels
            base = lambda z, t: self.model.apply(params, z, t)[..., :c]
        else:
            base = lambda z, t: self.model.apply(params, z, t)
        if getattr(self, "cond_fn", None) is not None:
            from ..samplers.guidance import guided_eps_fn

            return guided_eps_fn(base, self.cond_fn, self.schedule)
        return base

    def eps_fn(self, z, t):
        return self._eps_with(self.params)(z, t)

    def _basis_name_extras(self, tap=None) -> str:
        """Cache-key qualifiers beyond basis_name: intra-block tap position
        and the classifier-guidance setting. A cond_fn folds into every ε
        eval, so guided runs invert/forward to DIFFERENT latents — bases
        harvested under guidance must not shadow unguided ones."""
        s = ""
        if tap is not None and getattr(tap, "inner", None):
            s += f"-after_{tap.inner[0]}{tap.inner[1]}"
        if getattr(self, "cond_fn", None) is not None:
            s += (f"-clsg{self.cfg.classifier_scale}"
                  f"-y{self.cfg.classifier_label}")
        return s

    def _model_variant(self, attn_impl: str):
        """Same weights, different attention kernels (the param tree is
        impl-independent)."""
        key = f"_model_variant_{attn_impl}"
        if key not in self._jit_cache:
            self._jit_cache[key] = type(self.model)(
                dataclasses.replace(self.model.config, attn_impl=attn_impl)
            )
        return self._jit_cache[key]

    def _pullback_models(self):
        """(model_jvp, model_vjp_or_None) for the linearized pullback —
        the SD-driver discipline (edit_sd._pullback_tap_encoders): a flash
        model (or cfg.pullback_attn_impl flash) maps to the fused
        custom_jvp/custom_vjp kernel pair, since the flash primal cannot be
        jax.linearize'd. At DDPM-256 sequence lengths (≤256 tokens) every
        impl falls back to XLA inside attention(), so this only changes
        behavior for ADM-style nets with ≥1024-token attention."""
        model_impl = getattr(self.model.config, "attn_impl", None)
        if model_impl is None:
            # the DDPM-family UNet2D has no switchable attention (its 256-
            # token attention never profits from fused kernels) — nothing
            # to pair or override
            return self.model, None
        impl = getattr(self.cfg, "pullback_attn_impl", "") or model_impl
        if impl in ("flash", "flash_jvp"):
            return (self._model_variant("flash_jvp"),
                    self._model_variant("flash"))
        if impl == "ring":
            # the differentiated model must use ring's XLA inner (both-mode
            # differentiable); the fused-LSE inner is primal-only
            impl = "ring_xla"
        if impl != model_impl:
            return self._model_variant(impl), None
        return self.model, None

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

    def run_ddim_forward(self, num_samples: int = 4, key=None, save_as=None,
                         vis_psd: bool = False):
        """Sample from noise (reference run_DDIMforward — the 'debug model
        load' smoke path, main.py:96-98). ``vis_psd`` additionally saves
        radially-averaged PSD curves of the x_t and ε_t trajectories
        (working spec of the reference's broken vis_psd path,
        edit.py:1702-1709)."""
        key = jax.random.key(self.cfg.seed) if key is None else key
        s = self._sample_size
        xT = jax.random.normal(key, (num_samples, s, s, 3), jnp.float32)
        if vis_psd:
            from ..samplers.ddim_loop import ddim_scan

            fwd = self._jitted(
                f"forward_psd_{num_samples}",
                lambda p, x: ddim_scan(
                    self._eps_with(p), x, self.schedule,
                    self.fwd_grid.timesteps, self.fwd_grid.timesteps_next,
                    collect_trajectory=True, collect_eps=True,
                ),
            )
            x0, (xt_traj, et_traj) = fwd(self.params, xT)
            from .vis import vis_power_spectral_density

            vis_power_spectral_density(
                np.asarray(xt_traj),
                os.path.join(self.cfg.obs_folder, "xt_psd.png"),
            )
            vis_power_spectral_density(
                np.asarray(et_traj),
                os.path.join(self.cfg.obs_folder, "et_psd.png"),
            )
        else:
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
        n_probe = self._mesh_probe_size(pca_rank)
        m_jvp, m_vjp = self._pullback_models()
        enc = lambda m: (lambda p, zz, tt: m.apply(
            p, zz, tt, tap, method=type(m).encode))
        e_jvp, e_vjp = enc(m_jvp), (enc(m_vjp) if m_vjp is not None else None)
        if n_probe:
            from ..parallel import make_sharded_pullback

            runner = self._cached(
                f"pullback_{tap}_{pca_rank}_probe{n_probe}",
                lambda: make_sharded_pullback(
                    lambda zz, p, tt: e_jvp(p, zz, tt),
                    self.cfg.mesh,
                    pca_rank=pca_rank,
                    min_iter=self.cfg.pullback_min_iter,
                    max_iter=self.cfg.pullback_max_iter,
                    atol=self.cfg.pullback_atol,
                    fn_vjp=((lambda zz, p, tt: e_vjp(p, zz, tt))
                            if e_vjp is not None else None),
                ),
            )
            run = lambda p, z, tt, k: runner(z, k, p, tt)
        else:
            run = self._jitted(
                f"pullback_{tap}_{pca_rank}",
                lambda p, z, tt, k: local_pullback(
                    lambda zz: e_jvp(p, zz, tt),
                    z, k,
                    pca_rank=pca_rank,
                    min_iter=self.cfg.pullback_min_iter,
                    max_iter=self.cfg.pullback_max_iter,
                    atol=self.cfg.pullback_atol,
                    fn_vjp=((lambda zz: e_vjp(p, zz, tt))
                            if e_vjp is not None else None),
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
            probe_shards=n_probe or 1,
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
        after_res: bool = False,
        after_sa: bool = False,
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
        tap = self._make_tap(op, block_idx, after_res, after_sa)

        xT = self.run_ddim_inversion(idx)
        xt = self.forward_to_edit_t(xT)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]
        shape_hint = tuple(xt.shape[1:])

        name = basis_name(
            cfg.dataset_name, idx, cfg.edit_t, op, block_idx, cfg.seed,
            pca_rank=pca_rank,
        ) + self._basis_name_extras(tap)
        cached = self.cache.load(name)
        if cached is not None:
            u, s, vT = map(jnp.asarray, cached)
            self.log.log("basis_cache_hit", name=name)
        else:
            res = self.compute_local_basis(xt, t_edit, tap, pca_rank)
            u, s, vT = res.u, res.s, res.vT
            self.cache.save(name, u, s, vT)
            # analysis artifacts (reference edit.py:249-263)
            try:
                from .vis import plot_eigenvalue_spectrum, visualize_vT_rgb

                plot_eigenvalue_spectrum(
                    np.asarray(s),
                    os.path.join(cfg.obs_folder,
                                 f"eigenvalue_spectrum-{name}.png"),
                )
                visualize_vT_rgb(
                    np.asarray(vT), shape_hint,
                    os.path.join(cfg.obs_folder, f"vT-{name}.png"),
                )
            except Exception as e:  # visualisation must never kill a run
                self.log.log("vis_failed", error=str(e))

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
        return self._edit_along_directions(xt, vks, names, vis_num)

    def run_edit_h_space_guidance(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: Optional[int] = None,
        vis_num: Optional[int] = None,
        vis_num_pc: Optional[int] = None,
        scale: Optional[float] = None,
    ):
        """h-space editing — working spec of the reference's aspirational
        path (edit.py:1236,1504 call self.h_space_guidance which is never
        defined; the h_space_guidance_scale / edit_ht='h_space_guidance'
        knobs are commented out of its argparser).

        Directions are the h-space singular vectors u_k of the pullback
        basis. Each micro-step perturbs the tapped feature and resumes the
        pass (forward_dh semantics, utils.py:350-436), then applies the same
        DDS update as x-space guidance:

            h, state = encode(x_t)                      # ONE encoder pass
            [ε_null; ε_edit] = decode([h; h + δ·û_k], state)
            x_t ← x_t + scale·(ε_edit − ε_null)

        ε_null/ε_edit sharing the encoder pass is the TPU-native fusion the
        reference's forward_dh design implies but never exploits."""
        cfg = self.cfg
        pca_rank = pca_rank or max(cfg.pca_rank, 2)
        vis_num = vis_num or cfg.vis_num
        vis_num_pc = vis_num_pc or cfg.vis_num_pc
        scale = scale if scale is not None else (
            cfg.h_space_guidance_scale or cfg.x_space_guidance_scale)
        tap = TapPoint(op, block_idx)

        xT = self.run_ddim_inversion(idx)
        xt = self.forward_to_edit_t(xT)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]

        name = basis_name(cfg.dataset_name, idx, cfg.edit_t, op, block_idx,
                          cfg.seed, pca_rank=pca_rank) \
            + self._basis_name_extras(tap)
        cached = self.cache.load(name)
        if cached is not None:
            u, s, vT = map(jnp.asarray, cached)
        else:
            res = self.compute_local_basis(xt, t_edit, tap, pca_rank)
            u, s, vT = res.u, res.s, res.vT
            self.cache.save(name, u, s, vT)

        if vis_num_pc > u.shape[1]:
            self.log.log("vis_num_pc_clamped", requested=vis_num_pc,
                         available=int(u.shape[1]))
            vis_num_pc = int(u.shape[1])
        h_shape = jax.eval_shape(
            lambda z: self.model.apply(self.params, z, t_edit, tap,
                                       method=type(self.model).encode), xt
        ).shape
        c_out = self.model.config.out_channels
        learn_sigma = getattr(self.model.config, "learn_sigma", False)

        names, dhs = [], []
        for pc in range(vis_num_pc):
            uk = u[:, pc]
            uk = (uk / jnp.linalg.norm(uk)).reshape(h_shape)
            for sign, stag in ((1.0, "pos"), (-1.0, "neg")):
                dhs.append(sign * cfg.x_space_guidance_edit_step * uk)
                names.append(
                    f"Edit_h_space-{cfg.dataset_name}_{idx}"
                    f"-edit_{cfg.edit_t}T-{op}-block_{block_idx}"
                    f"-scale_{scale}-pc_{pc:03d}_{stag}"
                )
        todo = [i for i, n in enumerate(names) if not os.path.exists(
            os.path.join(cfg.result_folder, n + ".png"))]
        if not todo:
            self.log.log("all_edits_cached")
            return names
        dh_batch = jnp.stack([dhs[i] for i in todo])

        stride = max(1, (cfg.x_space_guidance_num_step + 1) // vis_num)
        boost = self.boost_start_idx if cfg.use_performance_boosting else None

        def edit_one(p, z_start, dh, key):
            def micro(z, _):
                h, state = self.model.apply(
                    p, z, t_edit, tap, method=type(self.model).encode_with_state
                )
                h2 = jnp.concatenate([h, h + dh], axis=0)  # dh: (1, *h_spatial)
                eps2 = self.model.apply(
                    p, h2, state, tap, method=type(self.model).decode_with_state
                )
                if learn_sigma:
                    eps2 = eps2[..., :c_out]
                z_new = z + scale * (eps2[1:] - eps2[:1])
                return z_new, z_new

            _, traj = jax.lax.scan(
                micro, z_start, None, length=cfg.x_space_guidance_num_step
            )
            traj = jnp.concatenate([z_start[None], traj], axis=0)
            sel = traj[::stride, 0]
            return ddim_forward(
                self._eps_with(p), sel, self.schedule, self.fwd_grid,
                start_idx=self.edit_t_idx, boost_start_idx=boost, key=key,
            )

        run_all = self._jitted(
            f"h_edit_batch_{tap}_{len(todo)}_{stride}_{scale}",
            lambda p, z_start, ds, keys: jax.vmap(
                lambda dh, k: edit_one(p, z_start, dh, k)
            )(ds, keys),
        )
        keys = jax.random.split(jax.random.key(cfg.seed + 2), len(todo))
        t0 = time.perf_counter()
        imgs = run_all(self.params, xt, dh_batch, keys)
        imgs.block_until_ready()
        self.log.log("h_space_guidance_edit", directions=len(todo),
                     seconds=time.perf_counter() - t0)
        for j, i in enumerate(todo):
            save_image_grid(
                np.asarray(imgs[j]),
                os.path.join(cfg.result_folder, names[i] + ".png"),
            )
        return names

    def _edit_along_directions(self, xt, vks, names, vis_num):
        """Shared tail of every editing experiment: vmapped x-space-guidance
        walks over the direction batch, boosted finish sampling, PNG grids
        with skip-if-exists idempotency."""
        cfg = self.cfg
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]
        todo = [i for i, n in enumerate(names) if not os.path.exists(
            os.path.join(cfg.result_folder, n + ".png"))]
        if not todo:
            self.log.log("all_edits_cached")
            return names
        vk_batch = jnp.stack([vks[i] for i in todo])  # (D, H, W, C)

        stride = max(1, (cfg.x_space_guidance_num_step + 1) // vis_num)
        boost = self.boost_start_idx if cfg.use_performance_boosting else None

        def edit_one(p, z_start, vk, key):
            eps = self._eps_with(p)
            traj = x_space_guidance_scan(
                eps, z_start, t_edit, vk[None],
                num_steps=cfg.x_space_guidance_num_step,
                edit_step=cfg.x_space_guidance_edit_step,
                scale=cfg.x_space_guidance_scale,
                pair_impl=getattr(cfg, "xsg_pair_impl", "batch"),
            )                                   # (S+1, 1, H, W, C)
            sel = traj[::stride, 0]             # (vis, H, W, C)
            # post-edit regularizers in the reference's order (:1192-1198)
            from ..samplers.regularizers import (
                dynamic_thresholding, preserve_contrast, preserve_norm,
            )

            if cfg.use_dynamic_thresholding:
                sel = dynamic_thresholding(sel, cfg.dynamic_thresholding_q)
            if cfg.use_preserve_contrast:
                sel = preserve_contrast(sel, z_start)
            if cfg.use_preserve_norm:
                sel = preserve_norm(sel, z_start)
            return ddim_forward(
                eps, sel, self.schedule, self.fwd_grid,
                start_idx=self.edit_t_idx,
                boost_start_idx=boost,
                key=key,
            )

        run_all = self._jitted(
            f"edit_batch_{len(todo)}_{stride}",
            lambda p, z_start, vs, keys: jax.vmap(
                lambda vk, k: edit_one(p, z_start, vk, k)
            )(vs, keys),
        )
        keys = jax.random.split(jax.random.key(cfg.seed + 1), len(todo))
        t0 = time.perf_counter()
        imgs = run_all(self.params, xt, vk_batch, keys)
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

    # reference-name aliases (main.py dispatches the `_zt` names for both
    # families, reference main.py:30-34; uncond has no prompt conditioning)
    def run_edit_local_encoder_pullback_zt(self, *a, **kw):
        kw.pop("edit_prompt", None)
        kw.pop("edit_t", None)
        return self.run_edit_local_encoder_pullback_xt(*a, **kw)

    def run_edit_local_decoder_pullback_zt(self, *a, **kw):
        kw.pop("edit_prompt", None)
        return self.run_edit_local_decoder_pullback_xt(*a, **kw)

    def run_edit_local_pca_zt(self, *a, **kw):
        kw.pop("edit_prompt", None)
        return self.run_edit_local_pca_xt(*a, **kw)

    def run_edit_global_pca_zt(self, *a, **kw):
        kw.pop("edit_prompt", None)
        return self.run_edit_global_pca_xt(*a, **kw)

    # ---- secondary geometry experiments ----------------------------------

    def run_edit_parallel_transport(
        self,
        sample_idx_0: int,
        sample_idx_1: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 50,
        vis_num: int = 4,
        vis_num_pc: int = 2,
    ):
        """Transport directions discovered at sample 0 to sample 1 and edit
        sample 1 along them — working spec of the reference's
        run_edit_parallel_transport (edit.py:781-948; crashes as shipped on
        unset attrs — SURVEY §3): v_k^(1) = v₁ᵀᵀ(u₁ᵀu₀[:,k])."""
        from ..geometry.transport import transport_all

        cfg = self.cfg
        tap = TapPoint(op, block_idx)
        bases = {}
        xts = {}
        for idx in (sample_idx_0, sample_idx_1):
            xT = self.run_ddim_inversion(idx)
            xt = self.forward_to_edit_t(xT)
            xts[idx] = xt
            name = basis_name(cfg.dataset_name, idx, cfg.edit_t, op,
                              block_idx, cfg.seed, pca_rank=pca_rank) \
                + self._basis_name_extras(tap)
            cached = self.cache.load(name)
            if cached is None:
                res = self.compute_local_basis(
                    xt, self.fwd_grid.timesteps[self.edit_t_idx], tap, pca_rank
                )
                self.cache.save(name, res.u, res.s, res.vT)
                bases[idx] = (res.u, res.s, res.vT)
            else:
                bases[idx] = tuple(map(jnp.asarray, cached))

        u0 = bases[sample_idx_0][0]
        u1, _, vT1 = bases[sample_idx_1]
        u0 = u0 / jnp.linalg.norm(u0, axis=0, keepdims=True)
        u1 = u1 / jnp.linalg.norm(u1, axis=0, keepdims=True)
        vT1 = vT1 / jnp.linalg.norm(vT1, axis=1, keepdims=True)
        vt_trans = transport_all(u0, u1, vT1)       # (r, dim_x)

        shape = xts[sample_idx_1].shape[1:]
        vks, names = [], []
        for pc in range(vis_num_pc):
            for sign, tag in ((1.0, "pos"), (-1.0, "neg")):
                vks.append(sign * vt_trans[pc].reshape(shape))
                names.append(
                    f"Edit_transport-{cfg.dataset_name}_{sample_idx_0}to"
                    f"{sample_idx_1}-edit_{cfg.edit_t}T-{op}-block_{block_idx}"
                    f"-pc_{pc:03d}_{tag}"
                )
        return self._edit_along_directions(
            xts[sample_idx_1], vks, names, vis_num
        )

    def run_edit_local_pca_xt(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 8,
        num_samples: int = 1024,
        sigma: float = 0.1,
        vis_num: int = 4,
        vis_num_pc: int = 2,
    ):
        """Edit along local-PCA h-directions mapped to x via Jᵀ — the
        reference's local_pca + inverse-Jacobian flow (utils.py:900-975,
        diffusion.py:379-436) as a streaming sketch."""
        from ..geometry.pca import local_pca, pca_to_x_direction

        cfg = self.cfg
        tap = TapPoint(op, block_idx)
        xT = self.run_ddim_inversion(idx)
        xt = self.forward_to_edit_t(xT)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]

        run = self._jitted(
            f"local_pca_{tap}_{pca_rank}_{num_samples}_{sigma}",
            lambda p, z, tt, k: local_pca(
                lambda zz: self.model.apply(p, zz, tt, tap, method=type(self.model).encode),
                z, k, rank=pca_rank, num_samples=num_samples,
                chunk=min(32, num_samples), sigma=sigma,
            ),
        )
        t0 = time.perf_counter()
        pca = run(self.params, xt, t_edit, jax.random.key(cfg.seed))
        jax.block_until_ready(pca)
        self.log.log("local_pca", seconds=time.perf_counter() - t0,
                     top_var=np.asarray(pca.variances[:3]).round(5))

        to_x = self._jitted(
            f"pca_to_x_{tap}",
            lambda p, z, tt, comp: pca_to_x_direction(
                lambda zz: self.model.apply(p, zz, tt, tap, method=type(self.model).encode),
                z, comp,
            ),
        )
        shape = xt.shape[1:]
        vks, names = [], []
        for pc in range(vis_num_pc):
            v = to_x(self.params, xt, t_edit, pca.components[pc])
            for sign, tag in ((1.0, "pos"), (-1.0, "neg")):
                vks.append(sign * v.reshape(shape))
                names.append(
                    f"Edit_local_pca-{cfg.dataset_name}_{idx}-edit_{cfg.edit_t}T"
                    f"-{op}-block_{block_idx}-pc_{pc:03d}_{tag}"
                )
        return self._edit_along_directions(xt, vks, names, vis_num)

    def compute_local_decoder_basis(
        self, xt, t, tap: TapPoint, pca_rank: int = 50, x0_pullback: bool = False
    ):
        """Decoder pullback: top-k triplets of ∂ε/∂h (or of the Tweedie map
        ∂x̂₀/∂h with ``x0_pullback``) at the tapped feature — reference
        local_decoder_pullback_zt (utils.py:818-898) and
        local_x0_decoder_pullback_xt (diffusion.py:634-707)."""
        from ..ops.ddim import predict_x0
        from ..ops.schedule import alpha_bar

        run = self._jitted(
            f"dec_pullback_{tap}_{pca_rank}_{x0_pullback}",
            lambda p, z, tt, k: self._decoder_pullback_impl(
                p, z, tt, tap, pca_rank, x0_pullback, k
            ),
        )
        res = run(self.params, xt, t, jax.random.key(self.cfg.seed))
        jax.block_until_ready(res)
        return res

    def _decoder_pullback_impl(self, p, xt, t, tap, pca_rank, x0_pullback, key):
        from ..ops.ddim import predict_x0
        from ..ops.schedule import alpha_bar

        m_jvp, m_vjp = self._pullback_models()
        h, state = self.model.apply(
            p, xt, t, tap, method=type(self.model).encode_with_state
        )

        def decode_with(model):
            def decode_fn(hh):
                eps = model.apply(
                    p, hh, state, tap, method=type(model).decode_with_state
                )
                if x0_pullback:
                    return predict_x0(eps, xt, alpha_bar(self.schedule, t))
                return eps

            return decode_fn

        return local_pullback(
            decode_with(m_jvp), h, key, pca_rank=pca_rank,
            min_iter=self.cfg.pullback_min_iter,
            max_iter=self.cfg.pullback_max_iter,
            atol=self.cfg.pullback_atol,
            fn_vjp=decode_with(m_vjp) if m_vjp is not None else None,
        )

    def run_edit_local_decoder_pullback_xt(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 2,
        vis_num: Optional[int] = None,
        vis_num_pc: Optional[int] = None,
        x0_pullback: bool = False,
    ):
        """Decoder-pullback edit: top h-directions by *decoder* sensitivity
        (∂ε/∂h, or ∂x̂₀/∂h with ``x0_pullback``), pulled to x-space through
        the encoder Jᵀ, then the standard guidance edit. Completes the
        reference's declared-but-never-dispatched
        --run_edit_local_(x0_)decoder_pullback_zt flags
        (define_argparser.py:100-101; the basis math is utils.py:818-898 /
        diffusion.py:634-707)."""
        cfg = self.cfg
        vis_num = vis_num or cfg.vis_num
        vis_num_pc = vis_num_pc or cfg.vis_num_pc
        tap = TapPoint(op, block_idx)
        xT = self.run_ddim_inversion(idx)
        xt = self.forward_to_edit_t(xT)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]
        res = self.compute_local_decoder_basis(
            xt, t_edit, tap, pca_rank, x0_pullback
        )
        # decoder right-singular vectors live in h-space → (dim_h, k)
        tag = "local_dec_x0" if x0_pullback else "local_dec"
        return self._edit_with_global_h_basis(
            idx, res.vT.T, op, block_idx, vis_num, vis_num_pc, tag, xt=xt
        )

    def _harvest_bases(self, sample_indices, op, block_idx, pca_rank):
        """Pullback bases (cached) for a set of samples at edit_t. With a
        'dp' mesh axis the missing samples run as ONE jitted program
        (inversion + partial forward + pullback per instance) with the
        sample axis sharded across devices — the multi-sample half of the
        sweep parallelism (the prompt half lives in the SD driver);
        single-device falls back to the serial per-sample loop."""
        cfg = self.cfg
        tap = TapPoint(op, block_idx)
        names = {idx: basis_name(cfg.dataset_name, idx, cfg.edit_t, op,
                                 block_idx, cfg.seed, pca_rank=pca_rank)
                 + self._basis_name_extras(tap)
                 for idx in sample_indices}
        out = {}
        missing = []
        for idx in sample_indices:
            cached = self.cache.load(names[idx])
            if cached is None:
                missing.append(idx)
            else:
                out[idx] = tuple(map(jnp.asarray, cached))

        mesh = cfg.mesh
        dp = 0
        if mesh is not None and "dp" in mesh.axis_names \
                and mesh.shape["dp"] > 1 and len(missing) > 1:
            dp = mesh.shape["dp"]
        if dp:
            from jax.sharding import NamedSharding, PartitionSpec

            from ..samplers.ddim_loop import ddim_invert

            pad = (-len(missing)) % dp
            xs = jnp.concatenate(
                [jnp.asarray(self.dataset[i]) for i in missing]
                + [jnp.asarray(self.dataset[missing[-1]])] * pad
            )                                           # (M+pad, H, W, C)
            # same probe seed for every sample — the serial path passes
            # jax.random.key(seed) to each compute_local_basis, so parity
            # requires identical inits
            keys = jnp.broadcast_to(
                jax.random.key(cfg.seed), (xs.shape[0],)
            )

            def sweep(p, xb, ks):
                con = lambda a: jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, PartitionSpec("dp")))
                xb, ks = con(xb), con(ks)

                m_jvp, m_vjp = self._pullback_models()
                t_e = self.fwd_grid.timesteps[self.edit_t_idx]
                enc = lambda m: (lambda zz: m.apply(
                    p, zz, t_e, tap, method=type(m).encode))

                def one(x1, kk):
                    eps = self._eps_with(p)
                    xT = ddim_invert(eps, x1[None], self.schedule,
                                     self.inv_grid)
                    xt = ddim_forward(eps, xT, self.schedule, self.fwd_grid,
                                      end_idx=self.edit_t_idx)
                    return local_pullback(
                        enc(m_jvp),
                        xt, kk, pca_rank=pca_rank,
                        min_iter=cfg.pullback_min_iter,
                        max_iter=cfg.pullback_max_iter,
                        atol=cfg.pullback_atol,
                        chunk_size=cfg.pullback_chunk_size,
                        fn_vjp=enc(m_vjp) if m_vjp is not None else None,
                    )

                return jax.vmap(one)(xb, ks)

            run = self._jitted(
                f"sample_harvest_{tap}_{pca_rank}_{len(missing) + pad}"
                f"_dp{dp}", sweep,
            )
            t0 = time.perf_counter()
            res = run(self.params, xs, keys)
            jax.block_until_ready(res)
            self.log.log("sample_harvest_dp", num_samples=len(missing),
                         dp=dp, pad=pad,
                         seconds=time.perf_counter() - t0)
            for j, idx in enumerate(missing):
                triplet = (res.u[j], res.s[j], res.vT[j])
                self.cache.save(names[idx], *triplet)
                out[idx] = triplet
            return out

        for idx in missing:
            xT = self.run_ddim_inversion(idx)
            xt = self.forward_to_edit_t(xT)
            res = self.compute_local_basis(
                xt, self.fwd_grid.timesteps[self.edit_t_idx], tap, pca_rank
            )
            self.cache.save(names[idx], res.u, res.s, res.vT)
            out[idx] = (res.u, res.s, res.vT)
        return out

    def _edit_with_global_h_basis(self, idx, u_mean, op, block_idx,
                                  vis_num, vis_num_pc, tag, xt=None):
        """Map global h-directions to x at the target sample via Jᵀ and run
        the guidance edit. ``xt`` reuses a caller's already-inverted latent
        when available."""
        from ..geometry.pullback import pullback_covector

        cfg = self.cfg
        tap = TapPoint(op, block_idx)
        if xt is None:
            xT = self.run_ddim_inversion(idx)
            xt = self.forward_to_edit_t(xT)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]
        h_shape = jax.eval_shape(
            lambda z: self.model.apply(self.params, z, t_edit, tap,
                                       method=type(self.model).encode), xt
        ).shape

        inv = self._jitted(
            f"inv_jac_{tap}",
            lambda p, z, tt, u: pullback_covector(
                lambda zz: self.model.apply(p, zz, tt, tap,
                                            method=type(self.model).encode),
                z, u,
            ),
        )
        shape = xt.shape[1:]
        vks, names = [], []
        for pc in range(vis_num_pc):
            v = inv(self.params, xt, t_edit,
                    u_mean[:, pc].reshape(h_shape))
            v = v / jnp.linalg.norm(v)
            if cfg.use_sega_reg:
                from ..samplers.regularizers import sega_sparsify

                v = sega_sparsify(v, cfg.sega_reg_sigma)
            for sign, stag in ((1.0, "pos"), (-1.0, "neg")):
                vks.append(sign * v.reshape(shape))
                names.append(
                    f"Edit_{tag}-{cfg.dataset_name}_{idx}-edit_{cfg.edit_t}T"
                    f"-{op}-block_{block_idx}-pc_{pc:03d}_{stag}"
                )
        return self._edit_along_directions(xt, vks, names, vis_num)

    def run_edit_global_pca_xt(
        self,
        idx: int,
        num_samples: int = 16,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 2,
        vis_num: Optional[int] = None,
        vis_num_pc: Optional[int] = None,
        key=None,
    ):
        """Global-PCA edit (reference global_pca_zt, utils.py:978-1026, flag
        --run_edit_global_pca_zt declared but never dispatched): PCA the
        tapped h-features of a *population* of samples at edit_t — one jit
        computes forward-to-t + taps + PCA (the reference chunks batches
        through the GPU and PCAs on CPU) — then pull the mean directions to
        x-space at the target sample and run the guidance edit."""
        from ..geometry.pca import global_pca

        cfg = self.cfg
        vis_num = vis_num or cfg.vis_num
        vis_num_pc = vis_num_pc or cfg.vis_num_pc
        tap = TapPoint(op, block_idx)
        key = jax.random.key(cfg.seed) if key is None else key
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]
        size = self._sample_size

        def harvest(p, k):
            xT = jax.random.normal(
                k, (num_samples, size, size, 3), jnp.float32
            )
            xt = ddim_forward(
                self._eps_with(p), xT, self.schedule, self.fwd_grid,
                start_idx=0, end_idx=self.edit_t_idx,
            )
            h = self.model.apply(p, xt, t_edit, tap, method=type(self.model).encode)
            return global_pca(h, rank=pca_rank)

        run = self._jitted(f"global_pca_{tap}_{num_samples}_{pca_rank}",
                           harvest)
        t0 = time.perf_counter()
        res = run(self.params, key)
        jax.block_until_ready(res.components)
        self.log.log(
            "global_pca_harvest", num_samples=num_samples,
            seconds=time.perf_counter() - t0,
            top_var=np.asarray(res.variances[:3]).round(4),
        )
        # components are unit h-directions: (k, dim_h) → (dim_h, k)
        return self._edit_with_global_h_basis(
            idx, res.components.T, op, block_idx, vis_num, vis_num_pc,
            "global_pca",
        )

    def run_edit_global_frechet_mean_xt(
        self, idx, basis_indices, op="mid", block_idx=0, pca_rank=10,
        vis_num=4, vis_num_pc=2,
    ):
        """Frechet (Grassmannian) mean of h-space bases across samples, then
        edit ``idx`` along the global directions (working spec of
        edit.py:950-1245)."""
        from ..geometry.mean import frechet_mean_basis

        bases = self._harvest_bases(basis_indices, op, block_idx, pca_rank)
        us = [u / jnp.linalg.norm(u, axis=0, keepdims=True)
              for (u, _, _) in bases.values()]
        u_mean = frechet_mean_basis(us, rank=vis_num_pc)
        return self._edit_with_global_h_basis(
            idx, u_mean, op, block_idx, vis_num, vis_num_pc, "global_frechet"
        )

    def run_edit_global_hungarian_mean_xt(
        self, idx, basis_indices, op="mid", block_idx=0, pca_rank=10,
        vis_num=4, vis_num_pc=2,
    ):
        """Hungarian-matched mean basis (column identity preserved) — working
        spec of edit.py:1248-1463."""
        from ..geometry.mean import hungarian_mean_basis

        bases = self._harvest_bases(basis_indices, op, block_idx, pca_rank)
        us = [u / jnp.linalg.norm(u, axis=0, keepdims=True)
              for (u, _, _) in bases.values()]
        u_mean = hungarian_mean_basis(us, rank=vis_num_pc)
        return self._edit_with_global_h_basis(
            idx, u_mean, op, block_idx, vis_num, vis_num_pc, "global_hungarian"
        )

    # ---- tangent-space harvesting ----------------------------------------

    def run_sample_encoder_local_tangent_space_xt_batched(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 50,
        t_grid: Optional[Tuple[float, ...]] = None,
        sequential: Optional[bool] = None,
        fix_xt: bool = False,
        fix_t: bool = False,
        after_res: bool = False,
        after_sa: bool = False,
    ):
        """The throughput version of basis harvesting: ONE jitted program
        computes the whole timestep sweep — the forward trajectory is
        collected by the scan itself and the power iteration maps over the
        (timestep) axis (lax.map when ``sequential``, else vmap). This is the
        TPU-native replacement for the reference's outer Python sweep
        (main.py:78-91 × edit.py:1516-1599), where every t re-ran its own
        inversion + partial forward + chunked pullback.

        Ablations (reference edit.py:1571-1578): ``fix_xt`` evaluates every
        basis at the first grid point's latent while t varies (isolates the
        timestep-embedding direction of the metric); ``fix_t`` varies the
        latent along the trajectory but pins the network timestep (isolates
        the latent direction)."""
        from ..samplers.ddim_loop import ddim_scan

        cfg = self.cfg
        tap = self._make_tap(op, block_idx, after_res, after_sa)
        t_grid = t_grid or tuple(np.linspace(0.1, 1.0, 10).round(2))
        t_indices = tuple(
            int(jnp.argmin(jnp.abs(self.fwd_grid.timesteps - et * 1000.0)))
            for et in t_grid
        )
        suffix = ("-fix_xt" if fix_xt else "") + ("-fix_t" if fix_t else "") \
            + self._basis_name_extras(tap)
        names = [
            basis_name(cfg.dataset_name, idx, et, op, block_idx, cfg.seed,
                       pca_rank=pca_rank)
            + suffix
            for et in t_grid
        ]
        if all(self.cache.load(n) is not None for n in names):
            return {et: self.cache.path(n) for et, n in zip(t_grid, names)}

        # sweep-axis data parallelism (SURVEY §7 stage 8): when the mesh has
        # a 'dp' axis dividing the t-grid, the per-t pullbacks vmap with the
        # t-axis sharded across devices instead of lax.map'ing sequentially
        mesh = self.cfg.mesh
        dp = self._harvest_dp(len(t_grid), "harvest_dp_skip")
        if sequential is None:
            # auto dispatch (measured r3, docs/downtap_vmap_cliff.md):
            # single-device sweeps run lax.map — each pullback already
            # saturates the chip and XLA's batching of the vmapped
            # linearize/transpose + coupled while_loop costs 1.5-3x. The
            # dp-sharded path below vmaps (one instance per device, so the
            # batching penalty does not apply and the sweep scales).
            sequential = True
        if dp:
            sequential = False

        xT = self.run_ddim_inversion(idx)

        def sweep(p, x, key):
            eps = self._eps_with(p)
            # full forward trajectory in one scan; xt at grid index i is the
            # scan input of step i (trajectory[i-1], or xT for i=0)
            _, traj = ddim_scan(
                eps, x, self.schedule, self.fwd_grid.timesteps,
                self.fwd_grid.timesteps_next, collect_trajectory=True,
            )
            traj = jnp.concatenate([x[None], traj[:-1]], axis=0)
            xts = jnp.stack([traj[i] for i in t_indices])      # (k, 1, H, W, C)
            ts = jnp.stack([self.fwd_grid.timesteps[i] for i in t_indices])
            if fix_xt:
                xts = jnp.broadcast_to(xts[:1], xts.shape)
            if fix_t:
                ts = jnp.broadcast_to(ts[:1], ts.shape)
            keys = jax.random.split(key, len(t_indices))
            if dp:
                from jax.sharding import NamedSharding, PartitionSpec

                sh = NamedSharding(mesh, PartitionSpec("dp"))
                xts = jax.lax.with_sharding_constraint(xts, sh)
                ts = jax.lax.with_sharding_constraint(ts, sh)
                keys = jax.lax.with_sharding_constraint(keys, sh)

            m_jvp, m_vjp = self._pullback_models()
            enc = lambda m, tt: (lambda zz: m.apply(
                p, zz, tt, tap, method=type(m).encode))

            def pull_one(args):
                xt, tt, kk = args
                return local_pullback(
                    enc(m_jvp, tt),
                    xt, kk, pca_rank=pca_rank,
                    min_iter=self.cfg.pullback_min_iter,
                    max_iter=self.cfg.pullback_max_iter,
                    atol=self.cfg.pullback_atol,
                    chunk_size=self.cfg.pullback_chunk_size,
                    fn_vjp=enc(m_vjp, tt) if m_vjp is not None else None,
                )

            if sequential:
                return jax.lax.map(pull_one, (xts, ts, keys))
            return jax.vmap(lambda xt, tt, kk: pull_one((xt, tt, kk)))(
                xts, ts, keys
            )

        run = self._jitted(
            f"harvest_{tap}_{pca_rank}_{t_indices}_{sequential}_dp{dp}{suffix}",
            sweep,
        )
        t0 = time.perf_counter()
        res = run(self.params, xT, jax.random.key(cfg.seed))
        jax.block_until_ready(res)
        self.log.log(
            "tangent_harvest_batched",
            num_t=len(t_grid),
            seconds=time.perf_counter() - t0,
            per_basis=round((time.perf_counter() - t0) / len(t_grid), 4),
        )
        out = {}
        for i, (et, name) in enumerate(zip(t_grid, names)):
            out[et] = self.cache.save(
                name, np.asarray(res.u[i]), np.asarray(res.s[i]),
                np.asarray(res.vT[i]),
            )
        return out

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
            name = basis_name(cfg.dataset_name, idx, et, op, block_idx,
                              cfg.seed, pca_rank=pca_rank) \
                + self._basis_name_extras(tap)
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
