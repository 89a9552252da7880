"""SD PCA editing surface: local/global/text PCA experiment methods.

Split out of experiments/edit_sd.py (VERDICT r3: keep the driver monolith
from absorbing every new surface). `SDPCAMixin` provides the PCA-basis
experiments of the reference (`local_pca_zt` src/utils/utils.py:900-975,
`global_pca_zt` :978-1026, the deprecated text-space PCA :1029-1115) plus
the shared h-basis → latent-direction edit path (inverse-Jacobian trick,
utils.py:1117-1160). Mixed into `EditStableDiffusion`; methods use the
driver's tap encoders, caches and edit tail.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet2d import TapPoint
from ..samplers.ddim_loop import ddim_forward


class SDPCAMixin:
    def _edit_with_global_h_basis(self, idx, u_mean, op, block_idx,
                                  vis_num, vis_num_pc, tag, zt=None):
        """Map h-space directions to latent space at the target sample via
        Jᵀ of the edit-prompt-conditioned encoder (the reference's
        inverse-Jacobian trick, utils.py:1117-1160) and run the guidance
        edit. ``zt`` reuses a caller's already-inverted latent (the decoder
        pullback computes it anyway — skipping ~inv_steps U-Net evals)."""
        from ..geometry.pullback import pullback_covector

        cfg = self.cfg
        tap = TapPoint(op, block_idx)
        if zt is None:
            zT = self.run_DDIMinversion(idx)
            zt = self.DDIMforwardsteps(zT, 0, self.edit_t_idx)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]
        h_shape = jax.eval_shape(
            lambda z: self._tap_encode(
                self.unet_params, z, t_edit, self.edit_prompt_emb, tap
            ),
            zt,
        ).shape

        inv = self._jitted(
            f"sd_inv_jac_{tap}",
            lambda p, emb, z, tt, u: pullback_covector(
                lambda zz: self._tap_encode(p, zz, tt, emb, tap), z, u
            ),
        )
        shape = zt.shape[1:]
        vks, names = [], []
        for pc in range(vis_num_pc):
            v = inv(self.unet_params, self.edit_prompt_emb, zt, t_edit,
                    u_mean[:, pc].reshape(h_shape))
            v = v / jnp.linalg.norm(v)
            for sign, stag in ((1.0, "pos"), (-1.0, "neg")):
                vks.append(sign * v.reshape(shape))
                names.append(
                    f"Edit_{tag}-{cfg.dataset_name}_{idx}-edit_{cfg.edit_t}T"
                    f"-{op}-block_{block_idx}-pc_{pc:03d}_{stag}"
                    f"-edit_prompt_{cfg.edit_prompt}"
                )
        return self._edit_along_directions(zt, vks, names, vis_num)

    def run_edit_local_pca_zt(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 8,
        num_samples: int = 1024,
        sigma: float = 0.1,
        vis_num: Optional[int] = None,
        vis_num_pc: Optional[int] = None,
        edit_prompt: Optional[str] = None,
    ):
        """Edit along local-PCA h-directions mapped to latent space via Jᵀ —
        the reference's local_pca_zt on the SD U-Net (utils.py:900-975:
        50k perturbed-h samples through pca_lowrank, CPU-staged) as a
        streaming on-device sketch."""
        from ..geometry.pca import local_pca, pca_to_x_direction

        cfg = self.cfg
        if edit_prompt is not None:
            cfg.edit_prompt = edit_prompt
            self.edit_prompt_emb = self._get_emb(edit_prompt)
        vis_num = vis_num or cfg.vis_num
        vis_num_pc = vis_num_pc or cfg.vis_num_pc
        tap = TapPoint(op, block_idx)
        zT = self.run_DDIMinversion(idx)
        zt = self.DDIMforwardsteps(zT, 0, self.edit_t_idx)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]

        run = self._jitted(
            f"sd_local_pca_{tap}_{pca_rank}_{num_samples}_{sigma}",
            lambda p, emb, z, tt, k: local_pca(
                lambda zz: self._tap_encode(p, zz, tt, emb, tap),
                z, k, rank=pca_rank, num_samples=num_samples,
                chunk=min(16, num_samples), sigma=sigma,
            ),
        )
        t0 = time.perf_counter()
        pca = run(self.unet_params, self.edit_prompt_emb, zt, t_edit,
                  jax.random.key(cfg.seed))
        jax.block_until_ready(pca)
        self.log.log("sd_local_pca", seconds=time.perf_counter() - t0,
                     top_var=np.asarray(pca.variances[:3]).round(5))

        to_x = self._jitted(
            f"sd_pca_to_x_{tap}",
            lambda p, emb, z, tt, comp: pca_to_x_direction(
                lambda zz: self._tap_encode(p, zz, tt, emb, tap), z, comp
            ),
        )
        shape = zt.shape[1:]
        vks, names = [], []
        for pc in range(vis_num_pc):
            v = to_x(self.unet_params, self.edit_prompt_emb, zt, t_edit,
                     pca.components[pc])
            for sign, tag in ((1.0, "pos"), (-1.0, "neg")):
                vks.append(sign * v.reshape(shape))
                names.append(
                    f"Edit_local_pca-{cfg.dataset_name}_{idx}"
                    f"-edit_{cfg.edit_t}T-{op}-block_{block_idx}"
                    f"-pc_{pc:03d}_{tag}-edit_prompt_{cfg.edit_prompt}"
                )
        return self._edit_along_directions(zt, vks, names, vis_num)

    def run_local_pca_text(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 8,
        num_samples: int = 512,
        perturb_h: float = 1e-1,
        edit_prompt: Optional[str] = None,
    ):
        """Text-space PCA — working spec of the reference's DEPRECATED
        local_pca_text (utils.py:1029-1101; its global_pca_text body is
        literally `pass`, so only the local variant has defined behavior).
        PCA of the tapped h over unit-normalized Gaussian perturbations of
        the prompt EMBEDDING, then each principal h-direction is pulled back
        to text-embedding space via the norm-jacobian trick
        (∇_emb ‖(h+δu_k) − h(emb)‖ ∝ −Jᵀu_k, utils.py:1089-1095; the exact
        VJP formulation makes the reference's ``perturb_h`` residual scale
        cancel — the flag is accepted for signature parity only). Returns
        the cache path of (u, s, vT_text); the reference never consumes
        these downstream — strict symbol-completeness port."""
        from ..geometry.pca import local_pca
        from ..geometry.pullback import pullback_covector

        cfg = self.cfg
        if edit_prompt is not None:
            cfg.edit_prompt = edit_prompt
            self.edit_prompt_emb = self._get_emb(edit_prompt)
        if not isinstance(self.edit_prompt_emb, jax.Array):
            raise NotImplementedError(
                "text-space PCA perturbs a single context embedding; the "
                "reference defines it only for the SD (single-tower) family")
        tap = TapPoint(op, block_idx)
        name = (
            f"local_pca_text-{cfg.dataset_name}_{idx}-edit_{cfg.edit_t}T"
            f"-{op}-block_{block_idx}-rank_{pca_rank}-seed_{cfg.seed}"
            f"-prompt_{(cfg.edit_prompt or 'none').replace(' ', '_')[:40]}"
        )
        if self.cache.load(name) is not None:
            return self.cache.path(name)

        zT = self.run_DDIMinversion(idx)
        zt = self.DDIMforwardsteps(zT, 0, self.edit_t_idx)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]

        def text_pca(p, emb, z, tt, k):
            # fn over the prompt embedding, latent held fixed — the dual of
            # run_edit_local_pca_zt's latent perturbations
            fn = lambda e: self._tap_encode(p, z, tt, e, tap)
            pca = local_pca(
                fn, emb, k, rank=pca_rank, num_samples=num_samples,
                chunk=min(16, num_samples), sigma=1.0, unit_delta=True,
            )
            h_shape = jax.eval_shape(fn, emb).shape

            def to_text(comp):
                v = pullback_covector(fn, emb, comp.reshape(h_shape))
                return (v / jnp.maximum(jnp.linalg.norm(v), 1e-12)).ravel()

            vT_text = jax.lax.map(to_text, pca.components)
            return pca.components, pca.variances, vT_text

        run = self._jitted(
            f"sd_text_pca_{tap}_{pca_rank}_{num_samples}", text_pca
        )
        t0 = time.perf_counter()
        u_h, var, vT_text = run(self.unet_params, self.edit_prompt_emb, zt,
                                t_edit, jax.random.key(cfg.seed))
        jax.block_until_ready(vT_text)
        self.log.log(
            "sd_local_pca_text", seconds=time.perf_counter() - t0,
            top_var=np.asarray(var[:3]).round(6),
        )
        # cache convention: u columns in h-space, s, vT rows in text space
        return self.cache.save(
            name, np.asarray(u_h).T, np.asarray(np.sqrt(np.maximum(var, 0))),
            np.asarray(vT_text),
        )

    def run_edit_global_pca_zt(
        self,
        idx: int,
        num_samples: int = 16,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 2,
        vis_num: Optional[int] = None,
        vis_num_pc: Optional[int] = None,
        key=None,
        edit_prompt: Optional[str] = None,
    ):
        """Global-PCA edit on the SD driver (reference global_pca_zt bound to
        the SD U-Net, utils.py:978-1026): PCA the tapped h-features of a
        population of sampled latents at edit_t in one jit, then pull the
        principal h-directions to latent space at the target sample and run
        the guidance edit."""
        from ..geometry.pca import global_pca

        cfg = self.cfg
        if edit_prompt is not None:
            cfg.edit_prompt = edit_prompt
            self.edit_prompt_emb = self._get_emb(edit_prompt)
        vis_num = vis_num or cfg.vis_num
        vis_num_pc = vis_num_pc or cfg.vis_num_pc
        tap = TapPoint(op, block_idx)
        key = jax.random.key(cfg.seed) if key is None else key
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]
        s = self.unet.config.sample_size
        c = self.unet.config.in_channels

        def harvest(p, fe, ne, ee, k):
            zT = jax.random.normal(k, (num_samples, s, s, c), jnp.float32)
            zt = ddim_forward(
                self.eps_with(p, fe, ne), zT, self.schedule, self.fwd_grid,
                start_idx=0, end_idx=self.edit_t_idx,
            )
            h = self._tap_encode(p, zt, t_edit, ee, tap)
            return global_pca(h, rank=pca_rank)

        run = self._jitted(
            f"sd_global_pca_{tap}_{num_samples}_{pca_rank}", harvest
        )
        t0 = time.perf_counter()
        res = run(self.unet_params, self.for_prompt_emb, self.neg_prompt_emb,
                  self.edit_prompt_emb, key)
        jax.block_until_ready(res.components)
        self.log.log(
            "sd_global_pca_harvest", num_samples=num_samples,
            seconds=time.perf_counter() - t0,
            top_var=np.asarray(res.variances[:3]).round(4),
        )
        # components are unit h-directions: (k, dim_h) → (dim_h, k)
        return self._edit_with_global_h_basis(
            idx, res.components.T, op, block_idx, vis_num, vis_num_pc,
            "global_pca",
        )
