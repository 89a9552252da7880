"""SD tangent-space basis harvesting: the dataset-scale sweep surface.

Split out of experiments/edit_sd.py (VERDICT r3). `SDHarvestMixin` provides
the reference's throughput workload (`run_sample_encoder_local_tangent_space
_zt` and the prompt sweep, src/modules/edit.py:309-383 driven by
src/main.py:45-91): per (t, tap, prompt/sample) DDIM-invert → partial
forward → pullback → save (u, s, vT). Offers host-loop, fused and
mesh-sharded (dp) dispatch. Mixed into `EditStableDiffusion`.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import local_pullback
from ..models.unet2d import TapPoint
from .cache import basis_name


class SDHarvestMixin:
    def run_sample_encoder_local_tangent_space_zt_batched(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 50,
        t_grid=None,
        sequential: Optional[bool] = None,
        after_res: bool = False,
        after_sa: bool = False,
    ):
        """One-jit harvest over the timestep grid (SD flavour of the uncond
        batched sweep): trajectory collected by the inversion-side scan, the
        per-t pullbacks mapped via lax.map/vmap — replaces the reference's
        outer Python loops (main.py:61-76 EDIT_T × prompts grid)."""
        import numpy as _np

        from ..samplers.ddim_loop import ddim_scan

        cfg = self.cfg
        tap = self._make_tap(op, block_idx, after_res, after_sa)
        t_grid = t_grid or tuple(_np.linspace(0.1, 1.0, 10).round(2))
        t_indices = tuple(
            int(jnp.argmin(jnp.abs(self.fwd_grid.timesteps - et * 1000.0)))
            for et in t_grid
        )
        suffix = self._basis_name_extras(tap)
        names = [
            basis_name(cfg.dataset_name, idx, et, op, block_idx, cfg.seed,
                       edit_prompt=cfg.edit_prompt, pca_rank=pca_rank) + suffix
            for et in t_grid
        ]
        if all(self.cache.load(n) is not None for n in names):
            return {et: self.cache.path(n) for et, n in zip(t_grid, names)}

        if cfg.loop_impl == "host":
            # cold-compile mitigation (TODO r1: the fused sweep traces the
            # whole trajectory + every pullback into one program, >20 min
            # cold at SD scale): walk the trajectory with the single
            # compiled host step and reuse ONE pullback program across the
            # grid — t enters compute_local_basis as a traced argument, so
            # the total is 3 compiles (invert step, forward step, pullback)
            zT = self.run_DDIMinversion(idx)
            order = sorted(zip(t_grid, t_indices, names), key=lambda x: x[1])
            z, cur = zT, 0
            out = {}
            t0 = time.perf_counter()
            for et, ti, name in order:
                if ti > cur:
                    z = self.DDIMforwardsteps(z, cur, ti)
                    cur = ti
                if self.cache.load(name) is not None:
                    out[et] = self.cache.path(name)
                    continue
                res = self.compute_local_basis(
                    z, self.fwd_grid.timesteps[ti], tap, pca_rank
                )
                out[et] = self.cache.save(
                    name, np.asarray(res.u), np.asarray(res.s),
                    np.asarray(res.vT),
                )
            self.log.log(
                "sd_tangent_harvest_host", num_t=len(t_grid),
                seconds=time.perf_counter() - t0,
            )
            return out

        # sweep-axis data parallelism: a 'dp' mesh axis dividing the t-grid
        # shards the per-t pullbacks across devices (vmap + constraint)
        mesh = self.cfg.mesh
        dp = self._harvest_dp(len(t_grid), "sd_harvest_dp_skip")
        if sequential is None:
            # auto dispatch — docs/downtap_vmap_cliff.md: lax.map on a
            # single device (vmap-over-instances costs 1.5-3x; it only pays
            # when a dp mesh axis places one instance per device)
            sequential = True
        if dp:
            sequential = False

        zT = self.run_DDIMinversion(idx)

        # the fused sweep must differentiate the SAME encoder
        # compute_local_basis does (fused-pair attention, CFG wrap) so the
        # stored bases are loop_impl-independent
        enc, enc_vjp, impl = self._pullback_tap_encoders(tap)
        if cfg.pullback_guidance_scale > 0:
            enc = self._cfg_encoder(enc)
            enc_vjp = self._cfg_encoder(enc_vjp) if enc_vjp is not None else None
            pull_emb = (self.edit_prompt_emb, self.neg_prompt_emb)
        else:
            pull_emb = self.edit_prompt_emb

        def sweep(p, fe, ne, ee, z, key):
            eps = self.eps_with(p, fe, ne)
            _, traj = ddim_scan(
                eps, z, self.schedule, self.fwd_grid.timesteps,
                self.fwd_grid.timesteps_next, collect_trajectory=True,
            )
            traj = jnp.concatenate([z[None], traj[:-1]], axis=0)
            zts = jnp.stack([traj[i] for i in t_indices])
            ts = jnp.stack([self.fwd_grid.timesteps[i] for i in t_indices])
            keys = jax.random.split(key, len(t_indices))
            if dp:
                from jax.sharding import NamedSharding, PartitionSpec

                sh = NamedSharding(mesh, PartitionSpec("dp"))
                zts = jax.lax.with_sharding_constraint(zts, sh)
                ts = jax.lax.with_sharding_constraint(ts, sh)
                keys = jax.lax.with_sharding_constraint(keys, sh)

            def pull_one(args):
                zt, tt, kk = args
                return local_pullback(
                    lambda q: enc(p, q, tt, ee),
                    zt, kk, pca_rank=pca_rank,
                    min_iter=self.cfg.pullback_min_iter,
                    max_iter=self.cfg.pullback_max_iter,
                    atol=self.cfg.pullback_atol,
                    chunk_size=self.cfg.pullback_chunk_size,
                    remat=self.cfg.pullback_remat,
                    fn_vjp=(
                        (lambda q: enc_vjp(p, q, tt, ee))
                        if enc_vjp is not None else None
                    ),
                )

            if sequential:
                return jax.lax.map(pull_one, (zts, ts, keys))
            return jax.vmap(lambda a, b, c: pull_one((a, b, c)))(zts, ts, keys)

        run = self._jitted(
            f"sd_harvest_{tap}_{pca_rank}_{t_indices}_{sequential}"
            f"_dp{dp}_{impl}{suffix}", sweep
        )
        t0 = time.perf_counter()
        res = run(self.unet_params, self.for_prompt_emb, self.neg_prompt_emb,
                  pull_emb, zT, jax.random.key(cfg.seed))
        jax.block_until_ready(res)
        self.log.log(
            "sd_tangent_harvest_batched",
            num_t=len(t_grid),
            seconds=time.perf_counter() - t0,
        )
        out = {}
        for i, (et, name) in enumerate(zip(t_grid, names)):
            out[et] = self.cache.save(
                name, np.asarray(res.u[i]), np.asarray(res.s[i]),
                np.asarray(res.vT[i]),
            )
        return out

    def run_sample_encoder_local_tangent_space_zt_various_prompt(
        self,
        prompts,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: Optional[int] = None,
        h_t: Optional[float] = None,
        sequential: Optional[bool] = None,
    ):
        """Prompt-axis harvest: the reference's 50-MS-COCO-prompt sweep
        (/root/reference/src/main.py:45-91) as ONE jitted program — the
        inversion/partial forward run once (prompt-independent), the prompt
        embeddings are precomputed host-side and stacked as an array axis,
        and the per-prompt pullbacks map over that axis. With a 'dp' mesh
        axis the prompt axis is sharded across devices (the natural v5e-8
        workload); the prompt count is padded up to a dp multiple so every
        chunk is one program. Cache keys match the per-prompt edit path, so
        `--run_edit_..._with_various_prompt` edits afterwards hit the cache.
        """
        from jax.sharding import NamedSharding, PartitionSpec

        cfg = self.cfg
        tap = TapPoint(op, block_idx)
        pca_rank = pca_rank or cfg.pca_rank
        h_t = cfg.edit_t if h_t is None else h_t
        names = [
            basis_name(cfg.dataset_name, idx, h_t, op, block_idx, cfg.seed,
                       edit_prompt=pr, pca_rank=pca_rank)
            + self._basis_name_extras(tap)
            for pr in prompts
        ]
        todo = [i for i, n in enumerate(names)
                if self.cache.load(n) is None]
        if not todo:
            return {p: self.cache.path(n) for p, n in zip(prompts, names)}

        t_idx = int(jnp.argmin(jnp.abs(self.fwd_grid.timesteps
                                       - h_t * 1000.0)))
        zT = self.run_DDIMinversion(idx)
        zt = self.DDIMforwardsteps(zT, 0, t_idx) if t_idx > 0 else zT
        t_edit = self.fwd_grid.timesteps[t_idx]

        enc, enc_vjp, impl = self._pullback_tap_encoders(tap)
        cfg_wrap = cfg.pullback_guidance_scale > 0
        if cfg_wrap:
            enc = self._cfg_encoder(enc)
            enc_vjp = self._cfg_encoder(enc_vjp) if enc_vjp is not None \
                else None
        embs = []
        for i in todo:
            e = self._get_emb(prompts[i])
            embs.append((e, self.neg_prompt_emb) if cfg_wrap else e)

        mesh = cfg.mesh
        dp = 0
        if mesh is not None and "dp" in mesh.axis_names \
                and mesh.shape["dp"] > 1:
            dp = mesh.shape["dp"]
        if sequential is None:
            sequential = True   # docs/downtap_vmap_cliff.md (dp path vmaps)
        pad = (-len(todo)) % dp if dp else 0
        embs = embs + embs[-1:] * pad
        emb_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *embs)
        # same probe seed for every prompt — the serial per-prompt path
        # passes jax.random.key(seed) to each compute_local_basis, so the
        # cache entries this sweep fills must come from identical inits
        # (the uncond _harvest_bases twin broadcasts for the same reason)
        keys = jnp.broadcast_to(jax.random.key(cfg.seed), (len(embs),))

        def sweep(p, z, tt, emb_axis, ks):
            def pull_one(ee, kk):
                return local_pullback(
                    lambda q: enc(p, q, tt, ee),
                    z, kk, pca_rank=pca_rank,
                    min_iter=cfg.pullback_min_iter,
                    max_iter=cfg.pullback_max_iter,
                    atol=cfg.pullback_atol,
                    chunk_size=cfg.pullback_chunk_size,
                    remat=cfg.pullback_remat,
                    fn_vjp=((lambda q: enc_vjp(p, q, tt, ee))
                            if enc_vjp is not None else None),
                )

            if dp:
                con = lambda a: jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, PartitionSpec("dp")))
                emb_axis = jax.tree.map(con, emb_axis)
                ks = con(ks)
                return jax.vmap(pull_one)(emb_axis, ks)
            if sequential:
                return jax.lax.map(lambda ab: pull_one(*ab), (emb_axis, ks))
            return jax.vmap(pull_one)(emb_axis, ks)

        run = self._jitted(
            f"sd_prompt_sweep_{tap}_{pca_rank}_{len(embs)}_dp{dp}"
            f"_{sequential}_{impl}", sweep,
        )
        t0 = time.perf_counter()
        res = run(self.unet_params, zt, t_edit, emb_stack, keys)
        jax.block_until_ready(res)
        self.log.log(
            "sd_prompt_sweep", num_prompts=len(todo), dp=dp, pad=pad,
            seconds=time.perf_counter() - t0,
        )
        for j, i in enumerate(todo):  # padded tail rows are discarded
            self.cache.save(
                names[i], np.asarray(res.u[j]), np.asarray(res.s[j]),
                np.asarray(res.vT[j]),
            )
        return {p: self.cache.path(n) for p, n in zip(prompts, names)}

    def run_sample_encoder_local_tangent_space_zt(
        self, idx: int, op="mid", block_idx=0, pca_rank=50, h_t=1.0,
        edit_prompt: Optional[str] = None,
    ):
        """Basis harvesting at one (t, prompt) point (edit.py:309-383)."""
        cfg = self.cfg
        tap = TapPoint(op, block_idx)
        if edit_prompt is not None:
            self.edit_prompt_emb = self._get_emb(edit_prompt)
            cfg.edit_prompt = edit_prompt
        name = basis_name(
            cfg.dataset_name, idx, h_t, op, block_idx, cfg.seed,
            edit_prompt=cfg.edit_prompt, pca_rank=pca_rank,
        )
        if self.cache.load(name) is not None:
            return self.cache.path(name)
        t_idx = int(jnp.argmin(jnp.abs(self.fwd_grid.timesteps - h_t * 1000.0)))
        zT = self.run_DDIMinversion(idx)
        zt = self.DDIMforwardsteps(zT, 0, t_idx) if t_idx > 0 else zT
        res = self.compute_local_basis(
            zt, self.fwd_grid.timesteps[t_idx], tap, pca_rank
        )
        return self.cache.save(name, res.u, res.s, res.vT)
