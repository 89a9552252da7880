"""Stable-Diffusion editing experiments (latent-space pullback).

TPU-native counterpart of the reference's `EditStableDiffusion`
(/root/reference/src/modules/edit.py:31-535): prompt embedding via the CLIP
text tower, VAE encode → DDIM inversion → partial forward → latent pullback
at a U-Net tap → x-space-guidance editing (edit-prompt conditioned) → finish
sampling → VAE decode. CFG evaluates [neg; for] as one 2·B batch inside the
same jit (the reference's memory_bound chunking disappears — the batch is
just an array axis).

Pullback conditioning matches the reference: the encoder Jacobian is taken
with the *edit prompt* embedding (edit.py:236-239 passes edit_prompt_emb),
and each guidance micro-step conditions both rows on the edit prompt
(edit.py:493-496).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import local_pullback
from ..models.clip_text import CLIPTextModel, load_tokenizer
from ..models.unet2d import TapPoint
from ..models.unet2d_condition import UNet2DCondition
from ..models.vae import AutoencoderKL
from ..ops.schedule import DiffusionSchedule, ddim_timestep_grid
from ..samplers.ddim_loop import (
    ddim_forward,
    ddim_invert,
    ddim_scan,
    make_ddim_step_fn,
)
from ..samplers.guidance import (
    x_space_guidance_scan,
    x_space_guidance_scan_deepcache,
)
from ..utils.images import save_image_grid
from ..utils.logging import JSONLLogger
from ._common import DriverCommonMixin
from .sd_harvest import SDHarvestMixin
from .sd_pca import SDPCAMixin
from .cache import BasisCache, basis_name


@dataclasses.dataclass
class SDExperimentConfig:
    dataset_name: str = "Examples"
    for_steps: int = 100
    inv_steps: int = 100
    edit_t: float = 0.7
    seed: int = 0
    guidance_scale: float = 0.0        # scripts run CFG off (SURVEY §3 landmine)
    for_prompt: str = ""
    neg_prompt: str = ""
    inv_prompt: str = ""
    edit_prompt: str = ""
    x_space_guidance_edit_step: float = 1.0
    x_space_guidance_scale: float = 1.0
    x_space_guidance_num_step: int = 16
    pca_rank: int = 2
    # 'scan' fuses whole trajectories into one XLA program; 'host' re-uses a
    # single compiled step per timestep (fast compile for SD/SDXL-size nets);
    # 'chunk' re-uses a fused `loop_chunk`-step scan per dispatch — host-loop
    # compile economics with the per-step dispatch/RTT overhead amortized
    # chunk×, while each program stays far below the ≳40-step fused size
    # that faults a single chip at SDXL-1024 (r3 measurement, TODO.md)
    loop_impl: str = "scan"
    loop_chunk: int = 8
    # AOT program export (utils/aot.py): 'auto' serializes traced programs
    # on single-device accelerator runs so later processes skip re-tracing;
    # 'on'/'off' force. Keyed by program name + arg avals + code salt.
    aot_export: str = "auto"
    pullback_min_iter: int = 10
    pullback_max_iter: int = 50
    pullback_atol: float = 1e-4
    pullback_chunk_size: Optional[int] = None
    pullback_remat: bool = False
    # attention impl for the differentiated encoder ('' = the model's own;
    # 'flash' = fused custom_jvp/custom_vjp kernel pair; 'xla'/'blockwise')
    pullback_attn_impl: str = ""
    # CFG inside the JVP'd encoder (BASELINE config 4 — the reference's CFG
    # pullback path crashes, edit.py:399, so this is the working spec):
    # >0 differentiates h = h_edit + s·(h_edit − h_neg) as one fused 2·B
    # batch; 0 (default) differentiates the edit-prompt encoder alone
    pullback_guidance_scale: float = 0.0
    # post-edit latent regularizers (working specs of the reference's
    # undefined hooks — see samplers/regularizers.py)
    use_dynamic_thresholding: bool = False
    dynamic_thresholding_q: float = 0.8
    use_preserve_contrast: bool = False
    use_preserve_norm: bool = False
    # device mesh (jax.sharding.Mesh) — 'probe' axis shards the power
    # iteration, 'dp' shards sweep axes; None = single device
    mesh: Optional[object] = None
    # decode at most this many latents per device program (None = all at
    # once) — SDXL decodes 1024px frames; chunking bounds VAE activations
    decode_chunk: Optional[int] = None
    # DeepCache encoder reuse on the finish sampling of the edit tail
    # (samplers/deepcache.py): refresh the deep U-Net path every N steps,
    # recompute only conv_in + first down block + last up block + head in
    # between. 0/1 = exact full model every step. Cuts the SDXL-1024 CLI
    # edit tail (16 guidance micro-steps + 100-step finish ×4 directions).
    edit_deepcache_interval: int = 0
    # DeepCache on the x-space-guidance micro-walk itself (the dominant cost
    # of the with-prompt edit: num_step full 2·B U-Net pairs at ONE fixed
    # timestep, where deep features drift even more slowly than across
    # sampling steps). Refresh the deep path every N micro-steps; 0/1 =
    # exact full pair every micro-step.
    guidance_deepcache_interval: int = 0
    # vmap the (pc, ±) direction axis of the edit tail (one fused program,
    # batch = directions × vis frames). At SDXL-1024 scale that batch OOMs
    # one chip (measured r3: RESOURCE_EXHAUSTED at 4×5 frames), so the SDXL
    # builder sets False → lax.map runs directions sequentially with the
    # same jitted body
    edit_vmap_directions: bool = True
    # run_edit_text_driven_direction: 0 = single JᵀΔh direction; k>0 =
    # decompose Δh in the top-k pullback basis (JᵀΔh ≈ Σ s_k⟨u_k,Δh⟩v_k)
    # and walk each PC separately, signed toward Δh
    text_driven_num_pc: int = 0
    result_folder: str = "./runs/sd"
    obs_folder: str = "./runs/sd/obs"
    basis_folder: str = "./inputs/local_encoder_pullback_stable_diffusion"
    vis_num: int = 4
    vis_num_pc: int = 2


class EditStableDiffusion(DriverCommonMixin, SDPCAMixin, SDHarvestMixin):
    @property
    def _arch_config(self):
        return self.unet.config

    def __init__(
        self,
        unet: UNet2DCondition,
        unet_params,
        vae: AutoencoderKL,
        vae_params,
        text_model: CLIPTextModel,
        text_params,
        schedule: DiffusionSchedule,
        dataset,
        config: SDExperimentConfig,
        tokenizer=None,
        logger: Optional[JSONLLogger] = None,
    ):
        self.unet, self.unet_params = unet, unet_params
        self.vae, self.vae_params = vae, vae_params
        self.text_model, self.text_params = text_model, text_params
        self.schedule = schedule
        self.dataset = dataset
        self.cfg = config
        self.tokenizer = tokenizer or load_tokenizer(text_model.config)
        self.log = logger or JSONLLogger(
            os.path.join(config.result_folder, "log.jsonl")
        )
        self.cache = BasisCache(config.basis_folder)

        self.fwd_grid = ddim_timestep_grid(config.for_steps)
        self.inv_grid = ddim_timestep_grid(config.inv_steps, inversion=True)
        self.edit_t_idx = int(
            jnp.argmin(jnp.abs(self.fwd_grid.timesteps - config.edit_t * 1000.0))
        )

        # prompt embeddings: for / neg / null / inv / edit (edit.py:65-75)
        t0 = time.perf_counter()
        self.for_prompt_emb = self._get_emb(config.for_prompt)
        self.neg_prompt_emb = self._get_emb(config.neg_prompt)
        self.null_prompt_emb = self._get_emb("")
        self.inv_prompt_emb = self._get_emb(config.inv_prompt)
        self.edit_prompt_emb = self._get_emb(config.edit_prompt)
        jax.block_until_ready(self.edit_prompt_emb)
        self.log.log("sd_prompts_embedded", seconds=time.perf_counter() - t0)

        self._jit_cache = {}

        # place weights on the configured mesh once: the U-Net (the
        # memory/compute-dominant tree) gets the tensor-parallel layout when
        # the mesh has a 'tp' axis; the VAE stays replicated
        self.unet_params = self._place_weights(self.unet_params)
        if config.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self.vae_params = jax.device_put(
                self.vae_params, NamedSharding(config.mesh, PartitionSpec()))

    # ---- prompt / tap hooks (overridden by the SDXL driver) ----------------

    def _get_emb(self, prompt: str):
        """Prompt → context embedding pytree (jit takes text params as an
        argument — closing over CLIP weights bakes them into the HLO)."""
        if not hasattr(self, "_embed_jit"):
            self._embed_jit = jax.jit(
                lambda tp, ids: self.text_model.apply(tp, ids)
            )
        return self._embed_jit(
            self.text_params, jnp.asarray(self.tokenizer([prompt]))
        )

    def _tap_encode(self, params, z, t, prompt_emb, tap: TapPoint, unet=None):
        """U-Net feature-tap encoder h = f(z) the pullback differentiates."""
        return (unet or self.unet).apply(
            params, z, t, prompt_emb, tap, method=UNet2DCondition.encode
        )

    def _unet_variant(self, attn_impl: str):
        """Same weights, different attention kernels (the param tree is
        impl-independent)."""
        key = f"_unet_variant_{attn_impl}"
        if key not in self._jit_cache:
            self._jit_cache[key] = type(self.unet)(
                dataclasses.replace(self.unet.config, attn_impl=attn_impl)
            )
        return self._jit_cache[key]

    def _pullback_tap_encoders(self, tap: TapPoint):
        """(encode, encode_vjp_or_None, impl_tag) for the pullback.

        'flash' (or the model itself running flash) maps to the fused-kernel
        PAIR: the tangent half differentiates the custom_jvp kernel
        (attn_impl='flash_jvp'), the cotangent half runs jax.vjp through the
        custom_vjp kernel — the resolution of the reference's xformers-off
        constraint (utils.py:322-323) at SD/SDXL sequence lengths."""
        impl = getattr(self.cfg, "pullback_attn_impl", "") \
            or self.unet.config.attn_impl
        if impl in ("flash", "flash_jvp"):
            u_jvp = self._unet_variant("flash_jvp")
            u_vjp = self._unet_variant("flash")
            mk = lambda u: (
                lambda p, zz, tt, emb: self._tap_encode(p, zz, tt, emb, tap,
                                                        unet=u)
            )
            return mk(u_jvp), mk(u_vjp), "flashpair"
        if impl == "ring":
            # ring's accelerator inner (fused LSE kernel) is primal-only;
            # the differentiated encoder needs the XLA inner, which jvp/vjp
            # both traverse (shard_map + ppermute + scan are AD-native)
            impl = "ring_xla"
        if impl != self.unet.config.attn_impl:
            u = self._unet_variant(impl)
            return (
                lambda p, zz, tt, emb: self._tap_encode(p, zz, tt, emb, tap,
                                                        unet=u)
            ), None, impl
        return (
            lambda p, zz, tt, emb: self._tap_encode(p, zz, tt, emb, tap)
        ), None, impl

    def _tap_encode_with_state(self, params, z, t, prompt_emb, tap: TapPoint,
                               unet=None):
        """(h, resume-state) at the tap — reference get_h + the skip stack
        (utils.py:438-635)."""
        return (unet or self.unet).apply(
            params, z, t, prompt_emb, tap,
            method=UNet2DCondition.encode_with_state,
        )

    def _tap_decode_with_state(self, params, h, state, tap: TapPoint,
                               unet=None):
        """Resume the U-Net from a (possibly perturbed) tapped h → ε
        (reference get_h_to_e, utils.py:529-635)."""
        return (unet or self.unet).apply(
            params, h, state, tap, method=UNet2DCondition.decode_with_state
        )

    # ---- eps functions ----------------------------------------------------

    def eps_with(self, params, prompt_emb, cfg_neg_emb=None):
        """ε(z, t) closure over *traced* params/prompt embeddings; with
        ``cfg_neg_emb`` applies classifier-free guidance via a fused 2·B
        batch (reference edit.py:446-463). Params/embeddings must be passed
        through jit arguments — closing over concrete weights would bake
        them into the HLO as literals."""
        scale = self.cfg.guidance_scale

        if cfg_neg_emb is None or scale <= 1.0:
            def fn(z, t):
                return self.unet.apply(params, z, t, prompt_emb)
            return fn

        def fn(z, t):
            b = z.shape[0]
            zz = jnp.concatenate([z, z], axis=0)
            ctx = jnp.concatenate(
                [
                    jnp.broadcast_to(cfg_neg_emb, (b,) + cfg_neg_emb.shape[1:]),
                    jnp.broadcast_to(prompt_emb, (b,) + prompt_emb.shape[1:]),
                ],
                axis=0,
            )
            eps = self.unet.apply(params, zz, t, ctx)
            e_un, e_c = jnp.split(eps, 2, axis=0)
            return e_un + scale * (e_c - e_un)

        return fn

    # ---- pipelines --------------------------------------------------------

    def encode_image(self, idx: int, sample_key=None) -> jax.Array:
        x0 = jnp.asarray(self.dataset[idx])
        enc = self._jitted(
            "vae_encode",
            lambda p, x: self.vae.apply(p, x, method=AutoencoderKL.encode),
        )
        return enc(self.vae_params, x0)

    def _host_step(self):
        return self._jitted(
            "host_step",
            lambda p, emb, z, t, tn: make_ddim_step_fn(
                self.eps_with(p, emb), self.schedule
            )(z, t, tn),
        )

    def _chunk_traverse(self, tag, eps_builder, embs, z, ts, tns):
        """loop_impl='chunk': host loop over fused ``loop_chunk``-step
        lax.scan programs. Timesteps enter as traced arrays, so at most two
        program lengths compile per tag (the chunk and the remainder) and
        every same-length chunk re-uses one program; dispatch/RTT overhead
        amortizes chunk× vs the per-step host loop while each compiled
        program stays a short fixed-size scan. ``eps_builder(p, embs)``
        returns the ε closure for the traversal's conditioning."""
        chunk = max(1, self.cfg.loop_chunk)
        n, i = len(ts), 0
        while i < n:
            ln = min(chunk, n - i)
            fn = self._jitted(
                f"{tag}_chunk{ln}_b{z.shape[0]}",
                lambda p, e, zz, tt, ttn: ddim_scan(
                    eps_builder(p, e), zz, self.schedule, tt, ttn
                )[0],
            )
            z = fn(self.unet_params, embs, z,
                   jnp.asarray(ts[i:i + ln]), jnp.asarray(tns[i:i + ln]))
            i += ln
        return z

    def run_DDIMinversion(self, idx: int) -> jax.Array:
        """image → z0 (VAE, ×scaling) → zT (edit.py:112-183)."""
        z0 = self.encode_image(idx)
        jax.block_until_ready(z0)
        self.log.log("sd_vae_encoded", idx=idx)
        t0 = time.perf_counter()
        if self.cfg.loop_impl == "host":
            step = self._host_step()
            zT = z0
            # skip the final pair — the reference inversion loop breaks
            # before its last timestep entry (edit.py:153-154); see
            # samplers/ddim_loop.ddim_invert
            for i, (t, tn) in enumerate(zip(self.inv_grid.timesteps[:-1],
                                            self.inv_grid.timesteps_next[:-1])):
                zT = step(self.unet_params, self.inv_prompt_emb, zT, t, tn)
                if i == 0:
                    zT.block_until_ready()
                    self.log.log("sd_host_step_compiled",
                                 seconds=time.perf_counter() - t0)
        elif self.cfg.loop_impl == "chunk":
            zT = self._chunk_traverse(
                "inv", lambda p, e: self.eps_with(p, e),
                self.inv_prompt_emb, z0,
                self.inv_grid.timesteps[:-1],
                self.inv_grid.timesteps_next[:-1],
            )
        else:
            invert = self._jitted(
                "invert",
                lambda p, emb, z: ddim_invert(
                    self.eps_with(p, emb), z, self.schedule, self.inv_grid
                ),
            )
            zT = invert(self.unet_params, self.inv_prompt_emb, z0)
        zT.block_until_ready()
        self.log.log("sd_ddim_inversion", idx=idx, seconds=time.perf_counter() - t0)
        return zT

    def DDIMforwardsteps(self, zt, t_start_idx, t_end_idx=None):
        if self.cfg.loop_impl == "host":
            end = self.fwd_grid.num_steps if t_end_idx is None else t_end_idx
            step = self._jitted(
                f"host_fwd_step_{zt.shape[0]}",
                lambda p, fe, ne, z, t, tn: make_ddim_step_fn(
                    self.eps_with(p, fe, ne), self.schedule
                )(z, t, tn),
            )
            for i in range(t_start_idx, end):
                zt = step(self.unet_params, self.for_prompt_emb,
                          self.neg_prompt_emb, zt,
                          self.fwd_grid.timesteps[i],
                          self.fwd_grid.timesteps_next[i])
            return zt
        if self.cfg.loop_impl == "chunk":
            end = self.fwd_grid.num_steps if t_end_idx is None else t_end_idx
            return self._chunk_traverse(
                "fwd", lambda p, e: self.eps_with(p, e[0], e[1]),
                (self.for_prompt_emb, self.neg_prompt_emb), zt,
                self.fwd_grid.timesteps[t_start_idx:end],
                self.fwd_grid.timesteps_next[t_start_idx:end],
            )
        key = (t_start_idx, t_end_idx, zt.shape[0])
        fn = self._jitted(
            f"fwd_{key}",
            lambda p, fe, ne, z: ddim_forward(
                self.eps_with(p, fe, ne), z, self.schedule, self.fwd_grid,
                start_idx=t_start_idx, end_idx=t_end_idx,
            ),
        )
        return fn(self.unet_params, self.for_prompt_emb, self.neg_prompt_emb, zt)

    def decode_latents(self, z) -> np.ndarray:
        chunk = self.cfg.decode_chunk or z.shape[0]
        dec = self._jitted(
            f"vae_decode_{min(chunk, z.shape[0])}",
            lambda p, zz: self.vae.apply(p, zz, method=AutoencoderKL.decode),
        )
        if chunk >= z.shape[0]:
            return np.asarray(dec(self.vae_params, z))
        outs = [
            np.asarray(dec(self.vae_params, z[i:i + chunk]))
            for i in range(0, z.shape[0] - z.shape[0] % chunk, chunk)
        ]
        rem = z.shape[0] % chunk
        if rem:
            outs.append(np.asarray(dec(self.vae_params, z[-chunk:]))[-rem:])
        return np.concatenate(outs, axis=0)

    def run_DDIMforward(self, num_samples=5, save_as=None):
        s = self.unet.config.sample_size
        c = self.unet.config.in_channels
        zT = jax.random.normal(
            jax.random.key(self.cfg.seed), (num_samples, s, s, c), jnp.float32
        )
        z0 = self.DDIMforwardsteps(zT, 0)
        x0 = self.decode_latents(z0)
        if save_as:
            save_image_grid(x0, save_as)
        return x0

    def _basis_name_extras(self, tap: TapPoint) -> str:
        """Cache-key qualifiers beyond basis_name: intra-block tap position
        and the CFG-inside-JVP scale — both change the differentiated map,
        so bases computed under them must not shadow plain ones."""
        s = f"-after_{tap.inner[0]}{tap.inner[1]}" if tap.inner else ""
        if self.cfg.pullback_guidance_scale > 0:
            s += f"-cfg{self.cfg.pullback_guidance_scale}"
        return s

    def _cfg_encoder(self, enc):
        """Wrap a tap encoder so the differentiated map is the CFG
        extrapolation h_edit + s·(h_edit − h_neg), evaluated as one fused
        2·B batch (prompt rows stacked, same discipline as eps_with). The
        wrapped encoder takes embs = (edit_emb, neg_emb)."""
        s = self.cfg.pullback_guidance_scale

        def f(p, zz, tt, embs):
            edit_emb, neg_emb = embs
            b = zz.shape[0]
            cat = lambda a, c: jnp.concatenate([
                jnp.broadcast_to(a, (b,) + a.shape[1:]),
                jnp.broadcast_to(c, (b,) + c.shape[1:]),
            ], axis=0)
            emb2 = jax.tree.map(cat, edit_emb, neg_emb)
            h2 = enc(p, jnp.concatenate([zz, zz], axis=0), tt, emb2)
            return (1.0 + s) * h2[:b] - s * h2[b:]

        return f

    def compute_local_basis(self, zt, t, tap: TapPoint, pca_rank: int):
        enc, enc_vjp, impl = self._pullback_tap_encoders(tap)
        if self.cfg.pullback_guidance_scale > 0:
            enc = self._cfg_encoder(enc)
            enc_vjp = self._cfg_encoder(enc_vjp) if enc_vjp is not None else None
            impl = f"{impl}_cfg{self.cfg.pullback_guidance_scale}"
            emb_arg = (self.edit_prompt_emb, self.neg_prompt_emb)
        else:
            emb_arg = self.edit_prompt_emb
        n_probe = self._mesh_probe_size(pca_rank)
        if n_probe:
            from ..parallel import make_sharded_pullback

            runner = self._cached(
                f"pullback_{tap}_{pca_rank}_probe{n_probe}_{impl}",
                lambda: make_sharded_pullback(
                    lambda zz, p, tt, emb: enc(p, zz, tt, emb),
                    self.cfg.mesh,
                    pca_rank=pca_rank,
                    min_iter=self.cfg.pullback_min_iter,
                    max_iter=self.cfg.pullback_max_iter,
                    atol=self.cfg.pullback_atol,
                    remat=self.cfg.pullback_remat,
                    fn_vjp=(
                        (lambda zz, p, tt, emb: enc_vjp(p, zz, tt, emb))
                        if enc_vjp is not None else None
                    ),
                ),
            )
            run = lambda p, emb, z, tt, k: runner(z, k, p, tt, emb)
        else:
            run = self._jitted(
                f"pullback_{tap}_{pca_rank}_{impl}",
                lambda p, emb, z, tt, k: local_pullback(
                    lambda zz: enc(p, zz, tt, emb),
                    z, k,
                    pca_rank=pca_rank,
                    min_iter=self.cfg.pullback_min_iter,
                    max_iter=self.cfg.pullback_max_iter,
                    atol=self.cfg.pullback_atol,
                    chunk_size=self.cfg.pullback_chunk_size,
                    remat=self.cfg.pullback_remat,
                    fn_vjp=(
                        (lambda zz: enc_vjp(p, zz, tt, emb))
                        if enc_vjp is not None else None
                    ),
                ),
            )
        t0 = time.perf_counter()
        res = run(self.unet_params, emb_arg, zt, t,
                  jax.random.key(self.cfg.seed))
        jax.block_until_ready(res)
        self.log.log(
            "sd_local_pullback",
            seconds=time.perf_counter() - t0,
            iterations=int(res.iterations),
            probe_shards=n_probe or 1,
            encoder=impl,
            top_s=np.asarray(res.s[:3]).round(4),
        )
        return res

    def run_edit_local_encoder_pullback_zt(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: Optional[int] = None,
        vis_num: Optional[int] = None,
        vis_num_pc: Optional[int] = None,
        edit_prompt: Optional[str] = None,
        edit_t: Optional[float] = None,
        after_res: bool = False,
        after_sa: bool = False,
    ):
        """Headline SD experiment (edit.py:185-307)."""
        cfg = self.cfg
        if edit_prompt is not None:
            cfg.edit_prompt = edit_prompt
            self.edit_prompt_emb = self._get_emb(edit_prompt)
        pca_rank = pca_rank or cfg.pca_rank
        vis_num = vis_num or cfg.vis_num
        vis_num_pc = vis_num_pc or cfg.vis_num_pc
        tap = self._make_tap(op, block_idx, after_res, after_sa)

        zT = self.run_DDIMinversion(idx)
        zt = self.DDIMforwardsteps(zT, 0, self.edit_t_idx)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]
        shape_hint = tuple(zt.shape[1:])

        u, s, vT = self._cached_local_basis(
            zt, t_edit, tap, pca_rank, idx, op, block_idx, shape_hint
        )

        shape = zt.shape[1:]
        vks, names = [], []
        for pc in range(vis_num_pc):
            for sign, tag in ((1.0, "pos"), (-1.0, "neg")):
                vks.append(sign * vT[pc].reshape(shape))
                names.append(
                    f"Edit_zt-{cfg.dataset_name}_{idx}-edit_{cfg.edit_t}T-{op}"
                    f"-block_{block_idx}-pc_{pc:03d}_{tag}"
                    f"-edit_prompt_{cfg.edit_prompt}"
                )
        return self._edit_along_directions(zt, vks, names, vis_num)

    def _cached_local_basis(self, zt, t_edit, tap, pca_rank, idx, op,
                            block_idx, shape_hint):
        """Load-or-compute the (u, s, vT) pullback basis with the
        reference-keyed cache + analysis artifacts (edit.py:223-263);
        factors are returned column/row-normalized (edit.py:267-268)."""
        cfg = self.cfg
        name = basis_name(
            cfg.dataset_name, idx, cfg.edit_t, op, block_idx, cfg.seed,
            edit_prompt=cfg.edit_prompt, pca_rank=pca_rank,
        ) + self._basis_name_extras(tap)
        cached = self.cache.load(name)
        if cached is not None:
            u, s, vT = map(jnp.asarray, cached)
            self.log.log("basis_cache_hit", name=name)
        else:
            res = self.compute_local_basis(zt, t_edit, tap, pca_rank)
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

        u = u / jnp.linalg.norm(u, axis=0, keepdims=True)
        vT = vT / jnp.linalg.norm(vT, axis=1, keepdims=True)
        return u, s, vT

    def run_edit_text_driven_direction(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        vis_num: Optional[int] = None,
        num_pc: Optional[int] = None,
    ):
        """Working spec for the reference's declared-but-never-dispatched
        --run_edit_text_driven_direction flag (define_argparser.py:124; no
        implementation exists anywhere in the reference).

        The text-driven x-space direction is the pullback of the tapped
        feature displacement the edit prompt induces:

            Δh = h(z_t | edit_prompt) − h(z_t | null_prompt)
            v  = Jᵀ Δh / ‖Jᵀ Δh‖        (one VJP — the reference's
                                         inv_jac_zt trick, utils.py:1117-1160)

        then the standard ±v x-space-guidance walks and trajectory finish.

        With ``num_pc`` = k > 0 (or cfg.text_driven_num_pc) the displacement
        is instead decomposed in the top-k pullback basis at the tap:
        JᵀΔh ≈ Σ_k s_k·c_k·v_k with c_k = ⟨u_k, Δh⟩, and each PC is walked
        separately along sign(c_k)·v_k — "which geometric directions does
        this prompt move", per component, with the subspace-residual energy
        logged so off-basis prompts are visible."""
        from ..geometry.pullback import pullback_covector

        cfg = self.cfg
        vis_num = vis_num or cfg.vis_num
        num_pc = cfg.text_driven_num_pc if num_pc is None else num_pc
        tap = TapPoint(op, block_idx)

        zT = self.run_DDIMinversion(idx)
        zt = self.DDIMforwardsteps(zT, 0, self.edit_t_idx)
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]
        ptag = (cfg.edit_prompt or "none").replace(" ", "_")[:40]
        shape = zt.shape[1:]

        if num_pc > 0:
            u, s, vT = self._cached_local_basis(
                zt, t_edit, tap, num_pc, idx, op, block_idx, tuple(shape)
            )

            def coeffs(p, ee, ne, z, tt, basis_u):
                dh = self._tap_encode(p, z, tt, ee, tap) - \
                    self._tap_encode(p, z, tt, ne, tap)
                dh = dh.reshape(-1)
                return basis_u.T @ dh, jnp.vdot(dh, dh)

            run = self._jitted(f"text_direction_pc_{tap}_{num_pc}", coeffs)
            c, energy = run(self.unet_params, self.edit_prompt_emb,
                            self.null_prompt_emb, zt, t_edit, u)
            c = np.asarray(c)
            captured = float(np.sum(c**2) / max(float(energy), 1e-12))
            self.log.log(
                "text_driven_pc_decomposition",
                coefficients=c.round(5), singular_values=np.asarray(
                    s[:num_pc]).round(4),
                subspace_energy_fraction=round(captured, 5),
            )
            vks, names = [], []
            # walk PCs in coefficient-magnitude order — the prompt's
            # strongest geometric component first
            for pc in np.argsort(-np.abs(c)):
                sign = 1.0 if c[pc] >= 0 else -1.0
                vks.append(sign * vT[pc].reshape(shape))
                names.append(
                    f"Edit_text_driven-{cfg.dataset_name}_{idx}"
                    f"-edit_{cfg.edit_t}T-{op}-block_{block_idx}"
                    f"-prompt_{ptag}-pc_{int(pc):03d}"
                    f"_c{c[pc]:+.3f}"
                )
            return self._edit_along_directions(zt, vks, names, vis_num)

        def direction(p, ee, ne, z, tt):
            dh = self._tap_encode(p, z, tt, ee, tap) - \
                self._tap_encode(p, z, tt, ne, tap)
            v = pullback_covector(
                lambda q: self._tap_encode(p, q, tt, ee, tap), z, dh
            )
            return v / jnp.linalg.norm(v)

        run = self._jitted(f"text_direction_{tap}", direction)
        t0 = time.perf_counter()
        v = run(self.unet_params, self.edit_prompt_emb, self.null_prompt_emb,
                zt, t_edit)
        jax.block_until_ready(v)
        self.log.log("text_driven_direction", seconds=time.perf_counter() - t0)

        vks, names = [], []
        for sign, stag in ((1.0, "pos"), (-1.0, "neg")):
            vks.append(sign * v.reshape(shape))
            names.append(
                f"Edit_text_driven-{cfg.dataset_name}_{idx}"
                f"-edit_{cfg.edit_t}T-{op}-block_{block_idx}"
                f"-prompt_{ptag}"
                f"_{stag}"
            )
        return self._edit_along_directions(zt, vks, names, vis_num)

    def _guidance_walk(self, p, ee, z_start, vk, t_edit):
        """x-space-guidance micro-walk (reference edit.py:484-502), fused
        as one lax.scan. With ``guidance_deepcache_interval`` > 1 the deep
        U-Net path of the [z; z+δv] pair is cached and refreshed every N
        micro-steps (exact at interval 1) — built on the same tap hooks as
        the sampling-time DeepCache, so SDXL inherits it unchanged."""
        cfg = self.cfg
        itv = cfg.guidance_deepcache_interval
        if itv <= 1:
            return x_space_guidance_scan(
                self.eps_with(p, ee), z_start, t_edit, vk[None],
                num_steps=cfg.x_space_guidance_num_step,
                edit_step=cfg.x_space_guidance_edit_step,
                scale=cfg.x_space_guidance_scale,
                pair_impl=getattr(cfg, "xsg_pair_impl", "batch"),
            )
        tap = TapPoint("up", len(self.unet.config.up_block_types) - 2)

        def full_fn(pair, t):
            h, state = self._tap_encode_with_state(p, pair, t, ee, tap)
            return self._tap_decode_from(p, h, state, tap), h

        def reuse_fn(pair, t, h):
            shallow = self._shallow_encode(p, pair, t, ee)
            return self._tap_decode_from(p, h, shallow, tap)

        return x_space_guidance_scan_deepcache(
            full_fn, reuse_fn, z_start, t_edit, vk[None],
            num_steps=cfg.x_space_guidance_num_step,
            edit_step=cfg.x_space_guidance_edit_step,
            scale=cfg.x_space_guidance_scale,
            interval=itv,
        )

    def _edit_along_directions(self, zt, vks, names, vis_num):
        """Shared tail of the SD editing experiments: vmapped x-space-guidance
        walks (edit-prompt conditioned, edit.py:484-502) over the direction
        batch, finish sampling, VAE decode, PNG grids with skip-if-exists
        idempotency."""
        cfg = self.cfg
        t_edit = self.fwd_grid.timesteps[self.edit_t_idx]
        todo = [i for i, n in enumerate(names) if not os.path.exists(
            os.path.join(cfg.result_folder, n + ".png"))]
        if not todo:
            self.log.log("all_edits_cached")
            return names
        vk_batch = jnp.stack([vks[i] for i in todo])

        stride = max(1, (cfg.x_space_guidance_num_step + 1) // vis_num)

        def apply_regularizers(sel, z_start):
            # post-edit regularizers (uncond tail applies the same set) —
            # one definition shared by the fused and host branches so the
            # flag set / ordering can never diverge between them
            from ..samplers.regularizers import (
                dynamic_thresholding, preserve_contrast, preserve_norm,
            )

            if cfg.use_dynamic_thresholding:
                sel = dynamic_thresholding(sel, cfg.dynamic_thresholding_q)
            if cfg.use_preserve_contrast:
                sel = preserve_contrast(sel, z_start)
            if cfg.use_preserve_norm:
                sel = preserve_norm(sel, z_start)
            return sel

        def edit_one(p, ee, fe, ne, z_start, vk):
            traj = self._guidance_walk(p, ee, z_start, vk, t_edit)
            sel = apply_regularizers(traj[::stride, 0], z_start)
            return self._finish_forward(p, sel, fe, ne)

        t0 = time.perf_counter()
        if cfg.loop_impl in ("host", "chunk"):
            # SDXL-scale memory/runtime mode: one short jitted program for
            # the guidance walk per direction, then the finish dispatched
            # per step — or per loop_chunk-step scan under 'chunk' — (fused
            # ≳40-step 1024px programs fail on one chip — measured r3:
            # device UNAVAILABLE/RESOURCE_EXHAUSTED)
            def guide_one(p, ee, z_start, vk):
                traj = self._guidance_walk(p, ee, z_start, vk, t_edit)
                return apply_regularizers(traj[::stride, 0], z_start)

            if cfg.edit_vmap_directions and len(todo) > 1:
                # batch the direction axis: ONE vmapped guidance-scan program
                # (U-Net batch = directions instead of 1) and ONE host finish
                # over the flattened (direction × frame) batch — 4× fewer
                # dispatches and full MXU tiles vs the serial per-direction
                # loop. SDXL-1024 keeps the serial path (the direction-
                # batched programs RESOURCE_EXHAUST one chip; main.py sets
                # edit_vmap_directions=False there).
                guide = self._jitted(
                    f"sd_guidance_scan_{stride}_b{len(todo)}"
                    f"_gdc{cfg.guidance_deepcache_interval}",
                    jax.vmap(guide_one, in_axes=(None, None, None, 0)),
                )
                sels = guide(self.unet_params, self.edit_prompt_emb, zt,
                             vk_batch)
                d, v = sels.shape[:2]
                flat = sels.reshape((d * v,) + sels.shape[2:])
                z0s = self._finish_forward_host(flat)
                z0s = z0s.reshape((d, v) + z0s.shape[1:])
            else:
                guide = self._jitted(
                    f"sd_guidance_scan_{stride}"
                    f"_gdc{cfg.guidance_deepcache_interval}",
                    guide_one,
                )
                z0s = []
                for j in range(len(todo)):
                    sel = guide(self.unet_params, self.edit_prompt_emb, zt,
                                vk_batch[j])
                    z0s.append(self._finish_forward_host(sel))
                z0s = jnp.stack(z0s)
        else:
            if cfg.edit_vmap_directions:
                mapper = lambda f, vs: jax.vmap(f)(vs)
            else:
                mapper = lambda f, vs: jax.lax.map(f, vs)
            run_all = self._jitted(
                f"sd_edit_batch_{len(todo)}_{stride}"
                f"_dc{cfg.edit_deepcache_interval}"
                f"_gdc{cfg.guidance_deepcache_interval}"
                f"_vm{cfg.edit_vmap_directions}",
                lambda p, ee, fe, ne, z_start, vs: mapper(
                    lambda vk: edit_one(p, ee, fe, ne, z_start, vk), vs
                ),
            )
            z0s = run_all(self.unet_params, self.edit_prompt_emb,
                          self.for_prompt_emb, self.neg_prompt_emb, zt,
                          vk_batch)
        z0s.block_until_ready()
        self.log.log(
            "sd_x_space_guidance_edit",
            directions=len(todo),
            seconds=time.perf_counter() - t0,
        )

        for j, i in enumerate(todo):
            imgs = self.decode_latents(z0s[j])
            save_image_grid(
                imgs, os.path.join(cfg.result_folder, names[i] + ".png")
            )
        return names

    def _shallow_encode(self, p, z, t, prompt_emb):
        """conv_in + first down block (DeepCache's cheap per-step slice)."""
        return self.unet.apply(
            p, z, t, prompt_emb, method=UNet2DCondition.shallow_encode
        )

    def _tap_decode_from(self, p, h, state, tap):
        return self.unet.apply(
            p, h, state, tap, method=UNet2DCondition.decode_with_state
        )

    def _finish_forward_host(self, sel):
        """Host-dispatched finish for the edit tail: one compiled STEP
        program re-dispatched per timestep — SDXL-1024 fused multi-step
        finish programs fail on one chip (r3 measured: UNAVAILABLE /
        RESOURCE_EXHAUSTED past ~40 fused steps), and per-step dispatch
        costs only ms. With ``edit_deepcache_interval`` > 1, two step
        programs alternate: a full refresh (encode to the ('up', n-2) tap +
        decode) every N steps and a shallow-reuse step in between. Under
        loop_impl='chunk' the same alternation runs as fused
        ``loop_chunk``-step scans with the deep-feature cache carried
        between chunks (absolute step indices keep the refresh phase
        chunk-boundary independent). CFG > 1 falls back to the plain
        (eps_with) steps."""
        from ..ops.ddim import ddim_step
        from ..ops.schedule import alpha_bar

        cfg = self.cfg
        itv = cfg.edit_deepcache_interval
        cfg_on = cfg.guidance_scale > 1.0
        if itv <= 1 or cfg_on:
            if itv > 1 and cfg_on:
                self.log.log("deepcache_host_cfg_fallback")
            return self.DDIMforwardsteps(sel, self.edit_t_idx)

        n_up = len(self.unet.config.up_block_types)
        tap = TapPoint("up", n_up - 2)

        def full_step(p, emb, z, t, tn):
            h, state = self._tap_encode_with_state(p, z, t, emb, tap)
            eps = self._tap_decode_from(p, h, state, tap)
            out = ddim_step(eps, z, alpha_bar(self.schedule, t),
                            alpha_bar(self.schedule, tn))
            return out.prev_sample, h

        def reuse_step(p, emb, z, h, t, tn):
            shallow = self._shallow_encode(p, z, t, emb)
            eps = self._tap_decode_from(p, h, shallow, tap)
            out = ddim_step(eps, z, alpha_bar(self.schedule, t),
                            alpha_bar(self.schedule, tn))
            return out.prev_sample

        ts = self.fwd_grid.timesteps[self.edit_t_idx:]
        tns = self.fwd_grid.timesteps_next[self.edit_t_idx:]

        if cfg.loop_impl == "chunk":
            def chunk_prog(p, emb, z, h, tt, ttn, ii):
                def body(carry, inp):
                    zc, hc = carry
                    t, tn, i = inp
                    eps, h_new = jax.lax.cond(
                        i % itv == 0,
                        lambda _: (lambda pair: (
                            self._tap_decode_from(p, pair[0], pair[1], tap),
                            pair[0],
                        ))(self._tap_encode_with_state(p, zc, t, emb, tap)),
                        lambda _: (
                            self._tap_decode_from(
                                p, hc, self._shallow_encode(p, zc, t, emb),
                                tap,
                            ),
                            hc,
                        ),
                        None,
                    )
                    out = ddim_step(eps, zc, alpha_bar(self.schedule, t),
                                    alpha_bar(self.schedule, tn))
                    return (out.prev_sample, h_new), None

                (zf, hf), _ = jax.lax.scan(body, (z, h), (tt, ttn, ii))
                return zf, hf

            h_shape = jax.eval_shape(
                lambda z, t: self._tap_encode_with_state(
                    self.unet_params, z, t, self.for_prompt_emb, tap
                )[0],
                sel, jnp.float32(0.0),
            )
            z = sel
            h = jnp.zeros(h_shape.shape, h_shape.dtype)
            idx = np.arange(len(ts))  # absolute: i==0 hits the full branch
            chunk = max(1, cfg.loop_chunk)
            i = 0
            while i < len(ts):
                ln = min(chunk, len(ts) - i)
                fn = self._jitted(
                    f"dc_chunk{ln}_b{sel.shape[0]}_itv{itv}", chunk_prog
                )
                z, h = fn(self.unet_params, self.for_prompt_emb, z, h,
                          jnp.asarray(ts[i:i + ln]),
                          jnp.asarray(tns[i:i + ln]),
                          jnp.asarray(idx[i:i + ln]))
                i += ln
            return z

        full = self._jitted(f"dc_host_full_{sel.shape[0]}", full_step)
        reuse = self._jitted(f"dc_host_reuse_{sel.shape[0]}", reuse_step)
        z, h = sel, None
        for i, (t, tn) in enumerate(zip(ts, tns)):
            if i % itv == 0:
                z, h = full(self.unet_params, self.for_prompt_emb, z, t, tn)
            else:
                z = reuse(self.unet_params, self.for_prompt_emb, z, h, t, tn)
        return z

    def _finish_forward(self, p, sel, for_emb, neg_emb):
        """Finish sampling of the edit tail (edit_t → 0, reference
        edit.py:305-307). With ``edit_deepcache_interval`` > 1 the deep
        U-Net path is refreshed every N steps and only the shallow slice
        recomputes in between (samplers/deepcache.py) — interval 1 is
        bit-exact with the plain path."""
        itv = self.cfg.edit_deepcache_interval
        if itv <= 1:
            return ddim_forward(
                self.eps_with(p, for_emb, neg_emb), sel, self.schedule,
                self.fwd_grid, start_idx=self.edit_t_idx,
            )
        from ..samplers.deepcache import ddim_forward_deepcache_cond

        cfg_on = neg_emb is not None and self.cfg.guidance_scale > 1.0
        return ddim_forward_deepcache_cond(
            self.unet, p, sel, for_emb, self.schedule, self.fwd_grid,
            interval=itv, start_idx=self.edit_t_idx,
            neg_context=neg_emb if cfg_on else None,
            guidance_scale=self.cfg.guidance_scale if cfg_on else 0.0,
        )

    # ---- decoder pullback / PCA edits (SD flavour) --------------------------

    def compute_local_decoder_basis(
        self, zt, t, tap: TapPoint, pca_rank: int, x0_pullback: bool = False
    ):
        """Top-k triplets of ∂ε/∂h (or of the Tweedie map ∂ẑ₀/∂h with
        ``x0_pullback``) at the tapped SD U-Net feature — reference
        local_decoder_pullback_zt bound to the SD model
        (/root/reference/src/utils/utils.py:818-898)."""
        run = self._jitted(
            f"sd_dec_pullback_{tap}_{pca_rank}_{x0_pullback}",
            lambda p, emb, z, tt, k: self._decoder_pullback_impl(
                p, emb, z, tt, tap, pca_rank, x0_pullback, k
            ),
        )
        t0 = time.perf_counter()
        res = run(self.unet_params, self.edit_prompt_emb, zt, t,
                  jax.random.key(self.cfg.seed))
        jax.block_until_ready(res)
        self.log.log(
            "sd_decoder_pullback",
            seconds=time.perf_counter() - t0,
            iterations=int(res.iterations),
            top_s=np.asarray(res.s[:3]).round(4),
        )
        return res

    def _decoder_pullback_unets(self):
        """(unet_jvp, unet_vjp_or_None) for the decode-side pullback — the
        same impl-selection discipline as _pullback_tap_encoders: a flash
        model (or --pullback_attn_impl flash) maps to the fused-kernel PAIR
        because the custom_vjp primal cannot be jax.linearize'd."""
        impl = getattr(self.cfg, "pullback_attn_impl", "") \
            or self.unet.config.attn_impl
        if impl in ("flash", "flash_jvp"):
            return self._unet_variant("flash_jvp"), self._unet_variant("flash")
        if impl == "ring":
            impl = "ring_xla"  # differentiated path needs the XLA inner
        if impl != self.unet.config.attn_impl:
            return self._unet_variant(impl), None
        return self.unet, None

    def _decoder_pullback_impl(self, p, emb, zt, t, tap, pca_rank,
                               x0_pullback, key):
        from ..ops.ddim import predict_x0
        from ..ops.schedule import alpha_bar

        u_jvp, u_vjp = self._decoder_pullback_unets()
        h, state = self._tap_encode_with_state(p, zt, t, emb, tap)

        def decode_with(unet):
            def decode_fn(hh):
                eps = self._tap_decode_with_state(p, hh, state, tap,
                                                  unet=unet)
                if x0_pullback:
                    return predict_x0(eps, zt, alpha_bar(self.schedule, t))
                return eps

            return decode_fn

        return local_pullback(
            decode_with(u_jvp), h, key, pca_rank=pca_rank,
            min_iter=self.cfg.pullback_min_iter,
            max_iter=self.cfg.pullback_max_iter,
            atol=self.cfg.pullback_atol,
            remat=self.cfg.pullback_remat,
            fn_vjp=decode_with(u_vjp) if u_vjp is not None else None,
        )

    def run_edit_local_decoder_pullback_zt(
        self,
        idx: int,
        op: str = "mid",
        block_idx: int = 0,
        pca_rank: int = 2,
        vis_num: Optional[int] = None,
        vis_num_pc: Optional[int] = None,
        x0_pullback: bool = False,
        edit_prompt: Optional[str] = None,
    ):
        """Decoder-pullback edit on the SD driver: top h-directions by
        decoder sensitivity (∂ε/∂h, or ∂ẑ₀/∂h with ``x0_pullback``), pulled
        to latent space through the encoder Jᵀ, then the standard guidance
        edit. Reference binds local_decoder_pullback_zt to the SD U-Net
        (utils.py:818-898) but never dispatches the flag."""
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
        res = self.compute_local_decoder_basis(
            zt, t_edit, tap, pca_rank, x0_pullback
        )
        # decoder right-singular vectors live in h-space → (dim_h, k)
        tag = "local_dec_x0" if x0_pullback else "local_dec"
        return self._edit_with_global_h_basis(
            idx, res.vT.T, op, block_idx, vis_num, vis_num_pc, tag, zt=zt
        )
