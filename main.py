"""CLI entry point — the reference's main.py surface on the TPU framework.

Same flags (utils/config.py mirrors define_argparser), same dispatch shape
(/root/reference/src/main.py:8-102): pick the model family, then run the
toggled experiments. Offline-first: with no --checkpoint_path the model runs
with deterministic random init so every pipeline is exercisable without
weights; point --checkpoint_path at a torch checkpoint to convert real
weights (models/convert.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# this environment's sitecustomize force-registers the TPU plugin, which
# wins over the JAX_PLATFORMS env var — honor the var explicitly so
# `JAX_PLATFORMS=cpu python main.py ...` behaves as every JAX user expects
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from diffusion_pullback_tpu.utils.config import parse_args, preset


def build_mesh(args):
    """--mesh_axes 'probe' / 'dp' / 'dp:2,probe:4' → jax.sharding.Mesh over
    the available devices ('' or a single device → None, single-chip path).

    TPU-native addition: the reference's only distribution machinery is the
    dead MPI→NCCL bootstrap (dist_util.py:21-42); here the mesh routes the
    pullback probe axis and the harvest sweep axis over ICI via GSPMD."""
    spec = getattr(args, "mesh_axes", "") or ""
    if not spec:
        return None
    if len(jax.devices()) == 1:
        print("[main] --mesh_axes given but only 1 device visible; "
              "running single-chip")
        return None
    from diffusion_pullback_tpu.parallel import make_mesh

    axes, shape = [], {}
    for part in spec.split(","):
        part = part.strip()
        if ":" in part:
            a, n = part.split(":")
            axes.append(a)
            shape[a] = int(n)
        else:
            axes.append(part)
    mesh = make_mesh(tuple(axes), shape=shape if len(shape) == len(axes) else None)
    print(f"[main] device mesh: {dict(mesh.shape)}")
    return mesh


def build_uncond(args, mesh=None):
    from diffusion_pullback_tpu.experiments import (
        EditUncondDiffusion,
        UncondExperimentConfig,
    )
    from diffusion_pullback_tpu.models import UNet2D, model_for_name
    from diffusion_pullback_tpu.ops import DiffusionSchedule
    from diffusion_pullback_tpu.utils.datasets import get_dataset
    from diffusion_pullback_tpu.utils.logging import JSONLLogger

    import dataclasses

    # model_name → architecture (reference paths.py:1-19 +
    # script_util.py routing; HF ddpm names share the google/ddpm arch,
    # checkpoint-era names get the UNetADM port)
    model = model_for_name(
        args.model_name,
        dtype="bfloat16" if args.dtype == "bf16" else "float32",
        precision=args.matmul_precision or None,
        attn_impl=args.attn_impl if args.attn_impl != "auto" else "",
    )

    # bf16 parameter storage halves HBM weight traffic per step; vae/text
    # (SD family) and optimizer-facing master params are unaffected
    from diffusion_pullback_tpu.models.convert import cast_f32_to_bf16
    cast = cast_f32_to_bf16 if args.weights_dtype == "bf16" else (lambda t: t)

    x0 = jnp.zeros((1, args.image_size, args.image_size, args.c_in))
    if args.checkpoint_path:
        if isinstance(model, UNet2D):
            from diffusion_pullback_tpu.models.convert import (
                load_unet2d_torch_checkpoint,
            )

            params = load_unet2d_torch_checkpoint(args.checkpoint_path, model, x0)
        else:
            from diffusion_pullback_tpu.models.convert import (
                convert_torch_state_dict,
                load_torch_checkpoint_file,
            )

            template = jax.eval_shape(
                lambda k: model.init(k, x0, jnp.float32(0.0)), jax.random.key(0)
            )
            template = jax.tree.map(lambda t: jnp.zeros(t.shape, t.dtype),
                                    template)
            params = convert_torch_state_dict(
                load_torch_checkpoint_file(args.checkpoint_path), template
            )
        params = cast(params)
    else:
        print("[main] no --checkpoint_path: deterministic random init (offline)")
        params = jax.jit(lambda k: cast(model.init(k, x0, jnp.float32(0.0))))(
            jax.random.key(args.seed)
        )

    schedule = DiffusionSchedule.from_name(
        getattr(args, "noise_schedule", "linear")
    )
    try:
        dataset = get_dataset(
            args.dataset_name or "noise", args.image_size, args.data_root or None
        )
    except FileNotFoundError as e:
        print(f"[main] {e}; falling back to offline noise dataset")
        from diffusion_pullback_tpu.utils.datasets import NoiseDataset

        dataset = NoiseDataset(args.image_size)

    exp_cfg = UncondExperimentConfig(
        mesh=mesh,
        aot_export=args.aot_export,
        dataset_name=args.dataset_name or "noise",
        for_steps=args.for_steps,
        inv_steps=args.inv_steps,
        edit_t=args.edit_t,
        seed=args.seed,
        x_space_guidance_edit_step=args.x_space_guidance_edit_step,
        x_space_guidance_scale=args.x_space_guidance_scale or 0.1,
        x_space_guidance_num_step=args.x_space_guidance_num_step or 16,
        h_space_guidance_scale=args.h_space_guidance_scale,
        use_dynamic_thresholding=args.use_dynamic_thresholding,
        dynamic_thresholding_q=args.dynamic_thresholding_q,
        use_preserve_contrast=args.use_preserve_contrast,
        use_preserve_norm=args.use_preserve_norm,
        use_sega_reg=args.use_sega_reg,
        sega_reg_sigma=args.sega_reg_sigma,
        sampling_timesteps=args.sampling_timesteps,
        performance_boosting_t=args.performance_boosting_t,
        use_performance_boosting=args.performance_boosting_t > 0,
        pca_rank=args.pca_rank,
        pullback_chunk_size=args.pullback_chunk_size or None,
        # fused flash pair whenever the model itself runs flash primals
        # (the flash kernel has no forward-mode rule); harmless at ≤256
        # tokens where attention() falls back to XLA anyway
        pullback_attn_impl=args.pullback_attn_impl or (
            "flash" if jax.default_backend() != "cpu" else ""),
        classifier_scale=getattr(args, "classifier_scale", 0.0),
        classifier_label=getattr(args, "classifier_label", 0),
        result_folder=args.result_folder,
        obs_folder=args.obs_folder,
        basis_folder=os.path.join(
            "./inputs",
            f"local_encoder_pullback_uncond-dataset_{args.dataset_name}"
            f"-num_steps_{args.for_steps}-pca_rank_{args.pca_rank}",
        ),
    )
    logger = JSONLLogger(os.path.join(args.exp_folder, "log.jsonl"))
    drv = EditUncondDiffusion(model, params, schedule, dataset, exp_cfg, logger)

    if getattr(args, "classifier_scale", 0.0) > 0:
        # ADM classifier guidance (the vendored condition_score path,
        # gaussian_diffusion.py:371-392): a noisy-image classifier's
        # log-prob gradient folds into epsilon on every sampler loop
        from diffusion_pullback_tpu.models import EncoderUNetADM
        from diffusion_pullback_tpu.models.configs import adm_classifier
        from diffusion_pullback_tpu.samplers import classifier_grad_fn

        # size-dependent published architecture (script_util.py:489-502) —
        # channel_mult and attention ds both change with image_size
        ccfg = adm_classifier(args.image_size)
        clf = EncoderUNetADM(ccfg)
        if args.classifier_path:
            from diffusion_pullback_tpu.models.convert import (
                convert_torch_state_dict,
                load_torch_checkpoint_file,
            )

            template = jax.eval_shape(
                lambda k: clf.init(k, x0, jnp.float32(0.0)), jax.random.key(0)
            )
            template = jax.tree.map(
                lambda t: jnp.zeros(t.shape, t.dtype), template
            )
            cparams = convert_torch_state_dict(
                load_torch_checkpoint_file(args.classifier_path), template
            )
        else:
            print("[main] classifier guidance with random-init classifier "
                  "(no --classifier_path)")
            cparams = jax.jit(
                lambda k: clf.init(k, x0, jnp.float32(0.0))
            )(jax.random.key(args.seed + 1))
        y = jnp.full((1,), args.classifier_label, jnp.int32)
        drv.cond_fn = classifier_grad_fn(
            lambda z, t: clf.apply(cparams, z, t), y,
            scale=args.classifier_scale,
        )
    return drv


def build_sd(args, mesh=None):
    import dataclasses

    from diffusion_pullback_tpu.experiments import (
        EditStableDiffusion,
        SDExperimentConfig,
    )
    from diffusion_pullback_tpu.models import (
        AutoencoderKL,
        CLIPTextModel,
        UNet2DCondition,
        sd21_base_unet,
        sd21_text_encoder,
        sd_vae,
    )
    from diffusion_pullback_tpu.ops import DiffusionSchedule
    from diffusion_pullback_tpu.utils.datasets import get_dataset
    from diffusion_pullback_tpu.utils.logging import JSONLLogger

    ucfg = sd21_base_unet()
    if args.dtype == "bf16":
        ucfg = dataclasses.replace(ucfg, dtype="bfloat16")
    if args.matmul_precision:
        ucfg = dataclasses.replace(ucfg, precision=args.matmul_precision)
    if args.attn_impl:
        ucfg = dataclasses.replace(ucfg, attn_impl=args.attn_impl)
    if mesh is not None and mesh.shape.get("tp", 1) > 1:
        # keep q/k/v dots separate so the Megatron column-sharded kernels
        # (parallel/tp.py) are consumed in place, not re-concatenated
        ucfg = dataclasses.replace(ucfg, fuse_qkv=False)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(sd_vae(attn_impl=args.attn_impl))
    text = CLIPTextModel(sd21_text_encoder())

    s, c = ucfg.sample_size, ucfg.in_channels
    z0 = jnp.zeros((1, s, s, c))
    ctx0 = jnp.zeros((1, text.config.max_length, ucfg.cross_attention_dim))
    x0 = jnp.zeros((1, args.image_size * 8, args.image_size * 8, 3))
    ids0 = jnp.zeros((1, text.config.max_length), jnp.int32)

    # bf16 UNet weights halve HBM weight traffic per denoise step (the VAE
    # and text encoder run once per edit — keep them f32)
    from diffusion_pullback_tpu.models.convert import cast_f32_to_bf16
    cast = cast_f32_to_bf16 if args.weights_dtype == "bf16" else (lambda t: t)
    if args.checkpoint_path:
        from diffusion_pullback_tpu.models.convert import (
            convert_torch_state_dict,
            load_torch_checkpoint_file,
        )

        root = args.checkpoint_path
        def load(model, example_args, sub):
            template = jax.eval_shape(
                lambda k: model.init(k, *example_args), jax.random.key(0)
            )
            template = jax.tree.map(lambda t: jnp.zeros(t.shape, t.dtype), template)
            sd = load_torch_checkpoint_file(os.path.join(root, sub))
            return convert_torch_state_dict(sd, template)

        unet_params = cast(load(unet, (z0, jnp.float32(0.0), ctx0),
                                "unet/diffusion_pytorch_model.bin"))
        vae_params = load(vae, (x0,), "vae/diffusion_pytorch_model.bin")
        text_params = load(text, (ids0,), "text_encoder/pytorch_model.bin")
    else:
        print("[main] no --checkpoint_path: deterministic random init (offline)")
        unet_params = jax.jit(
            lambda k: cast(unet.init(k, z0, jnp.float32(0.0), ctx0))
        )(jax.random.key(args.seed))
        vae_params = jax.jit(lambda k: vae.init(k, x0))(jax.random.key(args.seed + 1))
        text_params = jax.jit(lambda k: text.init(k, ids0))(jax.random.key(args.seed + 2))

    try:
        dataset = get_dataset(
            args.dataset_name or "noise", args.image_size * 8,
            args.data_root or None,
        )
    except FileNotFoundError as e:
        print(f"[main] {e}; falling back to offline noise dataset")
        from diffusion_pullback_tpu.utils.datasets import NoiseDataset

        dataset = NoiseDataset(args.image_size * 8)

    exp_cfg = SDExperimentConfig(
        mesh=mesh,
        dataset_name=args.dataset_name or "noise",
        for_steps=args.for_steps,
        inv_steps=args.inv_steps,
        edit_t=args.edit_t,
        seed=args.seed,
        guidance_scale=args.guidance_scale,
        for_prompt=args.for_prompt,
        neg_prompt=args.neg_prompt,
        inv_prompt=args.inv_prompt,
        edit_prompt=args.edit_prompt,
        x_space_guidance_edit_step=args.x_space_guidance_edit_step,
        x_space_guidance_scale=args.x_space_guidance_scale or 1.0,
        x_space_guidance_num_step=args.x_space_guidance_num_step or 16,
        pca_rank=args.pca_rank,
        loop_impl=args.loop_impl,
        aot_export=args.aot_export,
        loop_chunk=args.loop_chunk,
        # fused flash pair by default on accelerators (measured 1.5-5.2x
        # over xla/blockwise); pass --pullback_attn_impl xla to opt out
        pullback_attn_impl=args.pullback_attn_impl or (
            "flash" if jax.default_backend() != "cpu" else ""),
        pullback_guidance_scale=args.pullback_guidance_scale,
        use_dynamic_thresholding=args.use_dynamic_thresholding,
        dynamic_thresholding_q=args.dynamic_thresholding_q,
        use_preserve_contrast=args.use_preserve_contrast,
        use_preserve_norm=args.use_preserve_norm,
        edit_deepcache_interval=args.edit_deepcache_interval,
        guidance_deepcache_interval=args.guidance_deepcache_interval,
        text_driven_num_pc=args.text_driven_num_pc,
        pullback_chunk_size=args.pullback_chunk_size or None,
        result_folder=args.result_folder,
        obs_folder=args.obs_folder,
        basis_folder=os.path.join(
            "./inputs",
            f"local_encoder_pullback_stable_diffusion-dataset_{args.dataset_name}"
            f"-num_steps_{args.for_steps}-pca_rank_{args.pca_rank}",
        ),
    )
    logger = JSONLLogger(os.path.join(args.exp_folder, "log.jsonl"))
    return EditStableDiffusion(
        unet, unet_params, vae, vae_params, text, text_params,
        DiffusionSchedule.from_name("scaled_linear"), dataset, exp_cfg,
        logger=logger,
    )


def build_sdxl(args, mesh=None):
    """SDXL flavour of build_sd: dual text towers, 0.13025 VAE scaling,
    1024px geometry. Random init is the offline default (2.6B-param UNet —
    pass --dtype bf16 for single-chip work)."""
    import dataclasses

    from diffusion_pullback_tpu.experiments import (
        EditStableDiffusionXL,
        SDExperimentConfig,
    )
    from diffusion_pullback_tpu.models import (
        AutoencoderKL,
        CLIPTextModel,
        UNet2DCondition,
        sd_vae,
        sdxl_base_unet,
        sdxl_text_encoder_1,
        sdxl_text_encoder_2,
    )
    from diffusion_pullback_tpu.ops import DiffusionSchedule
    from diffusion_pullback_tpu.utils.datasets import get_dataset
    from diffusion_pullback_tpu.utils.logging import JSONLLogger

    ucfg = sdxl_base_unet()
    if args.dtype == "bf16":
        ucfg = dataclasses.replace(ucfg, dtype="bfloat16",
                                   remat_transformer=True)
    if args.matmul_precision:
        ucfg = dataclasses.replace(ucfg, precision=args.matmul_precision)
    if args.attn_impl:
        ucfg = dataclasses.replace(ucfg, attn_impl=args.attn_impl)
    if mesh is not None and mesh.shape.get("tp", 1) > 1:
        ucfg = dataclasses.replace(ucfg, fuse_qkv=False)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(
        dataclasses.replace(sd_vae(attn_impl=args.attn_impl),
                            scaling_factor=0.13025)
    )
    text1 = CLIPTextModel(sdxl_text_encoder_1())
    text2 = CLIPTextModel(sdxl_text_encoder_2())

    s, c = ucfg.sample_size, ucfg.in_channels
    z0 = jnp.zeros((1, s, s, c))
    ctx0 = jnp.zeros((1, text1.config.max_length, ucfg.cross_attention_dim))
    added0 = (jnp.zeros((1, ucfg.addition_embed_dim)), jnp.zeros((1, 6)))
    x0 = jnp.zeros((1, args.image_size * 8, args.image_size * 8, 3))
    ids0 = jnp.zeros((1, text1.config.max_length), jnp.int32)

    # 2.57B-param UNet: bf16 weights halve HBM (fits one v5e chip); the cast
    # is applied inside the producing program / before device upload so the
    # f32 and bf16 copies never coexist on-chip
    from diffusion_pullback_tpu.models.convert import cast_f32_to_bf16
    cast = cast_f32_to_bf16 if args.weights_dtype == "bf16" else (lambda t: t)
    if args.checkpoint_path:
        from diffusion_pullback_tpu.models.convert import (
            convert_torch_state_dict,
            load_torch_checkpoint_file,
        )

        root = args.checkpoint_path

        def load(model, init_fn, sub):
            template = jax.eval_shape(init_fn, jax.random.key(0))
            template = jax.tree.map(
                lambda t: jnp.zeros(t.shape, t.dtype), template
            )
            sd = load_torch_checkpoint_file(os.path.join(root, sub))
            return convert_torch_state_dict(sd, template)

        unet_params = cast(load(
            unet,
            lambda k: unet.init(k, z0, jnp.float32(0.0), ctx0,
                                added_cond=added0),
            "unet/diffusion_pytorch_model.bin",
        ))
        vae_params = load(vae, lambda k: vae.init(k, x0),
                          "vae/diffusion_pytorch_model.bin")
        text_params_1 = load(text1, lambda k: text1.init(k, ids0),
                             "text_encoder/pytorch_model.bin")
        text_params_2 = load(
            text2,
            lambda k: text2.init(k, ids0, return_pooled=True),
            "text_encoder_2/pytorch_model.bin",
        )
    else:
        print("[main] no --checkpoint_path: deterministic random init (offline)")
        unet_params = jax.jit(
            lambda k: cast(unet.init(k, z0, jnp.float32(0.0), ctx0,
                                     added_cond=added0))
        )(jax.random.key(args.seed))
        vae_params = jax.jit(lambda k: vae.init(k, x0))(
            jax.random.key(args.seed + 1))
        text_params_1 = jax.jit(lambda k: text1.init(k, ids0))(
            jax.random.key(args.seed + 2))
        text_params_2 = jax.jit(
            lambda k: text2.init(k, ids0, return_pooled=True)
        )(jax.random.key(args.seed + 3))

    try:
        dataset = get_dataset(
            args.dataset_name or "noise", args.image_size * 8,
            args.data_root or None,
        )
    except FileNotFoundError as e:
        print(f"[main] {e}; falling back to offline noise dataset")
        from diffusion_pullback_tpu.utils.datasets import NoiseDataset

        dataset = NoiseDataset(args.image_size * 8)

    exp_cfg = SDExperimentConfig(
        mesh=mesh,
        dataset_name=args.dataset_name or "noise",
        for_steps=args.for_steps,
        inv_steps=args.inv_steps,
        edit_t=args.edit_t,
        seed=args.seed,
        guidance_scale=args.guidance_scale,
        for_prompt=args.for_prompt,
        neg_prompt=args.neg_prompt,
        inv_prompt=args.inv_prompt,
        edit_prompt=args.edit_prompt,
        x_space_guidance_edit_step=args.x_space_guidance_edit_step,
        x_space_guidance_scale=args.x_space_guidance_scale or 1.0,
        x_space_guidance_num_step=args.x_space_guidance_num_step or 16,
        pca_rank=args.pca_rank,
        loop_impl=args.loop_impl,
        aot_export=args.aot_export,
        loop_chunk=args.loop_chunk,
        # fused flash pair by default on accelerators (measured 1.5-5.2x
        # over xla/blockwise); pass --pullback_attn_impl xla to opt out
        pullback_attn_impl=args.pullback_attn_impl or (
            "flash" if jax.default_backend() != "cpu" else ""),
        pullback_guidance_scale=args.pullback_guidance_scale,
        use_dynamic_thresholding=args.use_dynamic_thresholding,
        dynamic_thresholding_q=args.dynamic_thresholding_q,
        use_preserve_contrast=args.use_preserve_contrast,
        use_preserve_norm=args.use_preserve_norm,
        edit_deepcache_interval=args.edit_deepcache_interval,
        guidance_deepcache_interval=args.guidance_deepcache_interval,
        text_driven_num_pc=args.text_driven_num_pc,
        # sequential directions: the fused direction-vmapped finish OOMs one
        # chip at 1024px (see SDExperimentConfig.edit_vmap_directions)
        edit_vmap_directions=False,
        # r<=2 probes fit one chip un-chunked (measured: 12.35 s vs
        # 15.85 s chunked for the 50-iter 1024px mid pullback); larger
        # probe blocks serialize through lax.map to bound HBM
        pullback_chunk_size=args.pullback_chunk_size
        or (None if (args.pca_rank or 2) <= 2 else 1),
        pullback_remat=True,
        decode_chunk=1,
        result_folder=args.result_folder,
        obs_folder=args.obs_folder,
        basis_folder=os.path.join(
            "./inputs",
            f"local_encoder_pullback_sdxl-dataset_{args.dataset_name}"
            f"-num_steps_{args.for_steps}-pca_rank_{args.pca_rank}",
        ),
    )
    logger = JSONLLogger(os.path.join(args.exp_folder, "log.jsonl"))
    return EditStableDiffusionXL(
        unet, unet_params, vae, vae_params,
        text1, text_params_1, text2, text_params_2,
        DiffusionSchedule.from_name("scaled_linear"), dataset, exp_cfg,
        logger=logger,
    )


def main(argv=None):
    args = preset(parse_args(argv))
    from diffusion_pullback_tpu.utils.profiling import trace

    if getattr(args, "debug_nans", False):
        # NaN sanitizer (SURVEY §5: the reference has none; determinism +
        # fail-fast NaN checks are the jit-purity equivalents)
        jax.config.update("jax_debug_nans", True)

    with trace(getattr(args, "profile_dir", "")):
        _dispatch(args)


def _dispatch(args):
    mesh = build_mesh(args)
    if getattr(args, "is_sdxl", False):
        edit = build_sdxl(args, mesh=mesh)
    elif args.is_stable_diffusion:
        edit = build_sd(args, mesh=mesh)
    else:
        edit = build_uncond(args, mesh=mesh)

    if args.run_edit_local_encoder_pullback_zt:
        edit.run_edit_local_encoder_pullback_zt(
            idx=args.sample_idx, op=args.op, block_idx=args.block_idx,
            vis_num=4, vis_num_pc=2, pca_rank=args.pca_rank or 2,
            edit_prompt=args.edit_prompt or None,
            after_res=args.after_res, after_sa=args.after_sa,
        )

    if args.run_edit_local_encoder_pullback_zt_with_various_prompt:
        from diffusion_pullback_tpu.utils.datasets import get_prompt_list

        prompts = get_prompt_list(num_captions=args.num_local_basis or 5)
        sweep_idx = args.various_prompt_sample_idx or args.sample_idx
        if hasattr(edit, "run_sample_encoder_local_tangent_space_zt_various_prompt"):
            # one program fills the basis cache for every prompt — with a
            # 'dp' mesh axis the prompt axis shards across devices
            # (reference main.py:45-91 runs this sweep serially per prompt)
            edit.run_sample_encoder_local_tangent_space_zt_various_prompt(
                prompts, idx=sweep_idx, op=args.op,
                block_idx=args.block_idx, pca_rank=args.pca_rank or 2,
            )
        for prompt in prompts:
            edit.run_edit_local_encoder_pullback_zt(
                idx=sweep_idx,
                op=args.op, block_idx=args.block_idx, vis_num=4, vis_num_pc=2,
                pca_rank=args.pca_rank or 2, edit_prompt=prompt,
            )

    if args.run_edit_parallel_transport:
        if not hasattr(edit, "run_edit_parallel_transport"):
            raise SystemExit(
                "--run_edit_parallel_transport is only implemented for the "
                "unconditional family (reference parity: edit.py:781 exists "
                "only on EditUncondDiffusion)")
        edit.run_edit_parallel_transport(
            sample_idx_0=args.sample_idx_0, sample_idx_1=args.sample_idx_1,
            op=args.op, block_idx=args.block_idx, vis_num=4, vis_num_pc=2, pca_rank=50,
        )

    if args.run_edit_local_decoder_pullback_zt or \
            args.run_edit_local_x0_decoder_pullback_zt:
        # both families (reference binds local_decoder_pullback_zt to the SD
        # U-Net, utils.py:818-898, and ships the pixel variant on the custom
        # DDPM, diffusion.py:558-707, but never dispatches the flags)
        edit.run_edit_local_decoder_pullback_zt(
            idx=args.sample_idx, op=args.op, block_idx=args.block_idx,
            pca_rank=args.pca_rank or 2,
            x0_pullback=bool(args.run_edit_local_x0_decoder_pullback_zt),
        )

    if args.run_edit_global_pca_zt:
        edit.run_edit_global_pca_zt(
            idx=args.sample_idx, op=args.op, block_idx=args.block_idx,
            pca_rank=args.pca_rank or 2,
            num_samples=args.num_local_basis or 16,
        )

    if args.run_edit_local_pca_zt:
        edit.run_edit_local_pca_zt(
            idx=args.sample_idx, op=args.op, block_idx=args.block_idx,
            pca_rank=max(args.pca_rank, 4), vis_num=4, vis_num_pc=2,
        )

    if args.run_sample_encoder_local_tangent_space_zt:
        edit_t_list = [round(t, 2) for t in
                       [0.05 * i for i in range(1, 21)]]
        harvest = getattr(
            edit, "run_sample_encoder_local_tangent_space_xt_batched", None
        ) or edit.run_sample_encoder_local_tangent_space_zt_batched
        kwargs = {}
        if not args.is_stable_diffusion:
            kwargs = dict(fix_xt=args.fix_xt, fix_t=args.fix_t)
        harvest(
            idx=args.sample_idx, op=args.op, block_idx=args.block_idx,
            pca_rank=50, t_grid=tuple(reversed(edit_t_list)),
            after_res=args.after_res, after_sa=args.after_sa, **kwargs,
        )

    if args.run_edit_global_frechet_mean_zt:
        if not hasattr(edit, "run_edit_global_frechet_mean_xt"):
            raise SystemExit("--run_edit_global_frechet_mean_zt is only "
                             "implemented for the unconditional family")
        edit.run_edit_global_frechet_mean_xt(
            idx=args.sample_idx,
            basis_indices=list(range(min(args.num_local_basis, 5))),
            op=args.op, block_idx=args.block_idx, pca_rank=10, vis_num=4, vis_num_pc=2,
        )

    if args.run_edit_global_hungarian_mean_zt:
        if not hasattr(edit, "run_edit_global_hungarian_mean_xt"):
            raise SystemExit("--run_edit_global_hungarian_mean_zt is only "
                             "implemented for the unconditional family")
        edit.run_edit_global_hungarian_mean_xt(
            idx=args.sample_idx,
            basis_indices=list(range(min(args.num_local_basis, 5))),
            op=args.op, block_idx=args.block_idx, pca_rank=10, vis_num=4, vis_num_pc=2,
        )

    if getattr(args, "run_edit_h_space_guidance", False) or \
            getattr(args, "edit_ht", "default") == "h_space_guidance":
        if not hasattr(edit, "run_edit_h_space_guidance"):
            raise SystemExit(
                "--run_edit_h_space_guidance is implemented on the "
                "unconditional family (the reference's h-space path is "
                "aspirational everywhere — edit.py:1236 calls an undefined "
                "method)")
        edit.run_edit_h_space_guidance(
            idx=args.sample_idx, op=args.op, block_idx=args.block_idx,
            pca_rank=args.pca_rank or 2,
            scale=args.h_space_guidance_scale or None,
        )

    if getattr(args, "run_edit_text_driven_direction", False):
        # declared in the reference's argparser (define_argparser.py:124)
        # but never implemented there; our working spec lives on the SD
        # drivers (edit_sd.py run_edit_text_driven_direction)
        if not hasattr(edit, "run_edit_text_driven_direction"):
            raise SystemExit(
                "--run_edit_text_driven_direction needs a text-conditioned "
                "model (SD/SDXL family)")
        edit.run_edit_text_driven_direction(
            idx=args.sample_idx, op=args.op, block_idx=args.block_idx,
        )

    if args.run_ddim_forward:
        fwd = getattr(edit, "run_DDIMforward", None) or edit.run_ddim_forward
        kw = {"vis_psd": True} if (args.vis_psd and
                                   fwd.__name__ == "run_ddim_forward") else {}
        fwd(
            num_samples=5,
            save_as=os.path.join(args.result_folder, "DDIMforward.png"),
            **kw,
        )

    if args.run_ddim_inversion:
        # reference method name differs per family (run_DDIMinversion on the
        # SD driver, run_ddim_inversion on uncond)
        inv = getattr(edit, "run_DDIMinversion", None) or edit.run_ddim_inversion
        inv(idx=args.sample_idx)


if __name__ == "__main__":
    main()
