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
import jax.numpy as jnp

from diffusion_pullback_tpu.utils.config import parse_args, preset


def build_uncond(args):
    from diffusion_pullback_tpu.experiments import (
        EditUncondDiffusion,
        UncondExperimentConfig,
    )
    from diffusion_pullback_tpu.models import UNet2D, ddpm_celebahq_256
    from diffusion_pullback_tpu.ops import DiffusionSchedule
    from diffusion_pullback_tpu.utils.datasets import get_dataset
    from diffusion_pullback_tpu.utils.logging import JSONLLogger

    import dataclasses

    cfg_model = ddpm_celebahq_256()
    if args.dtype == "bf16":
        cfg_model = dataclasses.replace(cfg_model, dtype="bfloat16")
    if args.matmul_precision:
        cfg_model = dataclasses.replace(cfg_model, precision=args.matmul_precision)
    model = UNet2D(cfg_model)

    x0 = jnp.zeros((1, args.image_size, args.image_size, args.c_in))
    if args.checkpoint_path:
        from diffusion_pullback_tpu.models.convert import load_unet2d_torch_checkpoint

        params = load_unet2d_torch_checkpoint(args.checkpoint_path, model, x0)
    else:
        print("[main] no --checkpoint_path: deterministic random init (offline)")
        params = jax.jit(lambda k: model.init(k, x0, jnp.float32(0.0)))(
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
        dataset_name=args.dataset_name or "noise",
        for_steps=args.for_steps,
        inv_steps=args.inv_steps,
        edit_t=args.edit_t,
        seed=args.seed,
        x_space_guidance_edit_step=args.x_space_guidance_edit_step,
        x_space_guidance_scale=args.x_space_guidance_scale or 0.1,
        x_space_guidance_num_step=args.x_space_guidance_num_step or 16,
        performance_boosting_t=args.performance_boosting_t,
        use_performance_boosting=args.performance_boosting_t > 0,
        pca_rank=args.pca_rank,
        pullback_chunk_size=args.pullback_chunk_size or None,
        result_folder=args.result_folder,
        obs_folder=args.obs_folder,
        basis_folder=os.path.join(
            "./inputs",
            f"local_encoder_pullback_uncond-dataset_{args.dataset_name}"
            f"-num_steps_{args.for_steps}-pca_rank_{args.pca_rank}",
        ),
    )
    logger = JSONLLogger(os.path.join(args.exp_folder, "log.jsonl"))
    return EditUncondDiffusion(model, params, schedule, dataset, exp_cfg, logger)


def build_sd(args):
    raise NotImplementedError(
        "Stable Diffusion family lands with models/unet2d_condition + vae + "
        "clip_text (build plan stage 7)"
    )


def main(argv=None):
    args = preset(parse_args(argv))

    if args.is_stable_diffusion:
        edit = build_sd(args)
    else:
        edit = build_uncond(args)

    if args.run_edit_local_encoder_pullback_zt:
        edit.run_edit_local_encoder_pullback_xt(
            idx=args.sample_idx, op="mid", block_idx=0,
            vis_num=4, vis_num_pc=2, pca_rank=args.pca_rank or 2,
        )

    if args.run_sample_encoder_local_tangent_space_zt:
        edit_t_list = [round(t, 2) for t in
                       [0.05 * i for i in range(1, 21)]]
        edit.run_sample_encoder_local_tangent_space_xt(
            idx=args.sample_idx, op="mid", block_idx=0, pca_rank=50,
            t_grid=tuple(reversed(edit_t_list)),
        )

    if args.run_ddim_forward:
        edit.run_ddim_forward(
            num_samples=5,
            save_as=os.path.join(args.result_folder, "DDIMforward.png"),
        )

    if args.run_ddim_inversion:
        edit.run_ddim_inversion(idx=args.sample_idx)


if __name__ == "__main__":
    main()
