"""CLI flag surface and preset derivations.

Flag-name compatible with the reference's argparser
(/root/reference/src/utils/define_argparser.py:15-133) and its `preset()`
derivations (:145-233): same defaults, same derived args (c_in/image_size
per family, x_space_guidance_scale from the h_t tables), same asserts, same
run-dir layout with provenance copies. TPU-specific additions are grouped at
the bottom (mesh axes, dtype='bf16', attention impl, probe chunking) and the
GPU memory-staging flags (pca_device/buffer_device/memory_bound) are
accepted-but-inert: on TPU the batch is a sharded array axis, not a chunk
loop.
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import sys

import numpy as np

from ..configs.params import X_SPACE_GUIDANCE_SCALE_DICT


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() == "true":
        return True
    if v.lower() == "false":
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # default setting
    p.add_argument("--sh_file_name", type=str, default="")
    p.add_argument("--device", type=str, default="")
    p.add_argument("--dtype", type=str, default="",
                   help="'fp32'|'bf16'|'' = auto: bf16 on accelerators "
                        "(TPU/GPU), fp32 on CPU")
    p.add_argument("--weights_dtype", type=str, default="auto",
                   help="diffusion-model parameter storage: 'auto' follows "
                        "--dtype (bf16 weights halve HBM weight traffic per "
                        "denoise step; SDXL has always cast), 'fp32' keeps "
                        "f32 master weights under bf16 compute")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--result_folder", type=str, default="./runs/")
    # model / dataset
    p.add_argument("--model_name", type=str, default="")
    p.add_argument("--dataset_name", type=str, default="")
    p.add_argument("--num_imgs", type=int, default=100)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--c_in", type=int, default=3)
    p.add_argument("--sample_idx", type=int, default=0)
    # prompts
    p.add_argument("--for_prompt", type=str, default="")
    p.add_argument("--inv_prompt", type=str, default="")
    p.add_argument("--neg_prompt", type=str, default="")
    # schedule
    p.add_argument("--for_steps", type=int, default=100)
    p.add_argument("--inv_steps", type=int, default=100)
    p.add_argument("--performance_boosting_t", type=float, default=0.0)
    p.add_argument("--use_yh_custom_scheduler", type=str2bool, default=True)
    # guidance
    p.add_argument("--guidance_scale", type=float, default=0)
    # h/x-space edit
    p.add_argument("--edit_prompt", type=str, default="")
    p.add_argument("--edit_xt", type=str, default="default")
    p.add_argument("--use_x_space_guidance", type=str2bool, default=False)
    p.add_argument("--x_space_guidance_edit_step", type=float, default=1)
    p.add_argument("--x_space_guidance_scale", type=float, default=0)
    p.add_argument("--x_space_guidance_num_step", type=int, default=0)
    p.add_argument("--x_space_guidance_use_edit_prompt", type=str2bool, default=True)
    p.add_argument("--h_t", type=float, default=0.8)
    p.add_argument("--edit_t", type=float, default=1.0)
    p.add_argument("--no_edit_t", type=float, default=0.5)
    p.add_argument("--h_edit_step_size", type=float, default=0)
    p.add_argument("--x_edit_step_size", type=float, default=0)
    # memory staging flags (reference GPU OOM workarounds; inert on TPU)
    p.add_argument("--pca_device", type=str, default="cpu")
    p.add_argument("--buffer_device", type=str, default="cpu")
    p.add_argument("--save_result_as", type=str, default="image")
    # experiment toggles
    p.add_argument("--note", type=str, required=True)
    for flag in (
        "run_cfg_forward",
        "run_mcg_forward",
        "run_pfg_forward",
        "run_ddim_forward",
        "vis_psd",
        "run_ddim_inversion",
        "run_edit_local_encoder_pullback_zt",
        "run_edit_local_decoder_pullback_zt",
        "run_edit_local_x0_decoder_pullback_zt",
        "run_edit_local_pca_zt",
        "run_edit_local_encoder_pullback_zt_with_various_prompt",
        "run_sample_encoder_local_tangent_space_zt",
        "run_edit_global_frechet_mean_zt",
        "run_edit_parallel_transport",
        "run_edit_global_hungarian_mean_zt",
        "run_edit_text_driven_direction",
        "run_edit_h_space_guidance",
        "run_edit_global_pca_zt",
        "fix_xt",
        "fix_t",
        "after_res",
        "after_sa",
        "use_dynamic_thresholding",
        "use_preserve_contrast",
        "use_preserve_norm",
        "use_sega_reg",
        "local_projection",
        "debug_mode",
        "sampling_mode",
    ):
        p.add_argument(f"--{flag}", type=str2bool, default=False)
    # tap selection (the reference hardcodes op='mid', block_idx=0 in its
    # main.py:32 and sweeps them only in commented-out blocks)
    p.add_argument("--op", type=str, default="mid",
                   choices=["down", "mid", "up"])
    p.add_argument("--block_idx", type=int, default=0)
    p.add_argument("--various_prompt_type", type=str, default="")
    p.add_argument("--various_prompt_sample_idx", type=int, default=0)
    p.add_argument("--num_local_basis", type=int, default=100)
    p.add_argument("--frechet_mean_space", type=str, default="")
    p.add_argument("--hungarian_mean_space", type=str, default="")
    p.add_argument("--sample_idx_0", type=int, default=0)
    p.add_argument("--sample_idx_1", type=int, default=0)
    # ---- TPU-native additions --------------------------------------------
    p.add_argument("--mesh_axes", type=str, default="",
                   help="e.g. 'dp:2,probe:4', 'tp:4' (tensor-parallel "
                        "weight layout) or 'sp:4' (ring attention); "
                        "empty = single device")
    p.add_argument("--attn_impl", type=str, default="auto",
                   choices=["auto", "xla", "blockwise", "flash", "ring"])
    p.add_argument("--dynamic_thresholding_q", type=float, default=0.8)
    p.add_argument("--sega_reg_sigma", type=float, default=1.0)
    p.add_argument("--edit_ht", type=str, default="default",
                   help="reference-declared h-edit mode (its argparser "
                        "comments this out); 'h_space_guidance' routes to "
                        "run_edit_h_space_guidance")
    p.add_argument("--h_space_guidance_scale", type=float, default=0.0,
                   help="DDS scale for h-space guidance edits (0 = reuse "
                        "x_space_guidance_scale); the reference comments "
                        "this flag out and never defines the method")
    p.add_argument("--debug_nans", type=str2bool, default=False,
                   help="jax_debug_nans sanitizer: fail fast with a "
                        "traceback at the first NaN-producing op")
    p.add_argument("--profile_dir", type=str, default="",
                   help="wrap the run in a jax.profiler trace "
                        "(Perfetto/XPlane dump into this directory)")
    p.add_argument("--pullback_guidance_scale", type=float, default=0.0,
                   help="CFG inside the JVP'd encoder (BASELINE config 4): "
                        ">0 differentiates h_edit + s*(h_edit - h_neg) as a "
                        "fused 2B batch; 0 = edit-prompt encoder alone")
    p.add_argument("--pullback_attn_impl", type=str, default="",
                   choices=["", "xla", "blockwise", "flash"],
                   help="attention impl inside the differentiated encoder; "
                        "'flash' pairs the fused custom_jvp tangent kernel "
                        "with the flash custom_vjp backward")
    p.add_argument("--classifier_scale", type=float, default=0.0,
                   help="ADM classifier guidance scale (vendored "
                        "condition_score math): >0 guides uncond/ADM "
                        "sampling with an EncoderUNetADM classifier")
    p.add_argument("--classifier_path", type=str, default="",
                   help="torch checkpoint for the guidance classifier "
                        "(EncoderUNetModel layout); empty = random init")
    p.add_argument("--classifier_label", type=int, default=0,
                   help="target class label y for classifier guidance")
    p.add_argument("--sampling_timesteps", type=str, default="",
                   help="OpenAI respacing grid for ADM sampling: 'ddim25', "
                        "'250', '25,25,25' (space_timesteps semantics); "
                        "empty = the YH linspace grid")
    p.add_argument("--edit_deepcache_interval", type=int, default=0,
                   help="DeepCache encoder reuse on the edit-tail finish "
                        "sampling (SD/SDXL): refresh the deep U-Net path "
                        "every N steps; 0/1 = exact full model")
    p.add_argument("--guidance_deepcache_interval", type=int, default=0,
                   help="DeepCache encoder reuse on the x-space-guidance "
                        "micro-walk (SD/SDXL): the walk evaluates the "
                        "[z; z+dv] pair at ONE fixed timestep, so deep "
                        "features drift slowly; refresh every N micro-"
                        "steps; 0/1 = exact full pair each micro-step")
    p.add_argument("--text_driven_num_pc", type=int, default=0,
                   help="run_edit_text_driven_direction: 0 = single J^T dh "
                        "direction; k>0 = decompose dh in the top-k pullback "
                        "basis and walk each PC separately, signed toward dh")
    p.add_argument("--pca_rank", type=int, default=2)
    p.add_argument("--pullback_chunk_size", type=int, default=0,
                   help="probe-axis chunking for memory-bound configs; 0=off")
    p.add_argument("--aot_export", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="AOT-export traced programs so later processes skip "
                        "re-tracing (auto: on for single-device accelerator "
                        "runs)")
    p.add_argument("--loop_impl", type=str, default="auto",
                   choices=["auto", "scan", "host", "chunk"],
                   help="'scan' fuses trajectories into one XLA program; "
                        "'host' re-dispatches one compiled step (fast "
                        "compile for SD/SDXL-scale nets); 'chunk' "
                        "re-dispatches fused --loop_chunk-step scans "
                        "(amortizes dispatch RTT while programs stay "
                        "small); 'auto' = scan, except chunk for SDXL on "
                        "a single accelerator chip")
    p.add_argument("--loop_chunk", type=int, default=8,
                   help="steps per fused program under --loop_impl chunk")
    p.add_argument("--xsg_pair_impl", type=str, default="auto",
                   choices=["auto", "batch", "split"],
                   help="x-space-guidance (ε_null, ε_edit) evaluation: "
                        "'batch'=one 2·B U-Net call (reference shape, wins "
                        "when weight-bandwidth-bound: SD/SDXL latents), "
                        "'split'=two B-row calls (wins when the 2-row conv "
                        "batch is tile-padded: 2.1x faster at 256px pixel "
                        "space on v5e), 'auto'=split for pixel-space "
                        "models, batch for latent")
    p.add_argument("--matmul_precision", type=str, default="",
                   help="''=backend default, 'highest'=f32 passes")
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--checkpoint_path", type=str, default="",
                   help="torch .bin/.ckpt/.safetensors to convert; empty = "
                        "deterministic random init (offline mode)")
    return p


def parse_args(argv=None):
    return build_parser().parse_args(argv)


def seed_everything(seed: int):
    """Reference seed_everything (define_argparser.py:235-242) minus the
    torch/cudnn knobs: JAX determinism comes from explicit PRNG keys, so this
    only pins the host-side RNGs used for data/prompt selection."""
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    random.seed(seed)


def preset(args):
    """Derived args + asserts, mirroring reference preset() semantics."""
    seed_everything(args.seed)

    args.is_stable_diffusion = "stable-diffusion" in args.model_name
    args.is_sdxl = args.is_stable_diffusion and "-xl-" in args.model_name
    if args.is_sdxl:
        args.exp = f"Stable_Diffusion_XL-{args.dataset_name}-{args.note}"
    elif args.is_stable_diffusion:
        args.exp = f"Stable_Diffusion-{args.dataset_name}-{args.note}"
    else:
        # HF ddpm-family names (reference define_argparser.py:169) plus the
        # checkpoint-era ADM/P2 names the reference declares but refuses with
        # NotImplementedError (:164-168) — here they route to the UNetADM
        # port (models/adm.py) and run offline with random init until a
        # checkpoint is supplied via --checkpoint_path
        known_hf = {"CelebA_HQ_HF", "LSUN_church_HF", "LSUN_bedroom_HF",
                    "FFHQ_HF"}
        known_adm = {"LSUN_bedroom", "LSUN_cat", "LSUN_horse",
                     "FFHQ_P2", "AFHQ_P2", "Flower_P2", "CIFAR10",
                     # the checkpoint-load list of the reference's
                     # get_custom_diffusion_model (utils/utils.py:70,96)
                     "CIFAR10Uncond", "ImageNet64Uncond",
                     "ImageNet256Uncond", "ImageNet256Cond",
                     "ImageNet128Cond", "ImageNet64Cond"}
        if args.model_name not in known_hf | known_adm:
            raise ValueError(
                f"model_name choice: {sorted(known_hf | known_adm)} "
                f"(got {args.model_name!r})"
            )
        args.is_adm = args.model_name in known_adm
        args.exp = f"{args.model_name}-{args.dataset_name}-{args.note}"
    args.exp_folder = os.path.join(args.result_folder, args.exp)

    os.makedirs(args.exp_folder, exist_ok=True)
    # provenance copies (reference :182-184)
    if args.sh_file_name:
        src = os.path.join("scripts", args.sh_file_name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.exp_folder, args.sh_file_name))
    for fname in ("main.py",):
        if os.path.exists(fname):
            shutil.copy(fname, os.path.join(args.exp_folder, fname))

    args.obs_folder = os.path.join(args.exp_folder, "obs")
    args.result_folder = os.path.join(args.exp_folder, "results")
    os.makedirs(args.obs_folder, exist_ok=True)
    os.makedirs(args.result_folder, exist_ok=True)

    # edit scale from the tuned tables (reference :200-204)
    if args.use_x_space_guidance:
        family = "stable-diffusion" if args.is_stable_diffusion else "uncond"
        args.x_space_guidance_scale = X_SPACE_GUIDANCE_SCALE_DICT[family][args.h_t]

    # dtype auto-resolution — the TPU-native default is bf16 on
    # accelerators: the reference pins f32 because fp16 breaks its
    # jacfwd path (utils.py:322-323), but the bf16 pullback passes the
    # basis acceptance on-chip (min cos 0.9994 vs f32, r=8×5 @256px) and
    # SDXL-1024 *requires* bf16 on one chip. CPU stays f32 so golden and
    # parity tests are bit-stable. An explicit --dtype always wins.
    if not args.dtype:
        import jax

        backend = jax.default_backend()
        args.dtype = "fp32" if backend == "cpu" else "bf16"
        print(f"[preset] --dtype auto -> {args.dtype} (backend={backend})")
    if args.dtype not in ("fp32", "bf16"):
        raise ValueError(f"--dtype must be 'fp32'|'bf16' (got {args.dtype!r})")
    if args.weights_dtype == "auto":
        args.weights_dtype = args.dtype
    if args.weights_dtype not in ("fp32", "bf16"):
        raise ValueError("--weights_dtype must be 'auto'|'fp32'|'bf16' "
                         f"(got {args.weights_dtype!r})")
    if args.loop_chunk < 1:
        raise ValueError(
            f"--loop_chunk must be >= 1 (got {args.loop_chunk}); 1 = "
            "per-step programs (host-loop equivalent)"
        )

    # attention auto-resolution: sampling paths never differentiate, so on
    # accelerators 'auto' resolves to the Pallas flash kernel (measured
    # 32.2 → 26.1 ms/step on the full SD2.1-512 forward, one v5e chip; the
    # kernel falls back to XLA below 1024 tokens). Forward-mode paths are
    # unaffected: the pullback selects its own impl via
    # --pullback_attn_impl (default: the fused flash JVP/VJP pair), and the
    # decoder pullback routes through the same pair. CPU keeps the
    # xla/blockwise dispatch (interpret-mode Pallas is test-only).
    if args.attn_impl == "auto":
        import jax

        if "sp" in [a.strip().split(":")[0]
                    for a in args.mesh_axes.split(",") if a.strip()]:
            # an 'sp' mesh axis asks for sequence parallelism: ring
            # attention shards the O(S²) work over devices (the inner
            # kernel is flash on accelerators, XLA on CPU)
            args.attn_impl = "ring"
            print("[preset] --attn_impl auto -> ring (sp mesh axis)")
        elif jax.default_backend() != "cpu":
            args.attn_impl = "flash"
            print("[preset] --attn_impl auto -> flash (sampling paths; "
                  "pullback uses the fused pair)")

    # family-derived input geometry (reference :207-219)
    if args.is_sdxl:
        args.c_in, args.image_size, args.memory_bound = 4, 128, 1
        # fused >~40-step 1024px programs fault a single chip
        # (UNAVAILABLE/RESOURCE_EXHAUSTED, measured r3 — TODO.md)
        import jax

        _single_chip = (jax.default_backend() != "cpu"
                        and len(jax.devices()) == 1)
        if args.loop_impl == "auto" and _single_chip:
            args.loop_impl = "chunk"
            print("[preset] --loop_impl auto -> chunk (SDXL-1024 fused "
                  ">~40-step scans fault a single chip)")
        elif args.loop_impl == "scan" and _single_chip:
            print("[preset] warning: --loop_impl scan at SDXL-1024 faults "
                  "a single chip past ~40 fused steps; use 'chunk' or "
                  "'host'")
    elif args.is_stable_diffusion:
        args.c_in, args.image_size, args.memory_bound = 4, 64, 5
    elif "CIFAR10" in args.model_name:
        args.c_in, args.image_size, args.memory_bound = 3, 32, 50
    else:
        args.c_in, args.image_size, args.memory_bound = 3, 256, 50
        args.noise_schedule = "linear"
    if args.loop_impl == "auto":  # everywhere else the fused scan is best
        args.loop_impl = "scan"
    if args.xsg_pair_impl == "auto":
        # measured on v5e (scripts/probe_edit_decomp.py, 2026-08-20): at
        # 256px pixel space the 2-row eval pads the conv batch tile and
        # costs 4.3× a 1-row eval → split halves the walk; at SD's 64×64
        # latent the 2-row eval is ~1.7× (weight reads amortize) → batch
        args.xsg_pair_impl = (
            "batch" if (args.is_stable_diffusion or args.is_sdxl)
            else "split")

    # asserts (reference :224-231)
    assert args.use_yh_custom_scheduler
    if args.is_stable_diffusion:
        assert args.performance_boosting_t <= 0
    else:
        assert args.for_steps == 100
        assert args.performance_boosting_t == 0.2

    return args
