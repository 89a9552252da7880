"""Minimal repro / bisection for the SDXL-1024 fused-tail fault (TODO r3).

Symptom (r3, one v5e chip): a single fused program scanning more than ~40
SDXL U-Net steps (the --loop_impl scan edit tail) dies with UNAVAILABLE
"kernel fault" or RESOURCE_EXHAUSTED at run time, while the host-dispatched
tail works. `--loop_impl auto` currently downgrades SDXL to chunked dispatch
on a single chip based on that ~40 guess (utils/config.py).

This script isolates the failure to its minimal form — ONE jitted
`ddim_scan` of the SDXL-base U-Net at 1024px bf16, batch 1, no guidance
walk, no direction vmap — and bisects the fused step count, recording for
each N:
  * XLA's compile-time memory analysis (argument/output/temp/alias bytes),
    which says whether the failure tracks a real HBM budget or not;
  * the run outcome (ok / exception type+message).

Usage (on the TPU chip):
    python scripts/repro_sdxl_fused_tail.py [--max 64] [--batch 1]
Prints one JSON line; paste the conclusion into docs/sdxl_fused_tail.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import dataclasses

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, nargs="*", default=None,
                    help="explicit step counts (default: coarse bisect grid)")
    args = ap.parse_args()

    from diffusion_pullback_tpu.models import UNet2DCondition, sdxl_base_unet
    from diffusion_pullback_tpu.models.convert import cast_f32_to_bf16
    from diffusion_pullback_tpu.ops import DiffusionSchedule, ddim_timestep_grid
    from diffusion_pullback_tpu.samplers.ddim_loop import ddim_scan

    cfg = dataclasses.replace(sdxl_base_unet(), dtype="bfloat16",
                              attn_impl="flash")
    unet = UNet2DCondition(cfg)
    B = args.batch
    z = jax.random.normal(jax.random.key(0), (B, 128, 128, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(1), (B, 77, 2048), jnp.float32)
    added = (jax.random.normal(jax.random.key(2), (B, 1280), jnp.float32),
             jnp.broadcast_to(
                 jnp.asarray([[1024., 1024., 0., 0., 1024., 1024.]]), (B, 6)))
    t0c = jnp.float32(0.0)
    params = jax.jit(lambda k: cast_f32_to_bf16(
        unet.init(k, z, t0c, ctx, added_cond=added)))(jax.random.key(3))

    sched = DiffusionSchedule.scaled_linear()
    grid = ddim_timestep_grid(args.max + 1)
    ts_all = grid.timesteps
    tns_all = grid.timesteps_next
    eps = lambda p, q, t: unet.apply(p, q, t, ctx, added_cond=added)

    counts = args.steps or [n for n in (8, 16, 24, 32, 36, 40, 44, 48, 56,
                                        args.max) if n <= args.max]
    out = {"device": str(jax.devices()[0]), "batch": B, "results": {}}
    last_ok, first_bad = None, None
    for n in counts:
        row = {}
        prog = jax.jit(lambda p, q, tt, ttn: ddim_scan(
            lambda x, t: eps(p, x, t), q, sched, tt, ttn)[0])
        ts, tns = ts_all[:n], tns_all[:n]
        try:
            lowered = prog.lower(params, z, ts, tns)
            compiled = lowered.compile()
            try:
                ma = compiled.memory_analysis()
                row["mem"] = {
                    "arg_mb": round(ma.argument_size_in_bytes / 2**20, 1),
                    "out_mb": round(ma.output_size_in_bytes / 2**20, 1),
                    "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
                    "gen_mb": round(getattr(
                        ma, "generated_code_size_in_bytes", 0) / 2**20, 1),
                }
            except Exception as e:
                row["mem"] = f"unavailable: {type(e).__name__}"
        except Exception as e:
            row["compile"] = f"{type(e).__name__}: {e}"[:300]
            out["results"][str(n)] = row
            first_bad = first_bad or n
            print(f"[repro] n={n} COMPILE FAIL", file=sys.stderr, flush=True)
            continue
        try:
            t0 = time.perf_counter()
            res = compiled(params, z, ts, tns)
            np.asarray(jax.numpy.ravel(res)[0])  # hard fence
            row["run_s"] = round(time.perf_counter() - t0, 2)
            row["ok"] = True
            last_ok = n
        except Exception as e:
            row["ok"] = False
            row["error"] = f"{type(e).__name__}: {e}"[:300]
            first_bad = first_bad or n
        out["results"][str(n)] = row
        print(f"[repro] n={n} -> {row.get('ok', 'compile-fail')}",
              file=sys.stderr, flush=True)
    out["last_ok"] = last_ok
    out["first_bad"] = first_bad
    print(json.dumps(out))


if __name__ == "__main__":
    main()
