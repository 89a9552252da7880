"""Quickstart — the framework's whole editing flow in one small script.

Covers the surface the reference's Colab notebook (example-code.ipynb, its
only integration artifact) exercises: build a model, invert an image,
discover pullback directions, edit along them, and save PNGs — but offline
(tiny model, deterministic random init) so it runs anywhere in seconds:

    python examples/quickstart.py            # runs on whatever jax sees
    JAX_PLATFORMS=cpu python examples/quickstart.py

For the real thing, use main.py with a model name and (optionally) a
--checkpoint_path; see docs/USAGE.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pullback_tpu.experiments import (
    EditUncondDiffusion,
    UncondExperimentConfig,
)
from diffusion_pullback_tpu.geometry import local_pullback
from diffusion_pullback_tpu.models import TapPoint, UNet2D, ddpm_tiny
from diffusion_pullback_tpu.ops import DiffusionSchedule
from diffusion_pullback_tpu.utils.datasets import NoiseDataset
from diffusion_pullback_tpu.utils.logging import JSONLLogger


def main(outdir="./runs/quickstart"):
    # 1. a model — swap ddpm_tiny for ddpm_celebahq_256 (+ converted
    #    weights) for real work
    model = UNet2D(ddpm_tiny(32))
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.float32(0.0)
    )

    # 2. the pullback metric, standalone: top-4 singular triplets of the
    #    Jacobian of x_t ↦ h(mid tap)
    x_t = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    encode = lambda z: model.apply(
        params, z, jnp.float32(400.0), TapPoint("mid", 0),
        method=UNet2D.encode,
    )
    res = local_pullback(encode, x_t, jax.random.key(2), pca_rank=4,
                         min_iter=4, max_iter=12, atol=1e-4)
    print("singular values:", np.asarray(res.s).round(4),
          f"({int(res.iterations)} iterations)")

    # 3. the full experiment driver: invert → basis (cached) → ±PC
    #    x-space-guidance edits → finish sampling → PNGs
    cfg = UncondExperimentConfig(
        for_steps=8, inv_steps=8, edit_t=0.6, pca_rank=4,
        pullback_min_iter=4, pullback_max_iter=12,
        x_space_guidance_num_step=4, vis_num=2, vis_num_pc=1,
        result_folder=outdir, obs_folder=os.path.join(outdir, "obs"),
        basis_folder=os.path.join(outdir, "inputs"),
    )
    driver = EditUncondDiffusion(
        model, params, DiffusionSchedule.linear(), NoiseDataset(32, n=2),
        cfg, logger=JSONLLogger(os.path.join(outdir, "log.jsonl")),
    )
    names = driver.run_edit_local_encoder_pullback_xt(idx=0)
    print("edit grids written:")
    for n in names:
        print(" ", os.path.join(outdir, n + ".png"))


if __name__ == "__main__":
    main()
