"""Generate the config-1 golden artifacts for the cross-round regression test.

Runs the BASELINE config-1 workload (CelebA-HQ-256 DDPM arch, deterministic
random-init weights, mid-tap top-PC pullback + 16-micro-step guidance +
20-step DDIM finish) with FIXED seeds on CPU f32 and stores:

    tests/goldens/config1_basis.npz   (u-norms, s, vT of the r=8 pullback)
    tests/goldens/config1_edit.npy    (final edited image, [0,1] f32)
    tests/goldens/config1_edit.png    (the PNG artifact, for eyeballs)

tests/test_golden_config1.py recomputes the same pipeline and asserts
PSNR/cosine against these files — the drop-in acceptance harness for real
released weights (swap random init for converted checkpoints), replacing
the reference's eyeball QC (/root/reference/src/modules/edit.py:667-676).

Regenerate ONLY when an intentional numerical change lands; the diff of
this file + the new goldens is the auditable record of that change.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force_cpu():
    """Goldens are DEFINED as CPU f32 (the platform the regression test runs
    on); force cpu even when the shell exports JAX_PLATFORMS=axon/tpu. Called
    from main() only — importing compute_config1_artifacts (as the regression
    test does) must not mutate an already-initialized backend (ADVICE r4)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")


def compute_config1_artifacts():
    """The deterministic config-1 pipeline shared by the generator and the
    regression test (import from here so they can never drift apart)."""
    from diffusion_pullback_tpu.geometry import local_pullback
    from diffusion_pullback_tpu.models import TapPoint, UNet2D, ddpm_celebahq_256
    from diffusion_pullback_tpu.ops import DiffusionSchedule, ddim_timestep_grid
    from diffusion_pullback_tpu.samplers import ddim_forward, x_space_guidance_scan

    model = UNet2D(ddpm_celebahq_256())
    sched = DiffusionSchedule.linear()
    x = jax.random.normal(jax.random.key(1), (1, 256, 256, 3), jnp.float32)
    t_edit = jnp.float32(699.3)
    params = jax.jit(lambda k: model.init(k, x, t_edit))(jax.random.key(0))

    tap = TapPoint("mid", 0)
    res = jax.jit(
        lambda p, z, k: local_pullback(
            lambda zz: model.apply(p, zz, t_edit, tap, method=UNet2D.encode),
            z, k, pca_rank=8, min_iter=5, max_iter=5, atol=0.0,
        )
    )(params, x, jax.random.key(2))

    grid20 = ddim_timestep_grid(20)
    edit_idx = 6
    vk = res.vT[0].reshape(1, 256, 256, 3)

    def edit(p, z, v):
        eps = lambda q, t: model.apply(p, q, t)
        traj = x_space_guidance_scan(
            eps, z, grid20.timesteps[edit_idx], v,
            num_steps=16, edit_step=0.1, scale=0.1,
        )
        return ddim_forward(eps, traj[-1], sched, grid20, start_idx=edit_idx)

    x0 = jax.jit(edit)(params, x, vk)
    img = np.asarray(jnp.clip(x0 * 0.5 + 0.5, 0.0, 1.0), np.float32)
    return {
        "u_norms": np.asarray(jnp.linalg.norm(res.u, axis=0), np.float32),
        "s": np.asarray(res.s, np.float32),
        "vT": np.asarray(res.vT, np.float32),
        "edit": img,
    }


def main():
    _force_cpu()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    art = compute_config1_artifacts()
    np.savez(os.path.join(out_dir, "config1_basis.npz"),
             u_norms=art["u_norms"], s=art["s"], vT=art["vT"])
    np.save(os.path.join(out_dir, "config1_edit.npy"), art["edit"])
    try:
        from diffusion_pullback_tpu.utils.images import save_image_grid

        png = np.clip(art["edit"] * 255.0 + 0.5, 0, 255).astype(np.uint8)
        save_image_grid(png, os.path.join(out_dir, "config1_edit.png"),
                        normalize=False)
    except Exception as e:  # PNG is for eyeballs only; npy is the golden
        print(f"png skipped: {e}", file=sys.stderr)
    print("goldens written to", out_dir)
    print("s:", art["s"].round(4))


if __name__ == "__main__":
    main()
