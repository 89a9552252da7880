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


def synth_params(init_fn):
    """Deterministic parameters from SHAPES only (jax.eval_shape), skipping
    the real flax init: on a 1-core CI host even the tiny smoke model's
    eager/jitted init costs ~31 s of Python dispatch / XLA compile, while
    eval_shape is 0.4 s. Leaves are seeded per parameter path (crc32 of the
    key string) so the values are platform- and order-independent; kernels
    get LeCun-ish fan-in scaling, 1-D leaves (norm scales/biases) get
    1 + 0.05·N / 0.05·N so activations stay well-conditioned."""
    import zlib

    shapes = jax.eval_shape(init_fn)
    flat = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, aval in flat[0]:
        key = jax.tree_util.keystr(path)
        rng = np.random.RandomState(zlib.crc32(key.encode()) & 0x7FFFFFFF)
        noise = rng.standard_normal(aval.shape).astype(np.float32)
        if aval.ndim <= 1:
            base = 1.0 if key.rsplit("'", 2)[-2:-1] == ["scale"] else 0.0
            leaf = base + 0.05 * noise
        else:
            fan_in = int(np.prod(aval.shape[:-1]))
            leaf = noise / np.sqrt(max(fan_in, 1))
        leaves.append(jnp.asarray(leaf, aval.dtype))
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def compute_config1_smoke_artifacts():
    """Reduced config-1 pipeline for the FAST gate (VERDICT r4 item 5): the
    same invert → pullback → guidance-walk → finish structure on a tiny
    U-Net (32px, 8-step grid, r=4×3) so the default (-m 'not slow') suite
    exercises the edit path end-to-end in seconds, not minutes. Gates are
    identical to the full golden (σ rtol, subspace cos, PSNR)."""
    from diffusion_pullback_tpu.geometry import local_pullback
    from diffusion_pullback_tpu.models import TapPoint, UNet2D
    from diffusion_pullback_tpu.models.configs import ddpm_tiny
    from diffusion_pullback_tpu.ops import DiffusionSchedule, ddim_timestep_grid
    from diffusion_pullback_tpu.samplers import ddim_forward, x_space_guidance_scan
    from diffusion_pullback_tpu.samplers.ddim_loop import ddim_invert

    model = UNet2D(ddpm_tiny(32))
    sched = DiffusionSchedule.linear()
    x0 = jax.random.normal(jax.random.key(1), (1, 32, 32, 3), jnp.float32)
    grid8 = ddim_timestep_grid(8)
    edit_idx = 2  # ~0.7T on the 8-grid
    t_edit = grid8.timesteps[edit_idx]
    params = synth_params(lambda: model.init(jax.random.key(0), x0, t_edit))

    # stages are jitted SEPARATELY: one fused program traces the U-Net ~6x
    # into a single XLA module and CPU compile goes superlinear (>100 s);
    # four small programs keep the fast gate under a minute
    eps_of = lambda p: (lambda q, t: model.apply(p, q, t))

    @jax.jit
    def invert_stage(p, z):
        eps = eps_of(p)
        xT = ddim_invert(eps, z, sched, grid8)
        return ddim_forward(eps, xT, sched, grid8, end_idx=edit_idx)

    @jax.jit
    def pull_stage(p, xt, k):
        return local_pullback(
            lambda zz: model.apply(p, zz, t_edit, TapPoint("mid", 0),
                                   method=UNet2D.encode),
            xt, k, pca_rank=4, min_iter=3, max_iter=3, atol=0.0,
        )

    @jax.jit
    def edit_stage(p, xt, vk):
        eps = eps_of(p)
        traj = x_space_guidance_scan(
            eps, xt, t_edit, vk, num_steps=4, edit_step=0.1, scale=0.1,
        )
        return ddim_forward(eps, traj[-1], sched, grid8, start_idx=edit_idx)

    xt = invert_stage(params, x0)
    res = pull_stage(params, xt, jax.random.key(2))
    vk = res.vT[0].reshape(1, 32, 32, 3)
    x0_edit = edit_stage(params, xt, vk)
    img = np.asarray(jnp.clip(x0_edit * 0.5 + 0.5, 0.0, 1.0), np.float32)
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
    smoke = compute_config1_smoke_artifacts()
    np.savez(os.path.join(out_dir, "config1_smoke_basis.npz"),
             u_norms=smoke["u_norms"], s=smoke["s"], vT=smoke["vT"])
    np.save(os.path.join(out_dir, "config1_smoke_edit.npy"), smoke["edit"])
    if "--smoke-only" in sys.argv:
        print("smoke goldens written to", out_dir)
        print("smoke s:", smoke["s"].round(4))
        return
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
