"""Probe which ingredient of bench config4 / config2-fused kills the
remote tpu_compile_helper (HTTP 500, subprocess exit 1).

Usage: python scripts/probe_compile_faults.py VARIANT
Variants:
  c4_flash_r8   config4 as benched (flash pair, rank 8)  [known fail]
  c4_xla_r8     config4 with xla attention both halves
  c4_flash_r2   config4 flash pair, rank 2
  c4_flash_r8_nofused  flash pair rank 8, fuse_qkv=False (pre-r4 program)
  c3_flash_r8   config3 control (no CFG)                 [known good]
  c2_fused_c2   config2 fused, chunk=2                   [known fail]
  c2_fused_c2_128  same at 128px
  c2_fused_c1   chunk=1 (one probe at a time)
AOT: .lower().compile() only — no execution.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

variant = sys.argv[1]
t_start = time.time()


def done(msg="ok"):
    print(f"[probe] {variant}: {msg} ({time.time()-t_start:.0f}s)", flush=True)


if variant.startswith("c4") or variant.startswith("c3"):
    from diffusion_pullback_tpu.geometry import local_pullback
    from diffusion_pullback_tpu.models import UNet2DCondition, sd21_base_unet
    from diffusion_pullback_tpu.models import TapPoint
    from diffusion_pullback_tpu.models.unet2d_condition import (
        UNet2DCondition as U,
    )

    cfg = sd21_base_unet()
    if variant.endswith("nofused"):
        cfg = dataclasses.replace(cfg, fuse_qkv=False)
    impl_jvp, impl_vjp = ("flash_jvp", "flash")
    if "xla" in variant:
        impl_jvp = impl_vjp = "xla"
    unet_jvp = UNet2DCondition(dataclasses.replace(cfg, attn_impl=impl_jvp))
    unet_vjp = UNet2DCondition(dataclasses.replace(cfg, attn_impl=impl_vjp))
    z = jnp.zeros((1, 64, 64, 4), jnp.float32)
    ctx = jnp.zeros((1, 77, 1024), jnp.float32)
    neg = jnp.zeros((1, 77, 1024), jnp.float32)
    t = jnp.float32(699.3)
    params = jax.eval_shape(
        lambda k: UNet2DCondition(cfg).init(k, z, t, ctx), jax.random.key(2)
    )
    tap = TapPoint("mid", 0)
    enc = lambda u: (lambda p, q, c: u.apply(p, q, t, c, tap, method=U.encode))
    e_jvp, e_vjp = enc(unet_jvp), enc(unet_vjp)
    if variant.startswith("c4"):
        s = 2.5

        def cfgize(e):
            def f(p, q, c):
                b = q.shape[0]
                c2 = jnp.concatenate([
                    jnp.broadcast_to(ctx, (b,) + ctx.shape[1:]),
                    jnp.broadcast_to(neg, (b,) + neg.shape[1:]),
                ], axis=0)
                h2 = e(p, jnp.concatenate([q, q], axis=0), c2)
                return (1.0 + s) * h2[:b] - s * h2[b:]
            return f

        e_jvp, e_vjp = cfgize(e_jvp), cfgize(e_vjp)
    RANK = 2 if "_r2" in variant else 8
    ITERS = 5
    fn = jax.jit(
        lambda p, zz, c, k: local_pullback(
            lambda q: e_jvp(p, q, c),
            zz, k, pca_rank=RANK, min_iter=ITERS, max_iter=ITERS, atol=0.0,
            fn_vjp=lambda q: e_vjp(p, q, c),
        )
    )
    lowered = fn.lower(params, z, ctx, jax.random.key(3))
    print(f"[probe] {variant}: lowered, compiling...", flush=True)
    lowered.compile()
    done()
elif variant.startswith("c2"):
    from diffusion_pullback_tpu.geometry import batched_local_pullback
    from diffusion_pullback_tpu.models import TapPoint, UNet2D, ddpm_celebahq_256

    size = 128 if variant.endswith("_128") else 256
    cfg = ddpm_celebahq_256()
    if size != 256:
        cfg = dataclasses.replace(cfg, sample_size=size)
    model = UNet2D(cfg)
    RANK, ITERS = 8, 5
    B = 8 if "_b8" in variant else 16
    chunk = 1 if variant.endswith("_c1") else 2
    remat = "_remat" in variant
    xb = jnp.zeros((B, size, size, 3), jnp.float32)
    tb = jnp.tile(jnp.asarray([699.3, 999.0], jnp.float32), B // 2)
    params = jax.eval_shape(
        lambda k: model.init(k, xb[:1], tb[0]), jax.random.key(0))
    tap = TapPoint("mid", 0)
    fn = jax.jit(
        lambda p, x1, t1, k1: batched_local_pullback(
            lambda zz: model.apply(p, zz, t1, tap, method=UNet2D.encode),
            x1, k1, pca_rank=RANK, min_iter=ITERS, max_iter=ITERS,
            atol=0.0, chunk_size=chunk, remat=remat,
        )
    )
    lowered = fn.lower(params, xb, tb, jax.random.key(3))
    print(f"[probe] {variant}: lowered, compiling...", flush=True)
    lowered.compile()
    done()
else:
    raise SystemExit(f"unknown variant {variant}")
