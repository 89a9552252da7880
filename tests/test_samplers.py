"""Sampler loop tests: scan loops vs step-by-step math, boosting, guidance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.models import TapPoint, UNet2D, ddpm_tiny
from diffusion_pullback_tpu.ops import (
    DiffusionSchedule,
    alpha_bar,
    ddim_step,
    ddim_timestep_grid,
)
from diffusion_pullback_tpu.samplers import (
    ddim_forward,
    ddim_invert,
    performance_boost_etas,
    x_space_guidance_scan,
)


def _tiny_eps_fn():
    cfg = ddpm_tiny(16)
    model = UNet2D(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.key(0), x, jnp.float32(0.0))
    return model, params, lambda z, t: model.apply(params, z, t)


def test_invert_scan_matches_manual_loop():
    """ddim_invert's fused scan must equal the step-by-step Python loop with
    the real (random-init) U-Net. (True round-trip fidelity needs a *trained*
    ε model — adjacent-noise-level ε-consistency — and exact grid pairing is
    already proven with constant ε in test_ddim.)"""
    _, _, eps_fn = _tiny_eps_fn()
    sched = DiffusionSchedule.linear()
    n = 12
    x0 = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 16, 16, 3)) * 0.3, jnp.float32
    )
    inv = ddim_timestep_grid(n, inversion=True)
    xT = jax.jit(lambda x: ddim_invert(eps_fn, x, sched, inv))(x0)
    x = x0
    # the reference inversion loop breaks before its final entry
    # (edit.py:153-154) — ddim_invert scans n−2 of the n−1 grid pairs
    for i in range(inv.num_steps - 1):
        t, tn = inv.timesteps[i], inv.timesteps_next[i]
        et = eps_fn(x, t)
        x = ddim_step(et, x, alpha_bar(sched, t), alpha_bar(sched, tn)).prev_sample
    np.testing.assert_allclose(np.asarray(xT), np.asarray(x), atol=1e-5)
    assert float(jnp.abs(xT - x0).max()) > 0.01  # inversion actually moved


def test_forward_partial_matches_manual_steps():
    _, _, eps_fn = _tiny_eps_fn()
    sched = DiffusionSchedule.linear()
    fwd = ddim_timestep_grid(10)
    xT = jnp.asarray(np.random.default_rng(2).normal(size=(1, 16, 16, 3)), jnp.float32)
    # scan over first 3 steps
    out = ddim_forward(eps_fn, xT, sched, fwd, start_idx=0, end_idx=3)
    # manual
    x = xT
    for i in range(3):
        t, tn = fwd.timesteps[i], fwd.timesteps_next[i]
        et = eps_fn(x, t)
        x = ddim_step(et, x, alpha_bar(sched, t), alpha_bar(sched, tn)).prev_sample
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=2e-4, atol=1e-4)


def test_performance_boost_etas():
    # η=1 from the boost index THROUGH the final step (reference gates on the
    # boost index, not the current step — edit.py:1650)
    etas = performance_boost_etas(10, 7)
    np.testing.assert_array_equal(
        np.asarray(etas), [0, 0, 0, 0, 0, 0, 0, 1, 1, 1]
    )
    assert not np.any(np.asarray(performance_boost_etas(10, None)))
    # the one exception: boost index == last step disables boosting entirely
    np.testing.assert_array_equal(
        np.asarray(performance_boost_etas(10, 9)), np.zeros(10)
    )


def test_boosted_forward_runs_and_differs():
    _, _, eps_fn = _tiny_eps_fn()
    sched = DiffusionSchedule.linear()
    fwd = ddim_timestep_grid(10)
    xT = jnp.asarray(np.random.default_rng(3).normal(size=(1, 16, 16, 3)), jnp.float32)
    det = ddim_forward(eps_fn, xT, sched, fwd)
    sto = ddim_forward(
        eps_fn, xT, sched, fwd, boost_start_idx=5, key=jax.random.key(0)
    )
    assert sto.shape == det.shape
    assert float(jnp.abs(sto - det).max()) > 1e-4  # noise actually injected


def test_x_space_guidance_trajectory():
    _, _, eps_fn = _tiny_eps_fn()
    z0 = jnp.asarray(np.random.default_rng(4).normal(size=(1, 16, 16, 3)), jnp.float32)
    vk = jnp.asarray(np.random.default_rng(5).normal(size=(1, 16, 16, 3)), jnp.float32)
    vk = vk / jnp.linalg.norm(vk)
    t = jnp.float32(500.0)
    traj = x_space_guidance_scan(
        eps_fn, z0, t, vk, num_steps=4, edit_step=1.0, scale=0.1
    )
    assert traj.shape == (5, 1, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(traj[0]), np.asarray(z0))
    # each micro-step must match the manual 2-batch formula
    z = z0
    for i in range(4):
        pair = jnp.concatenate([z, z + 1.0 * vk], axis=0)
        et = eps_fn(pair, t)
        z = z + 0.1 * (et[1:] - et[:1])
        np.testing.assert_allclose(
            np.asarray(traj[i + 1]), np.asarray(z), rtol=2e-4, atol=1e-5
        )


def test_x_space_guidance_split_matches_batch():
    """pair_impl='split' (two B-row evals) is numerics-identical to the
    reference-shaped 2·B batch eval — no cross-batch coupling in the model
    (GroupNorm/attention are per-sample), so the walk trajectories match."""
    _, _, eps_fn = _tiny_eps_fn()
    z0 = jnp.asarray(
        np.random.default_rng(6).normal(size=(1, 16, 16, 3)), jnp.float32)
    vk = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 16, 16, 3)), jnp.float32)
    t = jnp.float32(321.0)
    kw = dict(num_steps=4, edit_step=0.5, scale=0.1)
    batch = x_space_guidance_scan(eps_fn, z0, t, vk, pair_impl="batch", **kw)
    split = x_space_guidance_scan(eps_fn, z0, t, vk, pair_impl="split", **kw)
    np.testing.assert_allclose(
        np.asarray(split), np.asarray(batch), rtol=2e-5, atol=1e-6)


def test_deepcache_interval_one_is_exact():
    """interval=1 refreshes every step → identical to the plain sampler."""
    from diffusion_pullback_tpu.samplers.deepcache import ddim_forward_deepcache

    model, params, eps_fn = _tiny_eps_fn()
    sched = DiffusionSchedule.linear()
    grid = ddim_timestep_grid(8)
    xT = jnp.asarray(np.random.default_rng(7).normal(size=(1, 16, 16, 3)),
                     jnp.float32)
    ref = ddim_forward(eps_fn, xT, sched, grid)
    out = ddim_forward_deepcache(model, params, xT, sched, grid, interval=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=1e-4)


def test_deepcache_reuse_runs_and_approximates():
    from diffusion_pullback_tpu.samplers.deepcache import ddim_forward_deepcache

    model, params, eps_fn = _tiny_eps_fn()
    sched = DiffusionSchedule.linear()
    grid = ddim_timestep_grid(8)
    xT = jnp.asarray(np.random.default_rng(8).normal(size=(1, 16, 16, 3)),
                     jnp.float32)
    ref = ddim_forward(eps_fn, xT, sched, grid)
    out = jax.jit(lambda p, z: ddim_forward_deepcache(
        model, p, z, sched, grid, interval=3))(params, xT)
    assert out.shape == ref.shape
    # different from exact (reuse actually happened) but same scale
    d = float(jnp.abs(out - ref).max())
    assert 0 < d < float(jnp.abs(ref).max())


@pytest.mark.slow
def test_deepcache_cond_interval1_exact_and_interval3_runs():
    """SD-family encoder-reuse sampler: interval=1 matches the exact full
    forward; interval=3 runs and stays close (deep features drift slowly)."""
    import dataclasses

    from diffusion_pullback_tpu.models import UNet2DCondition, sd_tiny_unet
    from diffusion_pullback_tpu.samplers.deepcache import (
        ddim_forward_deepcache_cond,
    )
    from diffusion_pullback_tpu.samplers.ddim_loop import ddim_forward
    from diffusion_pullback_tpu.ops.schedule import (
        DiffusionSchedule,
        ddim_timestep_grid,
    )

    cfg = dataclasses.replace(sd_tiny_unet(8), cross_attention_dim=16)
    model = UNet2DCondition(cfg)
    z = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(1), (1, 5, 16))
    params = model.init(jax.random.key(2), z, jnp.float32(0.0), ctx)
    sched = DiffusionSchedule.scaled_linear()
    grid = ddim_timestep_grid(8)

    exact = ddim_forward(
        lambda q, t: model.apply(params, q, t, ctx), z, sched, grid
    )
    dc1 = ddim_forward_deepcache_cond(
        model, params, z, ctx, sched, grid, interval=1
    )
    np.testing.assert_allclose(np.asarray(dc1), np.asarray(exact),
                               rtol=1e-4, atol=1e-5)
    dc3 = ddim_forward_deepcache_cond(
        model, params, z, ctx, sched, grid, interval=3
    )
    assert dc3.shape == exact.shape
    assert np.isfinite(np.asarray(dc3)).all()


@pytest.mark.slow
def test_deepcache_cond_cfg_interval1_matches_eps_with_math():
    """CFG inside the DeepCache sampler: interval=1 with (neg, cond) fused
    rows reproduces the plain CFG extrapolation e_un + s*(e_c - e_un)."""
    import dataclasses

    from diffusion_pullback_tpu.models import UNet2DCondition, sd_tiny_unet
    from diffusion_pullback_tpu.samplers.deepcache import (
        ddim_forward_deepcache_cond,
    )
    from diffusion_pullback_tpu.samplers.ddim_loop import ddim_forward

    cfg = dataclasses.replace(sd_tiny_unet(8), cross_attention_dim=16)
    model = UNet2DCondition(cfg)
    z = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(1), (1, 5, 16))
    neg = jax.random.normal(jax.random.key(3), (1, 5, 16))
    params = model.init(jax.random.key(2), z, jnp.float32(0.0), ctx)
    sched = DiffusionSchedule.scaled_linear()
    grid = ddim_timestep_grid(6)
    scale = 3.0

    def eps_cfg(q, t):
        b = q.shape[0]
        zz = jnp.concatenate([q, q], axis=0)
        cc = jnp.concatenate([
            jnp.broadcast_to(neg, (b,) + neg.shape[1:]),
            jnp.broadcast_to(ctx, (b,) + ctx.shape[1:]),
        ], axis=0)
        eps = model.apply(params, zz, t, cc)
        e_un, e_c = jnp.split(eps, 2, axis=0)
        return e_un + scale * (e_c - e_un)

    exact = ddim_forward(eps_cfg, z, sched, grid)
    dc1 = ddim_forward_deepcache_cond(
        model, params, z, ctx, sched, grid, interval=1,
        neg_context=neg, guidance_scale=scale,
    )
    np.testing.assert_allclose(np.asarray(dc1), np.asarray(exact),
                               rtol=1e-4, atol=1e-5)
    # interval=3 with CFG runs and stays finite
    dc3 = jax.jit(lambda: ddim_forward_deepcache_cond(
        model, params, z, ctx, sched, grid, interval=3,
        neg_context=neg, guidance_scale=scale,
    ))()
    assert np.isfinite(np.asarray(dc3)).all()
