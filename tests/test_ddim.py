"""DDIM step math tests against closed forms and round-trip identities."""

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_pullback_tpu.ops import (
    DiffusionSchedule,
    alpha_bar,
    ddim_step,
    ddim_timestep_grid,
    ddpm_step_learned_sigma,
    predict_x0,
)
from diffusion_pullback_tpu.ops.schedule import beta as beta_lookup


def test_deterministic_step_closed_form():
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.normal(size=(1, 3, 8, 8)), dtype=jnp.float32)
    et = jnp.asarray(rng.normal(size=(1, 3, 8, 8)), dtype=jnp.float32)
    at, at_next = jnp.float32(0.5), jnp.float32(0.7)
    out = ddim_step(et, xt, at, at_next)
    p = (xt - et * np.sqrt(0.5)) / np.sqrt(0.5)
    expect = np.sqrt(0.7) * p + np.sqrt(0.3) * et
    np.testing.assert_allclose(np.asarray(out.prev_sample), np.asarray(expect), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.pred_original), np.asarray(p), rtol=1e-5)


def test_traced_eta_zero_equals_deterministic():
    rng = np.random.default_rng(1)
    xt = jnp.asarray(rng.normal(size=(2, 4)), dtype=jnp.float32)
    et = jnp.asarray(rng.normal(size=(2, 4)), dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=(2, 4)), dtype=jnp.float32)
    at, at_next = jnp.float32(0.31), jnp.float32(0.55)
    det = ddim_step(et, xt, at, at_next)
    sto = ddim_step(et, xt, at, at_next, eta=jnp.float32(0.0), noise=noise)
    np.testing.assert_allclose(
        np.asarray(det.prev_sample), np.asarray(sto.prev_sample), rtol=1e-6
    )


def test_eta_one_variance_decomposition():
    """η=1: removed direction variance + added noise variance = 1 - ᾱ_next."""
    at, at_next = 0.31, 0.55
    sigma2 = (1 - at / at_next) * (1 - at_next) / (1 - at)
    xt = jnp.ones((1, 4))
    et = jnp.ones((1, 4))
    z = jnp.zeros((1, 4))
    out = ddim_step(et, xt, jnp.float32(at), jnp.float32(at_next), eta=1.0, noise=z)
    p = (1 - np.sqrt(1 - at)) / np.sqrt(at)
    expect = np.sqrt(at_next) * p + np.sqrt(1 - at_next - sigma2)
    np.testing.assert_allclose(np.asarray(out.prev_sample)[0, 0], expect, rtol=1e-5)


def test_inversion_forward_round_trip_constant_eps():
    """With a constant ε model, inversion followed by forward sampling over the
    paired grids is an exact round trip (the reference's fidelity trick)."""
    sched = DiffusionSchedule.linear()
    n = 20
    inv = ddim_timestep_grid(n, inversion=True)
    fwd = ddim_timestep_grid(n, inversion=False)
    eps = jnp.full((1, 2, 4, 4), 0.3, dtype=jnp.float32)
    x0 = jnp.asarray(np.random.default_rng(2).normal(size=(1, 2, 4, 4)), jnp.float32)

    def invert(x, _):
        def body(carry, tp):
            t, tn = tp
            x = carry
            out = ddim_step(eps, x, alpha_bar(sched, t), alpha_bar(sched, tn))
            return out.prev_sample, None
        return jax.lax.scan(body, x, (inv.timesteps, inv.timesteps_next))

    xT, _ = invert(x0, None)

    def forward(x):
        def body(carry, tp):
            t, tn = tp
            out = ddim_step(eps, carry, alpha_bar(sched, t), alpha_bar(sched, tn))
            return out.prev_sample, None
        y, _ = jax.lax.scan(body, x, (fwd.timesteps, fwd.timesteps_next))
        return y

    x0_rec = forward(xT)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_learned_sigma_step():
    sched = DiffusionSchedule.linear()
    t = jnp.float32(500.0)
    at = alpha_bar(sched, t)
    bt = beta_lookup(sched, t)
    xt = jnp.ones((1, 3))
    et = jnp.full((1, 3), 0.5)
    logvar = jnp.zeros((1, 3))
    z = jnp.ones((1, 3))
    out = ddpm_step_learned_sigma(et, logvar, xt, at, bt, z)
    mean = (1.0 - float(bt) / np.sqrt(1 - float(at)) * 0.5) / np.sqrt(1 - float(bt))
    np.testing.assert_allclose(np.asarray(out.prev_sample)[0, 0], mean + 1.0, rtol=1e-5)


def test_predict_x0_inverts_q_sample():
    """x_t = sqrt(ᾱ)x0 + sqrt(1-ᾱ)ε  ⇒  predict_x0 recovers x0 exactly."""
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
    ep = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
    at = jnp.float32(0.42)
    xt = jnp.sqrt(at) * x0 + jnp.sqrt(1 - at) * ep
    np.testing.assert_allclose(np.asarray(predict_x0(ep, xt, at)), np.asarray(x0), atol=1e-5)


def test_split_learned_sigma_default_channels_last():
    """Default split axis is the trailing (NHWC) channel axis; negative and
    explicit positive axes agree."""
    from diffusion_pullback_tpu.ops import split_learned_sigma

    x = jnp.concatenate(
        [jnp.ones((2, 4, 4, 3)), 5.0 * jnp.ones((2, 4, 4, 3))], axis=-1
    )
    et, logvar = split_learned_sigma(x)
    assert et.shape == logvar.shape == (2, 4, 4, 3)
    assert float(et.mean()) == 1.0 and float(logvar.mean()) == 5.0
    et2, logvar2 = split_learned_sigma(x, axis=3)
    np.testing.assert_array_equal(np.asarray(et), np.asarray(et2))
    np.testing.assert_array_equal(np.asarray(logvar), np.asarray(logvar2))
