"""VB loss terms and loss-aware timestep resampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.ops import DiffusionSchedule
from diffusion_pullback_tpu.training.losses import (
    discretized_gaussian_log_likelihood,
    normal_kl,
    q_posterior_mean_logvar,
    vb_term,
)
from diffusion_pullback_tpu.training.resample import (
    init_loss_aware,
    loss_aware_sample_t,
    loss_aware_weights,
    update_loss_aware,
    uniform_sample_t,
)


def test_normal_kl_closed_form():
    # KL(N(0,1)||N(0,1)) = 0 ; KL(N(1,1)||N(0,1)) = 0.5
    assert float(normal_kl(0.0, 0.0, 0.0, 0.0)) == 0.0
    assert float(normal_kl(1.0, 0.0, 0.0, 0.0)) == 0.5


def test_discretized_ll_is_log_prob():
    # for a wide Gaussian the bin likelihood ≈ pdf * bin width (2/255)
    x = jnp.zeros((1,))
    ll = discretized_gaussian_log_likelihood(x, jnp.zeros((1,)), jnp.zeros((1,)))
    expect = np.log((1 / np.sqrt(2 * np.pi)) * (2 / 255))
    np.testing.assert_allclose(float(ll[0]), expect, rtol=1e-3)


def test_q_posterior_matches_ddpm_formulas():
    sched = DiffusionSchedule.linear()
    x0 = jnp.ones((2, 4))
    xt = jnp.full((2, 4), 0.5)
    t = jnp.asarray([100.0, 500.0])
    mean, logvar = q_posterior_mean_logvar(sched, x0, xt, t)
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    for i, ti in enumerate([100, 500]):
        at, atp = acp[ti], acp[ti - 1]
        bt = 1 - at / atp
        c0 = np.sqrt(atp) * bt / (1 - at)
        ct = np.sqrt(1 - bt) * (1 - atp) / (1 - at)
        np.testing.assert_allclose(float(mean[i, 0]), c0 * 1 + ct * 0.5, rtol=1e-4)
        np.testing.assert_allclose(
            float(jnp.exp(logvar[i]).squeeze()), bt * (1 - atp) / (1 - at),
            rtol=1e-3,
        )


def test_vb_term_zero_for_perfect_model():
    """ε̂ = true ε and logvar at the posterior floor → KL ≈ 0."""
    sched = DiffusionSchedule.linear()
    key = jax.random.key(0)
    x0 = jax.random.uniform(key, (2, 8), minval=-0.9, maxval=0.9)
    eps = jax.random.normal(jax.random.key(1), (2, 8))
    t = jnp.asarray([300.0, 700.0])
    at = jnp.asarray([float(sched.alphas_cumprod[300]),
                      float(sched.alphas_cumprod[700])])[:, None]
    xt = jnp.sqrt(at) * x0 + jnp.sqrt(1 - at) * eps
    vb = vb_term(sched, x0, xt, t, eps, jnp.full_like(x0, -1.0))
    assert float(jnp.abs(vb).max()) < 1e-3, vb
    # wrong ε → positive KL
    vb_bad = vb_term(sched, x0, xt, t, eps + 1.0, jnp.full_like(x0, -1.0))
    assert float(vb_bad.min()) > float(jnp.abs(vb).max())


def test_uniform_sampler():
    t, w = uniform_sample_t(jax.random.key(0), 512, 1000)
    assert t.shape == (512,) and int(t.min()) >= 0 and int(t.max()) < 1000
    np.testing.assert_array_equal(np.asarray(w), np.ones(512))


def test_loss_aware_resampler_prefers_lossy_timesteps():
    T, H = 10, 4
    state = init_loss_aware(T, H)
    # uniform until warmed
    np.testing.assert_allclose(np.asarray(loss_aware_weights(state)),
                               np.full(T, 0.1), rtol=1e-6)
    # fill history: timestep 3 has 10x the loss of others
    for _ in range(H):
        t = jnp.arange(T)
        losses = jnp.where(t == 3, 10.0, 1.0)
        state = update_loss_aware(state, t, losses)
    w = np.asarray(loss_aware_weights(state))
    assert w[3] > 5 * w[0]
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
    t, iw = loss_aware_sample_t(state, jax.random.key(1), 2048)
    frac3 = float((np.asarray(t) == 3).mean())
    assert frac3 > 0.3  # heavily oversampled
    # importance weights undo the bias in expectation: E[w] ≈ 1
    np.testing.assert_allclose(float(iw.mean()), 1.0, atol=0.15)


def test_ring_buffer_update():
    state = init_loss_aware(4, 2)
    state = update_loss_aware(state, jnp.asarray([1, 1, 1]),
                              jnp.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_array_equal(np.asarray(state.history[1]), [2.0, 3.0])
    assert int(state.counts[1]) == 2


@pytest.mark.slow
def test_hybrid_objective_and_loss_aware_step():
    import optax

    from diffusion_pullback_tpu.models import UNetADM, adm_tiny
    from diffusion_pullback_tpu.training import create_train_state, make_train_step

    import dataclasses

    cfg = dataclasses.replace(adm_tiny(16), zero_init=False)
    model = UNetADM(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.key(0), x, jnp.float32(0.0))
    sched = DiffusionSchedule.linear()
    opt = optax.adam(1e-4)
    state = create_train_state(params, opt)
    step = make_train_step(
        lambda p, xt, t: model.apply(p, xt, t), sched, opt,
        learn_sigma_vb_weight=0.001, loss_aware=True,
    )
    sampler = init_loss_aware(sched.num_train_timesteps, history_per_term=2)
    batch = jax.random.normal(jax.random.key(1), (4, 16, 16, 3)) * 0.5
    state, metrics, sampler = jax.jit(step)(state, batch, jax.random.key(2), sampler)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    assert int(sampler.counts.sum()) == 4  # history recorded


@pytest.mark.slow
def test_gradient_accumulation_via_multisteps():
    """Microbatching (vendored TrainLoop's forward_backward loop) is
    optax.MultiSteps composed with the same train step: k sub-batches
    accumulate before one parameter update."""
    import optax

    from diffusion_pullback_tpu.models import UNet2D, ddpm_tiny
    from diffusion_pullback_tpu.training import create_train_state, make_train_step

    model = UNet2D(ddpm_tiny(16))
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.float32(0.0))
    sched = DiffusionSchedule.linear()
    opt = optax.MultiSteps(optax.sgd(1e-2), every_k_schedule=2)
    state = create_train_state(params, opt)
    step = make_train_step(lambda p, xt, t: model.apply(p, xt, t), sched, opt,
                           ema_rate=0.0)
    b = jnp.ones((2, 16, 16, 3)) * 0.1
    s1, _ = jax.jit(step)(state, b, jax.random.key(1))
    # first micro-step: gradients accumulated, params unchanged
    d1 = max(jax.tree.leaves(jax.tree.map(
        lambda a, c: float(jnp.abs(a - c).max()), s1.params, state.params)))
    assert d1 == 0.0
    s2, _ = jax.jit(step)(s1, b, jax.random.key(2))
    d2 = max(jax.tree.leaves(jax.tree.map(
        lambda a, c: float(jnp.abs(a - c).max()), s2.params, state.params)))
    assert d2 > 0.0  # second micro-step applied the accumulated update


@pytest.mark.slow
def test_gradient_accumulation_in_jit_scan():
    """accum_steps>1 scans microbatches inside one compiled step (the
    reference's forward_backward microbatch loop, train_util.py, without
    per-microbatch dispatch): one optimizer apply per call."""
    import optax

    from diffusion_pullback_tpu.models import UNet2D, ddpm_tiny
    from diffusion_pullback_tpu.training import create_train_state, make_train_step

    model = UNet2D(ddpm_tiny(16))
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.float32(0.0))
    sched = DiffusionSchedule.linear()
    opt = optax.sgd(1e-2)
    state = create_train_state(params, opt)
    step = make_train_step(lambda p, xt, t: model.apply(p, xt, t), sched, opt,
                           ema_rate=0.0, accum_steps=2)
    b = jnp.ones((4, 16, 16, 3)) * 0.1
    s1, m = jax.jit(step)(state, b, jax.random.key(1))
    assert int(m["step"]) == 1 and np.isfinite(float(m["loss"]))
    delta = max(jax.tree.leaves(jax.tree.map(
        lambda a, c: float(jnp.abs(a - c).max()), s1.params, state.params)))
    assert delta > 0.0  # a single call applied the accumulated update

    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        step(state, jnp.ones((3, 16, 16, 3)), jax.random.key(1))


def test_multi_rate_ema():
    """ema_rate as a tuple keeps one EMA copy per rate (the reference's
    comma-separated ema_rate list, train_util.py:58-62)."""
    import optax

    from diffusion_pullback_tpu.models import UNet2D, ddpm_tiny
    from diffusion_pullback_tpu.training import create_train_state, make_train_step

    model = UNet2D(ddpm_tiny(16))
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.float32(0.0))
    sched = DiffusionSchedule.linear()
    opt = optax.sgd(1e-2)
    rates = (0.0, 0.5)
    state = create_train_state(params, opt, n_ema=len(rates))
    step = make_train_step(lambda p, xt, t: model.apply(p, xt, t), sched, opt,
                           ema_rate=rates)
    b = jnp.ones((2, 16, 16, 3)) * 0.1
    s1, _ = jax.jit(step)(state, b, jax.random.key(1))
    assert isinstance(s1.ema_params, tuple) and len(s1.ema_params) == 2
    # rate 0.0 tracks the live params exactly
    d0 = max(jax.tree.leaves(jax.tree.map(
        lambda a, c: float(jnp.abs(a - c).max()), s1.ema_params[0], s1.params)))
    assert d0 == 0.0
    # rate 0.5 sits strictly between the old and new params
    mid = jax.tree.map(lambda a, c: 0.5 * (a + c), state.params, s1.params)
    d5 = max(jax.tree.leaves(jax.tree.map(
        lambda a, c: float(jnp.abs(a - c).max()), s1.ema_params[1], mid)))
    assert d5 < 1e-6

    import pytest

    # a length-1 tuple is the scalar case: works against the bare
    # (n_ema=1) state instead of crashing on the tuple branch
    state1 = create_train_state(params, opt)
    step1 = make_train_step(lambda p, xt, t: model.apply(p, xt, t), sched,
                            opt, ema_rate=(0.5,))
    s2, _ = jax.jit(step1)(state1, b, jax.random.key(1))
    assert not isinstance(s2.ema_params, tuple)
    # rate-count / EMA-copy-count mismatch raises instead of silently
    # zip-truncating an EMA copy
    bad = make_train_step(lambda p, xt, t: model.apply(p, xt, t), sched,
                          opt, ema_rate=(0.1, 0.2, 0.3))
    with pytest.raises(ValueError, match="EMA copies"):
        jax.jit(bad)(state, b, jax.random.key(1))
