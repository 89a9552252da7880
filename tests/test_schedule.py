"""Schedule/grid parity tests.

Oracles: closed-form math computed independently in numpy/torch (the
reference builds its tables with torch in float64 — utils.py:1243-1281), and
the documented pairing semantics of set_timesteps (utils.py:1182-1195).
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from diffusion_pullback_tpu.ops import (
    DiffusionSchedule,
    alpha_bar,
    ddim_timestep_grid,
)


def test_linear_schedule_matches_torch_f64():
    torch = pytest.importorskip("torch")
    sched = DiffusionSchedule.linear()
    betas = torch.linspace(0.0001, 0.02, 1000, dtype=torch.float64)
    acp = torch.cumprod(1.0 - betas, dim=0)
    np.testing.assert_allclose(np.asarray(sched.betas), betas.numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), acp.numpy(), rtol=1e-6
    )
    assert sched.t_max == 999


def test_cosine_schedule_matches_torch_f64():
    torch = pytest.importorskip("torch")
    s = 0.008
    timesteps = 1000
    x = torch.linspace(0, timesteps, timesteps + 1, dtype=torch.float64)
    ac = torch.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = torch.clip(1 - (ac[1:] / ac[:-1]), 0, 0.999)
    sched = DiffusionSchedule.cosine()
    np.testing.assert_allclose(np.asarray(sched.betas), betas.numpy(), rtol=1e-5)


def test_scaled_linear_schedule():
    sched = DiffusionSchedule.scaled_linear()
    betas = np.linspace(math.sqrt(0.00085), math.sqrt(0.012), 1000) ** 2
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-6)


def test_forward_grid_semantics():
    n = 100
    g = ddim_timestep_grid(n, inversion=False)
    seq = np.linspace(0, 1, n) * 999.0
    # timesteps = reversed(seq[1:]); next = reversed(seq[:-1])
    np.testing.assert_allclose(np.asarray(g.timesteps), seq[1:][::-1], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g.timesteps_next), seq[:-1][::-1], atol=1e-4
    )
    assert g.timesteps.shape == (n - 1,)
    assert float(g.timesteps[0]) == pytest.approx(999.0)
    assert float(g.timesteps_next[-1]) == 0.0


def test_inversion_grid_pairs_with_forward():
    """Inversion traverses the exact same (t, t_next) pairs reversed+swapped."""
    n = 50
    fwd = ddim_timestep_grid(n, inversion=False)
    inv = ddim_timestep_grid(n, inversion=True)
    np.testing.assert_allclose(
        np.asarray(inv.timesteps), np.asarray(fwd.timesteps_next)[::-1], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(inv.timesteps_next), np.asarray(fwd.timesteps)[::-1], atol=2e-3
    )
    # the +1e-6 shift keeps floor() lookups on the same integer grid
    sched = DiffusionSchedule.linear()
    a_fwd = alpha_bar(sched, fwd.timesteps)
    a_inv = alpha_bar(sched, inv.timesteps_next)
    np.testing.assert_allclose(
        np.asarray(a_fwd), np.asarray(a_inv)[::-1], rtol=0, atol=0
    )


def test_alpha_bar_floor_lookup():
    sched = DiffusionSchedule.linear()
    acp = np.asarray(sched.alphas_cumprod)
    assert float(alpha_bar(sched, jnp.float32(998.9))) == acp[998]
    assert float(alpha_bar(sched, jnp.float32(1e-6))) == acp[0]
    out = alpha_bar(sched, jnp.asarray([0.5, 999.0]))
    np.testing.assert_array_equal(np.asarray(out), acp[[0, 999]])
