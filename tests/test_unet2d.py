"""UNet2D structural tests: tap/decode composition must equal the plain
forward pass exactly (same traced subgraphs), and the encode sub-graph must be
forward- and reverse-differentiable (the property the pullback kernel needs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.models import TapPoint, UNet2D, ddpm_tiny


@pytest.fixture(scope="module")
def tiny():
    cfg = ddpm_tiny(sample_size=16)
    model = UNet2D(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 3)), jnp.float32)
    t = jnp.float32(500.0)
    params = model.init(jax.random.key(0), x, t)
    return model, params, x, t


def test_forward_shape(tiny):
    model, params, x, t = tiny
    eps = model.apply(params, x, t)
    assert eps.shape == x.shape


ALL_TAPS = [
    TapPoint("down", 0),
    TapPoint("down", 1),
    TapPoint("mid", 0),
    TapPoint("up", 0),
    TapPoint("up", 1),
]


@pytest.mark.parametrize("tap", ALL_TAPS, ids=str)
def test_encode_decode_composes_to_forward(tiny, tap):
    model, params, x, t = tiny
    full = model.apply(params, x, t)
    h, state = model.apply(params, x, t, tap, method=UNet2D.encode_with_state)
    recomposed = model.apply(params, h, state, tap, method=UNet2D.decode_with_state)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(recomposed))


def test_decode_broadcasts_probe_batch(tiny):
    model, params, x, t = tiny
    tap = TapPoint("mid", 0)
    h, state = model.apply(params, x, t, tap, method=UNet2D.encode_with_state)
    h_batch = jnp.concatenate([h, h + 0.01], axis=0)
    eps = model.apply(params, h_batch, state, tap, method=UNet2D.decode_with_state)
    assert eps.shape == (2, 16, 16, 3)
    single = model.apply(params, h, state, tap, method=UNet2D.decode_with_state)
    # batch-1 vs batch-2 runs are different XLA programs; bitwise equality is
    # not guaranteed across batch sizes, closeness is
    np.testing.assert_allclose(np.asarray(eps[:1]), np.asarray(single), atol=1e-5)
    # and the two rows of an identical-rows batch must agree with each other
    eps_same = model.apply(
        params, jnp.concatenate([h, h], axis=0), state, tap,
        method=UNet2D.decode_with_state,
    )
    np.testing.assert_array_equal(np.asarray(eps_same[0]), np.asarray(eps_same[1]))


def test_forward_dh_zero_is_identity(tiny):
    model, params, x, t = tiny
    tap = TapPoint("mid", 0)
    h = model.apply(params, x, t, tap, method=UNet2D.encode)
    eps = model.apply(params, x, t, jnp.zeros_like(h), tap, method=UNet2D.forward_dh)
    full = model.apply(params, x, t)
    np.testing.assert_array_equal(np.asarray(eps), np.asarray(full))


def test_encode_jvp_and_vjp(tiny):
    """jax.linearize through encode: the JVP and its transpose must agree with
    finite differences / dot-product test — the core pullback requirement."""
    model, params, x, t = tiny
    tap = TapPoint("mid", 0)
    f = lambda z: model.apply(params, z, t, tap, method=UNet2D.encode)
    h, jvp_fn = jax.linearize(f, x)
    v = jnp.asarray(np.random.default_rng(1).normal(size=x.shape), jnp.float32)
    v = v / jnp.linalg.norm(v)
    u = jvp_fn(v)
    # finite difference check (central difference, unit probe)
    a = 1e-2
    fd = (f(x + a * v) - f(x - a * v)) / (2 * a)
    np.testing.assert_allclose(np.asarray(u), np.asarray(fd), atol=1e-3)
    # dot-product (adjoint) test: <u, Jv> == <J^T u, v>
    vjp_fn = jax.linear_transpose(jvp_fn, x)
    (w,) = vjp_fn(u)
    lhs = float(jnp.vdot(u, u))
    rhs = float(jnp.vdot(w, v))
    assert lhs == pytest.approx(rhs, rel=1e-4)


def test_encode_mid_skips_up_blocks(tiny):
    """The mid-tap encode graph must not contain up-block or head compute."""
    model, params, x, t = tiny
    f = jax.jit(lambda z: model.apply(params, z, t, TapPoint("mid", 0), method=UNet2D.encode))
    text = f.lower(x).as_text()
    assert "up_blocks" not in text
    assert "conv_out" not in text


def test_invalid_tap_raises(tiny):
    model, params, x, t = tiny
    with pytest.raises(ValueError):
        model.apply(params, x, t, TapPoint("down", 7), method=UNet2D.encode)
    with pytest.raises(ValueError):
        model.apply(params, x, t, TapPoint("sideways", 0), method=UNet2D.encode)


def test_intra_block_taps(tiny):
    """Encode-only taps after a specific resnet / self-attention inside a
    down block (reference down_block_forward surface)."""
    model, params, x, t = tiny
    h_res = model.apply(params, x, t, TapPoint("down", 1, ("res", 0)),
                        method=UNet2D.encode)
    h_attn = model.apply(params, x, t, TapPoint("down", 1, ("attn", 0)),
                         method=UNet2D.encode)
    h_block = model.apply(params, x, t, TapPoint("down", 1),
                          method=UNet2D.encode)
    # res tap is pre-attention; attn tap post-attention; block tap includes
    # everything — all distinct, same spatial shape family
    assert h_res.shape == h_attn.shape
    assert float(jnp.abs(h_res - h_attn).max()) > 1e-6
    assert h_block.shape[-1] == h_attn.shape[-1]
    # jvp works through intra-block taps
    f = lambda z: model.apply(params, z, t, TapPoint("down", 1, ("res", 0)),
                              method=UNet2D.encode)
    _, jvp_fn = jax.linearize(f, x)
    assert jvp_fn(jnp.ones_like(x)).shape == h_res.shape
    # decode from intra-block tap is explicitly unsupported
    hh, state = model.apply(params, x, t, TapPoint("down", 1, ("res", 0)),
                            method=UNet2D.encode_with_state)
    with pytest.raises(NotImplementedError):
        model.apply(params, hh, state, TapPoint("down", 1, ("res", 0)),
                    method=UNet2D.decode_with_state)
