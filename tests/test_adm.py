"""ADM U-Net tests: learn_sigma head, class conditioning, taps, jvp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.models import TapPoint, UNetADM, adm_tiny
from diffusion_pullback_tpu.ops.ddim import split_learned_sigma

import dataclasses


@pytest.fixture(scope="module")
def adm():
    cfg = adm_tiny(16)
    model = UNetADM(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 3)), jnp.float32)
    t = jnp.float32(137.0)
    params = model.init(jax.random.key(0), x, t)
    return model, params, x, t


def test_learned_sigma_output(adm):
    model, params, x, t = adm
    out = model.apply(params, x, t)
    assert out.shape == (1, 16, 16, 6)  # ε and logvar halves
    et, logvar = split_learned_sigma(out, axis=-1)
    assert et.shape == logvar.shape == (1, 16, 16, 3)


@pytest.mark.parametrize(
    "tap", [TapPoint("down", 0), TapPoint("down", 1), TapPoint("mid", 0),
            TapPoint("up", 0), TapPoint("up", 1)], ids=str
)
def test_adm_encode_decode_composes(adm, tap):
    model, params, x, t = adm
    full = model.apply(params, x, t)
    h, state = model.apply(params, x, t, tap=tap, mode="encode")
    back = model.apply(params, h, state, tap, method=UNetADM.decode_with_state)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(back))


def test_adm_probe_batch(adm):
    model, params, x, t = adm
    tap = TapPoint("mid", 0)
    h, state = model.apply(params, x, t, tap, method=UNetADM.encode_with_state)
    h2 = jnp.concatenate([h, h], axis=0)
    out = model.apply(params, h2, state, tap, method=UNetADM.decode_with_state)
    assert out.shape == (2, 16, 16, 6)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[1]))


def test_adm_jvp_through_encoder(adm):
    model, params, x, t = adm
    tap = TapPoint("mid", 0)
    f = lambda z: model.apply(params, z, t, tap, method=UNetADM.encode)
    h, jvp_fn = jax.linearize(f, x)
    v = jnp.ones_like(x) / x.size
    u = jvp_fn(v)
    assert u.shape == h.shape
    tr = jax.linear_transpose(jvp_fn, x)
    (w,) = tr(u)
    assert float(jnp.vdot(u, u)) == pytest.approx(float(jnp.vdot(w, v)), rel=1e-4)


def test_class_conditional():
    # zero_init=False: ADM zero-modules make emb/label paths invisible at init
    cfg = dataclasses.replace(adm_tiny(16), num_classes=5, zero_init=False)
    model = UNetADM(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.float32(10.0)
    y = jnp.asarray([0, 3])
    params = model.init(jax.random.key(0), x, t, y=y)
    out = model.apply(params, x, t, y=y)
    assert out.shape == (2, 16, 16, 6)
    out_other = model.apply(params, x, t, y=jnp.asarray([1, 3]))
    # class label changes row 0 but not row 1
    assert np.abs(np.asarray(out[0]) - np.asarray(out_other[0])).max() > 1e-7
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out_other[1]),
                               atol=2e-6)


def test_resblock_updown_paths():
    cfg = dataclasses.replace(adm_tiny(16), resblock_updown=True)
    model = UNetADM(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.key(0), x, jnp.float32(5.0))
    out = model.apply(params, x, jnp.float32(5.0))
    assert out.shape == (1, 16, 16, 6)


@pytest.mark.parametrize("pool", ["attention", "adaptive", "spatial",
                                  "spatial_v2"])
def test_encoder_unet_pools(pool):
    """EncoderUNetADM (reference EncoderUNetModel, unet.py:801): every pool
    head yields (B, num_classes) logits and is differentiable wrt x —
    the property classifier guidance needs."""
    from diffusion_pullback_tpu.models import EncoderUNetADM, adm_encoder_tiny

    m = EncoderUNetADM(adm_encoder_tiny(16, pool=pool))
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    t = jnp.float32(10.0)
    p = m.init(jax.random.key(0), x, t)
    out = m.apply(p, x, t)
    assert out.shape == (2, 10)
    g = jax.grad(lambda xx: m.apply(p, xx, t).sum())(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_superres_model_conditions_on_low_res():
    """SuperResUNetADM (reference SuperResModel, unet.py:784): low_res is
    upsampled + channel-concatenated; changing it changes ε."""
    from diffusion_pullback_tpu.models import SuperResUNetADM

    m = SuperResUNetADM(dataclasses.replace(adm_tiny(16), zero_init=False))
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    lr = jax.random.normal(jax.random.key(1), (1, 8, 8, 3))
    p = m.init(jax.random.key(2), x, jnp.float32(5.0), low_res=lr)
    out = m.apply(p, x, jnp.float32(5.0), low_res=lr)
    assert out.shape == (2, 16, 16, 6)  # learned-sigma tiny config
    out2 = m.apply(p, x, jnp.float32(5.0), low_res=lr + 1.0)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6
    with pytest.raises(ValueError):
        m.apply(p, x, jnp.float32(5.0))
