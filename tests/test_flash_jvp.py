"""Forward-mode flash attention (VERDICT r1 item 5): the streaming tangent
kernel matches XLA's attention JVP, and the fused custom_jvp/custom_vjp pair
drives local_pullback to the same spectrum/basis as the XLA path.

Kernels run in Pallas interpret mode on the CPU test platform.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.geometry import local_pullback
from diffusion_pullback_tpu.ops.attention import attention, xla_attention
from diffusion_pullback_tpu.ops.pallas.flash_attention import (
    flash_attention,
    flash_attention_jvp,
)


pytestmark = pytest.mark.slow  # heavy e2e/oracle/mesh (make test-all)


def _qkv(sq=1024, sk=1024, h=2, d=64, keys=(0, 1, 2)):
    mk = lambda i, s: jax.random.normal(jax.random.key(i), (1, s, h, d))
    return mk(keys[0], sq), mk(keys[1], sk), mk(keys[2], sk)


def test_jvp_matches_xla():
    q, k, v = _qkv()
    dq, dk, dv = _qkv(keys=(7, 8, 9))
    f_fl = lambda q, k, v: flash_attention_jvp(q, k, v, interpret=True)
    o1, t1 = jax.jvp(f_fl, (q, k, v), (dq, dk, dv))
    o2, t2 = jax.jvp(xla_attention, (q, k, v), (dq, dk, dv))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=5e-5)


def test_vmapped_linearize_matches_xla():
    """The pullback pattern: linearize once, vmap tangents over probes."""
    q, k, v = _qkv()
    _, jvp_fl = jax.linearize(
        lambda q: flash_attention_jvp(q, k, v, interpret=True), q
    )
    _, jvp_ref = jax.linearize(lambda q: xla_attention(q, k, v), q)
    dqs = jax.random.normal(jax.random.key(11), (3,) + q.shape)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(jvp_fl)(dqs)),
        np.asarray(jax.vmap(jvp_ref)(dqs)),
        atol=5e-5,
    )


def test_pullback_with_fused_pair_matches_xla():
    """local_pullback(fn_vjp=...): tangent half through the custom_jvp
    kernel, cotangent half through the custom_vjp flash backward."""
    k1, k2 = jax.random.split(jax.random.key(0))
    W = jax.random.normal(k1, (64, 64)) / 8.0

    def make_f(attn):
        def f(x):  # (1, S, 64) tokens → non-square feature map
            h = jnp.tanh(x @ W)
            q = h.reshape(1, 512, 1, 64)
            o = attn(q, q, q)
            return (o.reshape(1, 512, 64) @ W.T)[:, :32]
        return f

    x = jax.random.normal(k2, (1, 512, 64))
    f_ref = make_f(xla_attention)
    f_jvp = make_f(lambda q, k, v: flash_attention_jvp(q, k, v, interpret=True))
    f_vjp = make_f(lambda q, k, v: flash_attention(q, k, v, interpret=True))

    kw = dict(pca_rank=6, min_iter=3, max_iter=8, atol=1e-6)
    r_ref = local_pullback(f_ref, x, jax.random.key(3), **kw)
    r_fl = local_pullback(f_jvp, x, jax.random.key(3), fn_vjp=f_vjp, **kw)
    np.testing.assert_allclose(
        np.asarray(r_fl.s), np.asarray(r_ref.s), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.abs(np.asarray(r_fl.vT)), np.abs(np.asarray(r_ref.vT)), atol=1e-3
    )


def test_dispatcher_falls_back_for_short_or_irregular():
    """flash/flash_jvp route short self-attention and 77-token
    cross-attention to the XLA path (jvp-capable everywhere)."""
    q, k, v = _qkv(sq=256, sk=256)
    out = attention(q, k, v, impl="flash_jvp")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(xla_attention(q, k, v)), atol=1e-6
    )
    q, k, v = _qkv(sq=4096, sk=77)
    out = attention(q, k, v, impl="flash")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(xla_attention(q, k, v)), atol=1e-6
    )


def test_sd_driver_selects_fused_pair(tmp_path):
    """_pullback_tap_encoders maps 'flash' to the custom_jvp/custom_vjp
    pair and '' to the model's own impl."""
    from diffusion_pullback_tpu.experiments.edit_sd import (
        EditStableDiffusion,
        SDExperimentConfig,
    )

    cfg = SDExperimentConfig(pullback_attn_impl="flash")
    # selection logic only — no weights needed
    drv = object.__new__(EditStableDiffusion)
    drv.cfg = cfg
    drv._jit_cache = {}

    import dataclasses

    from diffusion_pullback_tpu.models import UNet2DCondition
    from diffusion_pullback_tpu.models.configs import UNet2DConditionConfig

    drv.unet = UNet2DCondition(UNet2DConditionConfig())
    from diffusion_pullback_tpu.models.unet2d import TapPoint

    enc, enc_vjp, tag = drv._pullback_tap_encoders(TapPoint("mid", 0))
    assert tag == "flashpair" and enc_vjp is not None
    assert drv._unet_variant("flash_jvp").config.attn_impl == "flash_jvp"

    drv2 = object.__new__(EditStableDiffusion)
    drv2.cfg = SDExperimentConfig()
    drv2._jit_cache = {}
    drv2.unet = drv.unet
    enc, enc_vjp, tag = drv2._pullback_tap_encoders(TapPoint("mid", 0))
    assert tag == "xla" and enc_vjp is None
