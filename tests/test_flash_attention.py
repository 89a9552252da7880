"""Flash attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.ops.attention import xla_attention
from diffusion_pullback_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("sq,sk,h,d", [(256, 256, 1, 128), (512, 256, 2, 128)])
def test_matches_xla(sq, sk, h, d):
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (2, sq, h, d), jnp.float32)
    k = jax.random.normal(kk, (2, sk, h, d), jnp.float32)
    v = jax.random.normal(kv, (2, sk, h, d), jnp.float32)
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_online_softmax_spans_blocks():
    """Values concentrated in the last K block must dominate — verifies the
    running-max/normalizer carry across grid steps."""
    sq = sk = 512
    q = jnp.ones((1, sq, 1, 128), jnp.float32)
    k = jnp.zeros((1, sk, 1, 128), jnp.float32)
    # last block has much higher scores
    k = k.at[:, -256:].set(1.0)
    v = jnp.zeros((1, sk, 1, 128), jnp.float32)
    v = v.at[:, -256:].set(5.0)
    out = flash_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert float(out.mean()) > 4.5  # softmax mass on the hot block


def test_vjp_matches_xla():
    kq, kk, kv = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(kq, (1, 256, 1, 128), jnp.float32)
    k = jax.random.normal(kk, (1, 256, 1, 128), jnp.float32)
    v = jax.random.normal(kv, (1, 256, 1, 128), jnp.float32)

    f_flash = lambda q, k, v: flash_attention(q, k, v, interpret=True).sum()
    f_xla = lambda q, k, v: xla_attention(q, k, v).sum()
    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_blockwise_matches_xla_and_is_differentiable_both_modes():
    from diffusion_pullback_tpu.ops.attention import blockwise_attention

    kq, kk, kv = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(kq, (1, 64, 2, 16), jnp.float32)
    k = jax.random.normal(kk, (1, 128, 2, 16), jnp.float32)
    v = jax.random.normal(kv, (1, 128, 2, 16), jnp.float32)
    ref = xla_attention(q, k, v)
    out = blockwise_attention(q, k, v, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # forward-mode (the pullback requirement) matches xla's jvp
    dq = jax.random.normal(jax.random.key(3), q.shape, jnp.float32)
    _, jvp_b = jax.jvp(lambda qq: blockwise_attention(qq, k, v, block_k=32),
                       (q,), (dq,))
    _, jvp_x = jax.jvp(lambda qq: xla_attention(qq, k, v), (q,), (dq,))
    np.testing.assert_allclose(np.asarray(jvp_b), np.asarray(jvp_x), atol=3e-5)

    # linearize + transpose (the exact pullback pattern)
    _, lin = jax.linearize(lambda qq: blockwise_attention(qq, k, v, block_k=32), q)
    u = lin(dq)
    (w,) = jax.linear_transpose(lin, q)(u)
    assert float(jnp.vdot(u, u)) == pytest.approx(float(jnp.vdot(w, dq)), rel=1e-4)

    # reverse-mode matches too
    g_b = jax.grad(lambda qq: blockwise_attention(qq, k, v, block_k=32).sum())(q)
    g_x = jax.grad(lambda qq: xla_attention(qq, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_x), atol=3e-5)


def test_blockwise_small_seq_falls_back():
    from diffusion_pullback_tpu.ops.attention import blockwise_attention

    q = jax.random.normal(jax.random.key(4), (1, 8, 1, 8), jnp.float32)
    out = blockwise_attention(q, q, q, block_k=1024)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla_attention(q, q, q)),
                               atol=1e-6)


def test_blockwise_non_divisible_seq():
    from diffusion_pullback_tpu.ops.attention import blockwise_attention

    kq, kk, kv = jax.random.split(jax.random.key(9), 3)
    q = jax.random.normal(kq, (1, 48, 1, 8), jnp.float32)
    k = jax.random.normal(kk, (1, 144, 1, 8), jnp.float32)  # 144 % 64 != 0
    v = jax.random.normal(kv, (1, 144, 1, 8), jnp.float32)
    out = blockwise_attention(q, k, v, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla_attention(q, k, v)),
                               atol=2e-5)
