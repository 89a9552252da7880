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


class TestTunedBlockTable:
    """flash_tuned.json plumbing: kernels consult the per-shape table
    written by `bench.py --flash-tune --apply`; stale entries fall back."""

    def _qkv(self, s, d=128, key=7):
        kq, kk, kv = jax.random.split(jax.random.key(key), 3)
        return (jax.random.normal(kq, (1, s, 1, d), jnp.float32),
                jax.random.normal(kk, (1, s, 1, d), jnp.float32),
                jax.random.normal(kv, (1, s, 1, d), jnp.float32))

    def test_tuned_entry_selects_blocks_and_stays_correct(self, monkeypatch):
        from diffusion_pullback_tpu.ops.pallas import flash_attention as fa

        monkeypatch.setattr(fa, "_TUNED", {"fwd:256x256:d128": (128, 128)})
        assert fa._blocks("fwd", 256, 256, 128) == (128, 128)
        # other kinds/shapes keep the default — in particular the LSE
        # forward (different VMEM profile) must NOT inherit 'fwd' winners
        assert fa._blocks("fwd_lse", 256, 256, 128) == (256, 256)
        assert fa._blocks("bwd", 256, 256, 128) == (256, 256)
        assert fa._blocks("fwd", 512, 512, 128) == (512, 512)
        q, k, v = self._qkv(256)
        out = flash_attention(q, k, v, interpret=True)  # runs at 128×128
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(xla_attention(q, k, v)), atol=2e-5)

    def test_stale_nondivisible_entry_falls_back(self, monkeypatch):
        from diffusion_pullback_tpu.ops.pallas import flash_attention as fa

        monkeypatch.setattr(fa, "_TUNED", {"fwd:192x192:d128": (128, 128)})
        # 192 % 128 != 0 → silently fall back to the clamped default
        assert fa._blocks("fwd", 192, 192, 128) == (192, 192)
        q, k, v = self._qkv(192)
        out = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(xla_attention(q, k, v)), atol=2e-5)

    def test_explicit_nondivisible_blocks_raise(self):
        from diffusion_pullback_tpu.ops.pallas import flash_attention as fa

        with pytest.raises(ValueError, match="not divisible"):
            fa._blocks("fwd", 192, 192, 128, 128, 128)

    def test_diff_kernel_vmem_cap(self, monkeypatch):
        """Table-sourced jvp/bwd tilings above the composed-program-validated
        block product are clamped by halving block_q (block_k stays wide): a
        1024x1024 standalone-sweep winner overflows the 16 MB scoped-VMEM
        stack once the surrounding program (fused QKV, probe vmap) adds its
        share — the r4 AOT compile fault (docs/compile_helper_faults.md).
        fwd keeps its winner (its stack holds ~half the live intermediates)
        and explicit args still win so the sweep can measure anything."""
        from diffusion_pullback_tpu.ops.pallas import flash_attention as fa

        monkeypatch.setattr(fa, "_TUNED", {
            "jvp:4096x4096:d64": (1024, 1024),
            "bwd:4096x4096:d64": (1024, 1024),
            "fwd:4096x4096:d64": (1024, 1024),
            "bwd:1024x1024:d64": (256, 1024),
            "jvp:4096x4096:d128": (512, 2048),
        })
        dflt = (fa._DEFAULT_BLOCK, fa._DEFAULT_BLOCK)
        # 1024x1024 over-cap -> block_q halves once, block_k stays wide
        assert fa._blocks("jvp", 4096, 4096, 64) == (512, 1024)
        assert fa._blocks("bwd", 4096, 4096, 64) == (512, 1024)
        assert fa._blocks("fwd", 4096, 4096, 64) == (1024, 1024)
        # block_k alone exceeds the cap at the minimum block_q -> default
        assert fa._blocks("jvp", 4096, 4096, 128) == dflt
        # at or below the validated product the winner survives
        assert fa._blocks("bwd", 1024, 1024, 64) == (256, 1024)
        # explicit arguments bypass the cap (the sweep uses them)
        assert fa._blocks("jvp", 4096, 4096, 64, 1024, 1024) == (1024, 1024)

    def test_tuned_backward_and_tangent_kernels(self, monkeypatch):
        from diffusion_pullback_tpu.ops.pallas import flash_attention as fa
        from diffusion_pullback_tpu.ops.pallas.flash_attention import (
            flash_attention_jvp,
        )

        monkeypatch.setattr(fa, "_TUNED", {
            "fwd:256x256:d128": (128, 256),
            "bwd:256x256:d128": (128, 128),
            "jvp:256x256:d128": (256, 128),
        })
        q, k, v = self._qkv(256, key=11)
        f_flash = lambda q, k, v: flash_attention(
            q, k, v, interpret=True).sum()
        f_xla = lambda q, k, v: xla_attention(q, k, v).sum()
        g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_flash, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5)
        tangents = self._qkv(256, key=13)
        o_f, do_f = jax.jvp(
            lambda *a: flash_attention_jvp(*a, interpret=True),
            (q, k, v), tangents)
        o_x, do_x = jax.jvp(xla_attention, (q, k, v), tangents)
        np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_x),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(do_f), np.asarray(do_x),
                                   atol=3e-5)

    def test_apply_writes_and_kernels_reload(self, monkeypatch, tmp_path):
        """bench --flash-tune --apply file format round-trips through the
        loader (written dict → _tuned_table → _blocks)."""
        import json as _json

        from diffusion_pullback_tpu.ops.pallas import flash_attention as fa

        path = tmp_path / "flash_tuned.json"
        path.write_text(_json.dumps({"fwd:4096x4096:d64": [1024, 512]}))
        monkeypatch.setattr(fa, "_TUNED_PATH", str(path))
        monkeypatch.setattr(fa, "_TUNED", None)
        assert fa._blocks("fwd", 4096, 4096, 64) == (1024, 512)
        # corrupt file → empty table → defaults
        path.write_text("{broken")
        monkeypatch.setattr(fa, "_TUNED", None)
        assert fa._blocks("fwd", 4096, 4096, 64) == (512, 512)
        # malformed entries (zero/negative/non-int blocks) are dropped
        # individually instead of crashing the kernel call
        path.write_text(_json.dumps({
            "fwd:4096x4096:d64": [0, 512],
            "bwd:4096x4096:d64": ["big", 512],
            "jvp:4096x4096:d64": [1024],
            "fwd:1024x1024:d64": [256, 256],
        }))
        monkeypatch.setattr(fa, "_TUNED", None)
        assert fa._blocks("fwd", 4096, 4096, 64) == (512, 512)
        assert fa._blocks("bwd", 4096, 4096, 64) == (512, 512)
        assert fa._blocks("jvp", 4096, 4096, 64) == (512, 512)
        assert fa._blocks("fwd", 1024, 1024, 64) == (256, 256)
