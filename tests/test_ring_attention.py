"""Ring attention (parallel/ring_attention.py): sequence-parallel exact
attention over an 'sp' mesh axis. The reference computes its longest
attention (16 384-token SDXL mid block) as one dense O(S²) matmul on one GPU
(SURVEY §5 long-context row); here the same math shards over devices with
ppermute K/V rotation and LSE-merged partials."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.ops.attention import attention, xla_attention
from diffusion_pullback_tpu.parallel import (
    make_mesh,
    ring_attention,
    set_ring_mesh,
)

pytestmark = pytest.mark.slow  # mesh-backed (make test-all)


def _qkv(b=2, sq=256, sk=256, h=2, d=32, key=0, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.key(key), 3)
    return (jax.random.normal(kq, (b, sq, h, d), dtype),
            jax.random.normal(kk, (b, sk, h, d), dtype),
            jax.random.normal(kv, (b, sk, h, d), dtype))


@pytest.fixture(autouse=True)
def _clear_ring_mesh():
    yield
    set_ring_mesh(None)


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_matches_dense(sp):
    q, k, v = _qkv()
    mesh = make_mesh(("sp",), shape={"sp": sp})
    out = ring_attention(q, k, v, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_attention(q, k, v)),
                               atol=2e-5)


def test_rectangular_and_jit():
    q, k, v = _qkv(sq=128, sk=512)
    mesh = make_mesh(("sp",), shape={"sp": 4})
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_attention(q, k, v)),
                               atol=2e-5)


def test_flash_inner_matches(monkeypatch):
    # force the fused Pallas LSE kernel per block (interpret on CPU); the
    # shard-local sequence must stay block-divisible (512/2 = 256)
    q, k, v = _qkv(sq=512, sk=512, d=64)
    mesh = make_mesh(("sp",), shape={"sp": 2})
    out = ring_attention(q, k, v, mesh=mesh, inner="flash", interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_attention(q, k, v)),
                               atol=2e-5)


@pytest.mark.parametrize("sq", [576, 254])
def test_flash_inner_odd_shards(sq):
    """Shard-local sequences that don't tile at 512 must still be correct:
    576/2=288 runs the kernel at a 288 block; 254/2=127 has no usable block
    and silently drops to the XLA inner instead of raising at trace time."""
    q, k, v = _qkv(sq=sq, sk=sq, d=32)
    mesh = make_mesh(("sp",), shape={"sp": 2})
    out = ring_attention(q, k, v, mesh=mesh, inner="flash", interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_attention(q, k, v)),
                               atol=2e-5)


def test_differentiable_both_modes():
    """The xla-inner ring is usable under the pullback: jvp AND vjp match
    the dense path through shard_map + scan + ppermute."""
    q, k, v = _qkv(b=1, sq=64, sk=64, h=1, d=16)
    mesh = make_mesh(("sp",), shape={"sp": 4})
    ring = lambda q, k, v: ring_attention(q, k, v, mesh=mesh, inner="xla")

    g_r = jax.grad(lambda *a: ring(*a).sum(), argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(lambda *a: xla_attention(*a).sum(), argnums=(0, 1, 2))(
        q, k, v)
    for a, b in zip(g_r, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    tangents = _qkv(b=1, sq=64, sk=64, h=1, d=16, key=5)
    o_r, do_r = jax.jvp(ring, (q, k, v), tangents)
    o_x, do_x = jax.jvp(xla_attention, (q, k, v), tangents)
    np.testing.assert_allclose(np.asarray(o_r), np.asarray(o_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(do_r), np.asarray(do_x), atol=3e-5)


def test_composes_with_dp_batch_axis():
    q, k, v = _qkv(b=4)
    mesh = make_mesh(("dp", "sp"), shape={"dp": 2, "sp": 4})
    out = ring_attention(q, k, v, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_attention(q, k, v)),
                               atol=2e-5)


def test_bf16_inputs():
    q, k, v = _qkv(dtype=jnp.bfloat16)
    mesh = make_mesh(("sp",), shape={"sp": 2})
    out = ring_attention(q, k, v, mesh=mesh)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(xla_attention(q, k, v), np.float32), atol=3e-2)


def test_non_divisible_raises():
    q, k, v = _qkv(sq=100, sk=100)
    mesh = make_mesh(("sp",), shape={"sp": 8})
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, mesh=mesh)


class TestDispatcher:
    """attention(impl='ring') — the model-facing wiring."""

    def test_uses_published_mesh(self):
        q, k, v = _qkv()
        set_ring_mesh(make_mesh(("sp",), shape={"sp": 2}))
        out = attention(q, k, v, impl="ring")
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(xla_attention(q, k, v)),
                                   atol=2e-5)

    def test_falls_back_without_mesh(self):
        q, k, v = _qkv()
        set_ring_mesh(None)
        out = attention(q, k, v, impl="ring")
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(xla_attention(q, k, v)),
                                   atol=2e-5)

    def test_falls_back_on_short_context(self):
        # 77-token cross-attention context must not ring (and must not fail
        # on non-divisible lengths)
        q, k, v = _qkv(sq=256, sk=77)
        set_ring_mesh(make_mesh(("sp",), shape={"sp": 8}))
        out = attention(q, k, v, impl="ring")
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(xla_attention(q, k, v)),
                                   atol=2e-5)

    @staticmethod
    def _adm_driver(tmp_path, mesh, attn_impl="xla"):
        import dataclasses

        from diffusion_pullback_tpu.experiments import (
            EditUncondDiffusion,
            UncondExperimentConfig,
        )
        from diffusion_pullback_tpu.models import UNetADM
        from diffusion_pullback_tpu.models.configs import adm_tiny
        from diffusion_pullback_tpu.ops import DiffusionSchedule
        from diffusion_pullback_tpu.utils.datasets import NoiseDataset
        from diffusion_pullback_tpu.utils.logging import JSONLLogger

        cfg = UncondExperimentConfig(
            for_steps=4, inv_steps=4, mesh=mesh,
            result_folder=str(tmp_path / "runs"),
            obs_folder=str(tmp_path / "obs"),
            basis_folder=str(tmp_path / "inputs"),
        )
        model = UNetADM(dataclasses.replace(adm_tiny(16),
                                            attn_impl=attn_impl))
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.float32(0.0))
        return EditUncondDiffusion(
            model, params, DiffusionSchedule.linear(), NoiseDataset(16, n=2),
            cfg, logger=JSONLLogger(path=None, echo=False),
        )

    def test_pullback_paths_map_ring_to_xla_inner(self, tmp_path):
        """With the model sampling impl 'ring' and no explicit
        --pullback_attn_impl, the differentiated paths must select the
        'ring_xla' variant (the accelerator flash inner is primal-only and
        would fail under jax.linearize)."""
        drv = self._adm_driver(
            tmp_path, make_mesh(("sp",), shape={"sp": 2}), attn_impl="ring")
        m_jvp, m_vjp = drv._pullback_models()
        assert m_jvp.config.attn_impl == "ring_xla"
        assert m_vjp is None

    def test_place_weights_clears_stale_ring_mesh(self, tmp_path):
        """A driver whose mesh has no 'sp' axis must clear a previously
        published ring mesh, not ring over it."""
        from diffusion_pullback_tpu.parallel import get_ring_mesh

        set_ring_mesh(make_mesh(("sp",), shape={"sp": 2}))
        self._adm_driver(tmp_path, make_mesh(("dp",), shape={"dp": 2}))
        assert get_ring_mesh()[0] is None

    def test_model_forward_under_sp_mesh(self):
        """A full U-Net forward with attn_impl='ring' under an sp mesh
        matches the xla-impl forward (layers whose sequence is too short
        fall back; the ones that ring must agree)."""
        import dataclasses

        from diffusion_pullback_tpu.models import UNetADM
        from diffusion_pullback_tpu.models.configs import adm_tiny

        cfg = adm_tiny(32)  # attention at ds=2 → 16×16 = 256 tokens
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32)
        t = jnp.float32(300.0)
        model = UNetADM(cfg)
        params = model.init(jax.random.key(0), x, t)
        ref = jax.jit(model.apply)(params, x, t)

        set_ring_mesh(make_mesh(("sp",), shape={"sp": 2}))
        ring_model = UNetADM(dataclasses.replace(cfg, attn_impl="ring"))
        out = jax.jit(ring_model.apply)(params, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
