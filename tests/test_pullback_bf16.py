"""Does the pullback subspace survive bf16 model compute? (perf question:
bf16 tangent passes are ~2x cheaper on the MXU — acceptable iff the
converged subspace still matches f32 at cosine ≥ 0.99.)"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pullback_tpu.geometry import local_pullback
from diffusion_pullback_tpu.models import TapPoint, UNet2D, ddpm_tiny
import pytest


pytestmark = pytest.mark.slow  # heavy e2e/oracle/mesh (make test-all)


def test_bf16_pullback_matches_f32_top_direction():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 3)),
                    jnp.float32)
    t = jnp.float32(400.0)
    tap = TapPoint("mid", 0)

    cfg32 = ddpm_tiny(16)
    m32 = UNet2D(cfg32)
    params = m32.init(jax.random.key(0), x, t)
    m16 = UNet2D(dataclasses.replace(cfg32, dtype="bfloat16"))

    f32 = lambda z: m32.apply(params, z, t, tap, method=UNet2D.encode)
    f16 = lambda z: m16.apply(params, z, t, tap,
                              method=UNet2D.encode).astype(jnp.float32)

    r32 = local_pullback(f32, x, jax.random.key(1), pca_rank=4,
                         min_iter=10, max_iter=25, atol=1e-6)
    r16 = local_pullback(f16, x, jax.random.key(1), pca_rank=4,
                         min_iter=10, max_iter=25, atol=1e-6)
    # top singular value within ~2%, top direction cosine ≥ 0.99
    np.testing.assert_allclose(float(r16.s[0]), float(r32.s[0]), rtol=2e-2)
    cos = abs(float(jnp.dot(r16.vT[0], r32.vT[0])))
    assert cos > 0.99, cos
