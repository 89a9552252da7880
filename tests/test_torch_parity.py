"""Numerical parity of core blocks against independent torch implementations.

The reference runs on torch; these tests re-express each block's math in
torch (hand-written, minimal) with weights shared through the converter's
layout rules, and require agreement to float tolerance. This pins GroupNorm/
conv/attention semantics — the part the converter round-trip can't check.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diffusion_pullback_tpu.models.layers import (
    ResnetBlock,
    SelfAttention2D,
    timestep_embedding,
)


def test_timestep_embedding_matches_torch():
    """Against the standard diffusers get_timestep_embedding formula."""
    import math

    t = torch.tensor([0.0, 17.5, 999.0], dtype=torch.float32)
    dim, shift = 32, 1.0
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    emb = t[:, None] * torch.exp(exponent)[None]
    expect = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1).numpy()

    ours = timestep_embedding(jnp.asarray(t.numpy()), dim,
                              flip_sin_to_cos=False, downscale_freq_shift=shift)
    np.testing.assert_allclose(np.asarray(ours), expect, atol=1e-5)


def test_resnet_block_matches_torch():
    rng = np.random.default_rng(0)
    B, H, W, C_in, C_out, E = 2, 8, 8, 8, 12, 16
    x = rng.normal(size=(B, H, W, C_in)).astype(np.float32)
    temb = rng.normal(size=(B, E)).astype(np.float32)

    block = ResnetBlock(C_out, norm_num_groups=4, eps=1e-6)
    params = block.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(temb))
    ours = np.asarray(block.apply(params, jnp.asarray(x), jnp.asarray(temb)))

    # torch re-implementation with the same weights
    p = params["params"]
    tt = lambda a: torch.tensor(np.asarray(a))
    conv_w = lambda k: tt(np.transpose(np.asarray(k), (3, 2, 0, 1)))  # HWIO→OIHW
    xt = tt(x).permute(0, 3, 1, 2)
    tembt = tt(temb)

    import torch.nn.functional as F

    h = F.group_norm(xt, 4, tt(p["norm1"]["scale"]), tt(p["norm1"]["bias"]), 1e-6)
    h = F.silu(h)
    h = F.conv2d(h, conv_w(p["conv1"]["kernel"]), tt(p["conv1"]["bias"]), padding=1)
    tp = F.silu(tembt) @ tt(np.asarray(p["time_emb_proj"]["kernel"])) + tt(
        p["time_emb_proj"]["bias"]
    )
    h = h + tp[:, :, None, None]
    h = F.group_norm(h, 4, tt(p["norm2"]["scale"]), tt(p["norm2"]["bias"]), 1e-6)
    h = F.silu(h)
    h = F.conv2d(h, conv_w(p["conv2"]["kernel"]), tt(p["conv2"]["bias"]), padding=1)
    sc = F.conv2d(xt, conv_w(p["conv_shortcut"]["kernel"]),
                  tt(p["conv_shortcut"]["bias"]))
    expect = (sc + h).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, expect, atol=2e-5)


def test_self_attention_matches_torch():
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 4, 4, 8
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)

    attn = SelfAttention2D(num_head_channels=None, norm_num_groups=4, eps=1e-6)
    params = attn.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(attn.apply(params, jnp.asarray(x)))

    p = params["params"]
    tt = lambda a: torch.tensor(np.asarray(a))
    import torch.nn.functional as F

    xt = tt(x).permute(0, 3, 1, 2)
    h = F.group_norm(xt, 4, tt(p["group_norm"]["scale"]),
                     tt(p["group_norm"]["bias"]), 1e-6)
    hseq = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    lin = lambda name, v: v @ tt(np.asarray(p[name]["kernel"])) + tt(p[name]["bias"])
    q, k, v = lin("to_q", hseq), lin("to_k", hseq), lin("to_v", hseq)
    scores = torch.softmax(q @ k.transpose(1, 2) / np.sqrt(C), dim=-1)
    out = lin("to_out", scores @ v)
    expect = (tt(x) + out.reshape(B, H, W, C)).numpy()

    np.testing.assert_allclose(ours, expect, atol=2e-5)
