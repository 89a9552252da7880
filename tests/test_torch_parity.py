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


def test_cross_attention_matches_torch():
    """SD CrossAttention (q from x, kv from context, no qkv bias) vs torch."""
    from diffusion_pullback_tpu.models.transformer2d import CrossAttention

    rng = np.random.default_rng(2)
    B, Sq, Sk, C, Ctx, Hn, Dh = 1, 6, 4, 8, 12, 2, 4
    x = rng.normal(size=(B, Sq, C)).astype(np.float32)
    ctx = rng.normal(size=(B, Sk, Ctx)).astype(np.float32)

    attn = CrossAttention(heads=Hn, head_dim=Dh, out_dim=C)
    params = attn.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(ctx))
    ours = np.asarray(attn.apply(params, jnp.asarray(x), jnp.asarray(ctx)))

    p = params["params"]
    tt = lambda a: torch.tensor(np.asarray(a))
    q = tt(x) @ tt(p["to_q"]["kernel"])
    k = tt(ctx) @ tt(p["to_k"]["kernel"])
    v = tt(ctx) @ tt(p["to_v"]["kernel"])
    inner = Hn * Dh
    qh = q.reshape(B, Sq, Hn, Dh).permute(0, 2, 1, 3)
    kh = k.reshape(B, Sk, Hn, Dh).permute(0, 2, 1, 3)
    vh = v.reshape(B, Sk, Hn, Dh).permute(0, 2, 1, 3)
    probs = torch.softmax(qh @ kh.transpose(-1, -2) / np.sqrt(Dh), dim=-1)
    out = (probs @ vh).permute(0, 2, 1, 3).reshape(B, Sq, inner)
    expect = (out @ tt(p["to_out"]["kernel"]) + tt(p["to_out"]["bias"])).numpy()
    np.testing.assert_allclose(ours, expect, atol=2e-5)


def test_geglu_ff_matches_torch():
    from diffusion_pullback_tpu.models.transformer2d import FeedForward

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 5, 8)).astype(np.float32)
    ff = FeedForward(8)
    params = ff.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(ff.apply(params, jnp.asarray(x)))

    import torch.nn.functional as F

    p = params["params"]
    tt = lambda a: torch.tensor(np.asarray(a))
    h = tt(x) @ tt(p["net_0"]["proj"]["kernel"]) + tt(p["net_0"]["proj"]["bias"])
    a, gate = h.chunk(2, dim=-1)
    h = a * F.gelu(gate)
    expect = (h @ tt(p["net_2"]["kernel"]) + tt(p["net_2"]["bias"])).numpy()
    np.testing.assert_allclose(ours, expect, atol=2e-5)


def test_clip_layer_matches_torch():
    """Pre-LN CLIP encoder layer with causal mask vs a torch re-derivation."""
    from diffusion_pullback_tpu.models.clip_text import CLIPLayer

    rng = np.random.default_rng(4)
    B, S, C, Hn = 1, 5, 8, 2
    x = rng.normal(size=(B, S, C)).astype(np.float32)
    mask = jnp.tril(jnp.ones((S, S), bool))[None, None]

    layer = CLIPLayer(num_heads=Hn, intermediate_size=16, hidden_act="gelu")
    params = layer.init(jax.random.key(0), jnp.asarray(x), mask)
    ours = np.asarray(layer.apply(params, jnp.asarray(x), mask))

    import torch.nn.functional as F

    p = params["params"]
    tt = lambda a: torch.tensor(np.asarray(a))
    xt = tt(x)

    def ln(v, scope):
        return F.layer_norm(v, (C,), tt(p[scope]["scale"]), tt(p[scope]["bias"]))

    def lin(v, scope):
        return v @ tt(p["self_attn"][scope]["kernel"]) + tt(p["self_attn"][scope]["bias"])

    h = ln(xt, "layer_norm1")
    Dh = C // Hn
    q = lin(h, "q_proj").reshape(B, S, Hn, Dh).permute(0, 2, 1, 3)
    k = lin(h, "k_proj").reshape(B, S, Hn, Dh).permute(0, 2, 1, 3)
    v = lin(h, "v_proj").reshape(B, S, Hn, Dh).permute(0, 2, 1, 3)
    logits = q @ k.transpose(-1, -2) / np.sqrt(Dh)
    causal = torch.tril(torch.ones(S, S, dtype=torch.bool))
    logits = logits.masked_fill(~causal, -1e9)
    att = torch.softmax(logits, dim=-1) @ v
    att = att.permute(0, 2, 1, 3).reshape(B, S, C)
    xt = xt + lin(att, "out_proj")
    h = ln(xt, "layer_norm2")
    h = h @ tt(p["fc1"]["kernel"]) + tt(p["fc1"]["bias"])
    h = F.gelu(h)
    h = h @ tt(p["fc2"]["kernel"]) + tt(p["fc2"]["bias"])
    expect = (xt + h).numpy()
    np.testing.assert_allclose(ours, expect, atol=3e-5)
