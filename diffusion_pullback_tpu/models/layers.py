"""Shared Flax building blocks for the diffusion U-Net family.

Architecturally equivalent to the blocks used by the reference's model layer
(diffusers UNet2DModel / UNet2DConditionModel internals and the custom DDPM
U-Net at /root/reference/src/models/ddpm/diffusion.py:816-966), re-written
TPU-first:

  - NHWC layout everywhere (channel-last feeds the MXU/conv units natively;
    the torch reference is NCHW).
  - attention runs through ops.attention (f32 softmax, Pallas-ready dispatch).
  - all modules are pure functions of (params, inputs) — no monkey-patching;
    feature taps live in the U-Net drivers, not here.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention


class DenseParams(nn.Module):
    """Parameter holder matching ``nn.Dense``'s tree exactly (``kernel`` +
    optional ``bias`` under this module's name) without binding the matmul.

    Used by :func:`project_qkv` to fuse the q/k/v projections into one MXU
    dot while keeping the torch-checkpoint param layout (``to_q/kernel`` …)
    that models/convert.py and parallel/tp.py key on. Init streams are
    path-derived in Flax, so values are identical to the unfused
    ``nn.Dense`` layout — goldens and seeded tests are unaffected.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias else None
        )
        return kernel, bias


def project_qkv(
    x: jax.Array,
    context: Optional[jax.Array],
    inner: int,
    *,
    use_bias: bool,
    dtype,
    precision,
    fuse: bool = True,
):
    """q/k/v projections with same-operand matmuls fused into one dot.

    Self-attention (``context is None``): one ``(B,S,C)×(C,3·inner)`` matmul
    instead of three ``(C,inner)`` ones — fewer, larger MXU dispatches and
    less lane padding when ``inner`` is not a multiple of 128 (SD's 320-ch
    level pads 320→384 per projection but 960→1024 fused). Cross-attention
    fuses k/v over the context operand. The concatenation reassociates
    nothing: each output column sees exactly the weights it would unfused.

    Must be called from a parent module's ``@nn.compact`` ``__call__``.
    With ``fuse=False`` emits the three separate dots (one activation per
    projection — what a Megatron-sharded kernel layout prefers, see
    parallel/tp.py).

    Returns q, k, v of shape (B, S, inner), cast to ``dtype``.
    """
    self_attn = context is None
    ctx = x if self_attn else context
    wq, bq = DenseParams(inner, use_bias, name="to_q")(x.shape[-1])
    wk, bk = DenseParams(inner, use_bias, name="to_k")(ctx.shape[-1])
    wv, bv = DenseParams(inner, use_bias, name="to_v")(ctx.shape[-1])
    x = x.astype(dtype)
    ctx = ctx.astype(dtype)
    dot = lambda a, w: jax.lax.dot_general(
        a, w.astype(dtype), (((a.ndim - 1,), (0,)), ((), ())),
        precision=precision,
    )
    if not fuse:
        q, k, v = dot(x, wq), dot(ctx, wk), dot(ctx, wv)
    elif self_attn:
        qkv = dot(x, jnp.concatenate([wq, wk, wv], axis=1))
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = dot(x, wq)
        kv = dot(ctx, jnp.concatenate([wk, wv], axis=1))
        k, v = jnp.split(kv, 2, axis=-1)
    if use_bias:
        add = lambda h, b: h + b.astype(dtype)
        q, k, v = add(q, bq), add(k, bk), add(v, bv)
    return q, k, v


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep features; matches diffusers' `get_timestep_embedding`.

    timesteps: (B,) float or int → (B, dim) float32.
    """
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    if flip_sin_to_cos:
        emb = jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)
    else:
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedMLP(nn.Module):
    """Two-layer MLP lifting sinusoidal features to the conditioning vector."""

    embed_dim: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, t_feat: jax.Array) -> jax.Array:
        dense = lambda name: nn.Dense(
            self.embed_dim, dtype=self.dtype, precision=self.precision, name=name
        )
        h = dense("linear_1")(t_feat.astype(self.dtype))
        h = nn.silu(h)
        return dense("linear_2")(h)


class ResnetBlock(nn.Module):
    """GN → silu → conv → (+temb) → GN → silu → dropout → conv, with skip.

    Pre-norm ResnetBlock2D semantics (channel-last).
    """

    out_channels: int
    norm_num_groups: int = 32
    eps: float = 1e-6
    dropout: float = 0.0
    use_conv_shortcut: bool = False  # 3x3 shortcut conv (custom-DDPM style)
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(
        self, x: jax.Array, temb: Optional[jax.Array], deterministic: bool = True
    ) -> jax.Array:
        conv = lambda ks, name: nn.Conv(
            self.out_channels, ks, padding=ks[0] // 2,
            dtype=self.dtype, precision=self.precision, name=name,
        )
        gn = lambda name: nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.eps,
            dtype=self.dtype, name=name,
        )
        in_ch = x.shape[-1]
        h = gn("norm1")(x)
        h = nn.silu(h)
        h = conv((3, 3), "conv1")(h)
        if temb is not None:
            temb_proj = nn.Dense(
                self.out_channels, dtype=self.dtype, precision=self.precision,
                name="time_emb_proj",
            )(nn.silu(temb))
            h = h + temb_proj[:, None, None, :]
        h = gn("norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv((3, 3), "conv2")(h)
        if in_ch != self.out_channels:
            if self.use_conv_shortcut:
                x = conv((3, 3), "conv_shortcut")(x)
            else:
                x = conv((1, 1), "conv_shortcut")(x)
        return x + h


class SelfAttention2D(nn.Module):
    """Spatial self-attention over an NHWC feature map with a residual add.

    num_head_channels=None → a single head spanning all channels (the setting
    used by the DDPM-family checkpoints the reference targets).
    """

    num_head_channels: Optional[int] = None
    norm_num_groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "xla"
    fuse_qkv: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hgt, wid, c = x.shape
        heads = 1 if self.num_head_channels is None else c // self.num_head_channels
        head_dim = c // heads

        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.eps,
            dtype=self.dtype, name="group_norm",
        )(x)
        h = h.reshape(b, hgt * wid, c)
        q, k, v = project_qkv(
            h, None, c, use_bias=True, dtype=self.dtype,
            precision=self.precision, fuse=self.fuse_qkv,
        )
        shape4 = (b, -1, heads, head_dim)
        out = attention(
            q.reshape(shape4), k.reshape(shape4), v.reshape(shape4),
            impl=self.attn_impl, precision=self.precision,
        )
        out = out.reshape(b, hgt * wid, c)
        out = nn.Dense(c, dtype=self.dtype, precision=self.precision,
                       name="to_out")(out)
        return x + out.reshape(b, hgt, wid, c)


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv. `padding=1` is the diffusers default; the original
    DDPM nets use asymmetric (0,1) padding, selectable via `asymmetric`."""

    channels: int
    asymmetric: bool = False
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.asymmetric:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            padding = "VALID"
        else:
            padding = 1
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=padding,
            dtype=self.dtype, precision=self.precision, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest-neighbor 2x upsample followed by a 3x3 conv."""

    channels: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.channels, (3, 3), padding=1,
            dtype=self.dtype, precision=self.precision, name="conv",
        )(x)
