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

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hgt, wid, c = x.shape
        heads = 1 if self.num_head_channels is None else c // self.num_head_channels
        head_dim = c // heads

        dense = lambda name: nn.Dense(
            c, dtype=self.dtype, precision=self.precision, name=name
        )
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.eps,
            dtype=self.dtype, name="group_norm",
        )(x)
        h = h.reshape(b, hgt * wid, c)
        q = dense("to_q")(h).reshape(b, -1, heads, head_dim)
        k = dense("to_k")(h).reshape(b, -1, heads, head_dim)
        v = dense("to_v")(h).reshape(b, -1, heads, head_dim)
        out = attention(q, k, v, impl=self.attn_impl, precision=self.precision)
        out = out.reshape(b, hgt * wid, c)
        out = dense("to_out")(out)
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
