"""AutoencoderKL — the SD latent VAE, in Flax NHWC.

The reference calls diffusers' VAE for encode (×0.18215) and decode
(/root/reference/src/modules/edit.py:144-146, :477-479). Submodule names
mirror the torch checkpoint (encoder/decoder down/up blocks, mid_block,
quant_conv/post_quant_conv) for the generic converter.

Reparameterised sampling takes an explicit PRNG key (the reference's
`.latent_dist.sample()` hides global RNG state); `encode_moments` exposes
the deterministic (mean, logvar) for callers that need determinism.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .configs import VAEConfig
from .layers import Downsample2D, ResnetBlock, SelfAttention2D, Upsample2D


class VAEMidBlock(nn.Module):
    channels: int
    norm_num_groups: int
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        rb = lambda name: ResnetBlock(
            self.channels, norm_num_groups=self.norm_num_groups,
            dtype=self.dtype, precision=self.precision, name=name,
        )
        x = rb("resnets_0")(x, None)
        x = SelfAttention2D(
            norm_num_groups=self.norm_num_groups, dtype=self.dtype,
            precision=self.precision, attn_impl=self.attn_impl,
            name="attentions_0",
        )(x)
        x = rb("resnets_1")(x, None)
        return x


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype, prec = jnp.dtype(cfg.dtype), cfg.precision
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=dtype, precision=prec, name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(
                    ch, norm_num_groups=cfg.norm_num_groups, dtype=dtype,
                    precision=prec, name=f"down_blocks_{i}_resnets_{j}",
                )(x, None)
            if i < n - 1:
                x = Downsample2D(ch, dtype=dtype, precision=prec,
                                 name=f"down_blocks_{i}_downsamplers_0")(x)
        x = VAEMidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                        dtype=dtype, precision=prec, attn_impl=cfg.attn_impl,
                        name="mid_block")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=dtype, precision=prec, name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dtype, prec = jnp.dtype(cfg.dtype), cfg.precision
        rev = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=dtype, precision=prec,
                    name="conv_in")(z)
        x = VAEMidBlock(rev[0], cfg.norm_num_groups, dtype=dtype,
                        precision=prec, attn_impl=cfg.attn_impl,
                        name="mid_block")(x)
        n = len(rev)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(
                    ch, norm_num_groups=cfg.norm_num_groups, dtype=dtype,
                    precision=prec, name=f"up_blocks_{i}_resnets_{j}",
                )(x, None)
            if i < n - 1:
                x = Upsample2D(ch, dtype=dtype, precision=prec,
                               name=f"up_blocks_{i}_upsamplers_0")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dtype,
                       precision=prec, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    config: VAEConfig

    def setup(self):
        cfg = self.config
        dtype, prec = jnp.dtype(cfg.dtype), cfg.precision
        self.encoder = Encoder(cfg)
        self.decoder = Decoder(cfg)
        self.quant_conv = nn.Conv(2 * cfg.latent_channels, (1, 1),
                                  dtype=dtype, precision=prec)
        self.post_quant_conv = nn.Conv(cfg.latent_channels, (1, 1),
                                       dtype=dtype, precision=prec)

    def encode_moments(self, x) -> Tuple[jax.Array, jax.Array]:
        """(mean, logvar) of the latent posterior."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, key=None) -> jax.Array:
        """Sampled (or mean if key=None) latent, scaled by scaling_factor —
        the reference's z0 = vae.encode(x).sample() * 0.18215."""
        mean, logvar = self.encode_moments(x)
        if key is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, mean.dtype
            )
        return mean * self.config.scaling_factor

    def decode(self, z) -> jax.Array:
        """Latent → image (expects scaled latents; undoes scaling_factor)."""
        z = z / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key=None):
        return self.decode(self.encode(x, key))
