"""Spatial transformer blocks for text-conditioned U-Nets (SD family).

Equivalent to diffusers' Transformer2DModel / BasicTransformerBlock /
CrossAttention stack that the reference's SD pipelines traverse
(/root/reference/src/utils/utils.py:482-516 routes through blocks with
`has_cross_attention`), rebuilt in Flax NHWC. Submodule names mirror the
torch checkpoint layout (attn1/attn2, to_q/to_k/to_v/to_out, ff.net.0.proj,
proj_in/proj_out, norm1-3) so models/convert.py's generic name mapping works
unchanged.

Attention runs through ops.attention — fully jvp/vjp-differentiable in the
'xla' impl (what the pullback uses), Pallas flash for long-sequence sampling.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from .layers import project_qkv


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None."""

    heads: int
    head_dim: int
    out_dim: int
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "xla"
    fuse_qkv: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None):
        inner = self.heads * self.head_dim
        b, sq, _ = x.shape
        sk = sq if context is None else context.shape[1]
        q, k, v = project_qkv(
            x, context, inner, use_bias=False, dtype=self.dtype,
            precision=self.precision, fuse=self.fuse_qkv,
        )
        out = attention(
            q.reshape(b, sq, self.heads, self.head_dim),
            k.reshape(b, sk, self.heads, self.head_dim),
            v.reshape(b, sk, self.heads, self.head_dim),
            impl=self.attn_impl, precision=self.precision,
        )
        out = out.reshape(b, sq, inner)
        return nn.Dense(
            self.out_dim, use_bias=True, dtype=self.dtype,
            precision=self.precision, name="to_out",
        )(out)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(
            self.inner_dim * 2, dtype=self.dtype, precision=self.precision,
            name="proj",
        )(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU — diffusers' GEGLU uses F.gelu, not the tanh approx
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        x = GEGLU(self.dim * self.mult, dtype=self.dtype,
                  precision=self.precision, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, precision=self.precision,
                        name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    heads: int
    head_dim: int
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "xla"
    fuse_qkv: bool = True

    @nn.compact
    def __call__(self, x, context):
        dim = x.shape[-1]
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        attn = lambda name: CrossAttention(
            heads=self.heads, head_dim=self.head_dim, out_dim=dim,
            dtype=self.dtype, precision=self.precision,
            attn_impl=self.attn_impl, fuse_qkv=self.fuse_qkv, name=name,
        )
        x = x + attn("attn1")(ln("norm1")(x))
        x = x + attn("attn2")(ln("norm2")(x), context)
        x = x + FeedForward(dim, dtype=self.dtype, precision=self.precision,
                            name="ff")(ln("norm3")(x))
        return x


class Transformer2D(nn.Module):
    """GN → proj_in → transformer blocks → proj_out, residual around it all.

    ``use_linear_projection=True`` (SD2.x/SDXL) projects tokens with Dense;
    False (SD1.x) uses 1x1 convs.
    """

    heads: int
    head_dim: int
    depth: int = 1
    use_linear_projection: bool = True
    norm_num_groups: int = 32
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "xla"
    fuse_qkv: bool = True
    remat: bool = False  # checkpoint each transformer block (deep stacks /
    #                      Jacobian work at SDXL scale; trades FLOPs for HBM)

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        inner = self.heads * self.head_dim
        residual = x
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(inner, dtype=self.dtype, precision=self.precision,
                         name="proj_in")(x)
        else:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype,
                        precision=self.precision, name="proj_in")(x)
            x = x.reshape(b, h * w, inner)
        Block = (nn.remat(BasicTransformerBlock) if self.remat
                 else BasicTransformerBlock)
        for i in range(self.depth):
            x = Block(
                heads=self.heads, head_dim=self.head_dim, dtype=self.dtype,
                precision=self.precision, attn_impl=self.attn_impl,
                fuse_qkv=self.fuse_qkv, name=f"transformer_blocks_{i}",
            )(x, context)
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, precision=self.precision,
                         name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, inner)
            x = nn.Conv(c, (1, 1), dtype=self.dtype,
                        precision=self.precision, name="proj_out")(x)
        return x + residual
