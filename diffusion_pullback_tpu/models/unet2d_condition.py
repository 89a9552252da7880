"""Text-conditioned 2-D U-Net (Stable Diffusion family) with feature taps.

The TPU-native counterpart of diffusers' UNet2DConditionModel as used by the
reference's SD path, with the monkey-patched tap surface designed in
(/root/reference/src/utils/utils.py:438-527 get_h, :529-635 get_h_to_e,
:350-436 forward_dh):

    ('down', i) → output of down block i   ('mid', 0) → mid output
    ('up', i)   → output of up block i

Same encode / encode_with_state / decode_with_state / forward_dh contract as
models.unet2d.UNet2D, with `encoder_hidden_states` (prompt embeddings)
threaded through; the state broadcast covers them too, so a batch-1 prompt
fans out over the probe batch exactly like the reference's
`encoder_hidden_states.repeat(pca_rank, 1, 1)` (utils.py:596,606).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .configs import UNet2DConditionConfig
from .layers import (
    Downsample2D,
    ResnetBlock,
    TimestepEmbedMLP,
    Upsample2D,
    timestep_embedding,
)
from .transformer2d import Transformer2D
from .unet2d import TapPoint, TapState, _broadcast_state


class CondTapState(NamedTuple):
    emb: jax.Array
    skips: Tuple[jax.Array, ...]
    context: jax.Array


def _broadcast_cond_state(state: CondTapState, batch: int) -> CondTapState:
    base = _broadcast_state(TapState(state.emb, state.skips), batch)
    ctx = state.context
    if ctx.shape[0] != batch:
        if ctx.shape[0] != 1:
            raise ValueError(f"context batch {ctx.shape[0]} vs h batch {batch}")
        ctx = jnp.broadcast_to(ctx, (batch,) + ctx.shape[1:])
    return CondTapState(base.emb, base.skips, ctx)


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    head_dim: int
    depth: int
    use_linear_projection: bool
    add_downsample: bool
    norm_num_groups: int
    norm_eps: float
    dropout: float
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "xla"
    fuse_qkv: bool = True
    remat_transformer: bool = False

    @nn.compact
    def __call__(self, x, temb, context, deterministic=True, stop_at=None):
        res = []
        for i in range(self.num_layers):
            x = ResnetBlock(
                self.out_channels, norm_num_groups=self.norm_num_groups,
                eps=self.norm_eps, dropout=self.dropout, dtype=self.dtype,
                precision=self.precision, name=f"resnets_{i}",
            )(x, temb, deterministic)
            if stop_at == ("res", i):
                return x, tuple(res)
            x = Transformer2D(
                heads=self.heads, head_dim=self.head_dim, depth=self.depth,
                use_linear_projection=self.use_linear_projection,
                norm_num_groups=self.norm_num_groups, dtype=self.dtype,
                precision=self.precision, attn_impl=self.attn_impl, fuse_qkv=self.fuse_qkv,
                remat=self.remat_transformer,
                name=f"attentions_{i}",
            )(x, context)
            if stop_at == ("attn", i):
                return x, tuple(res)
            res.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             precision=self.precision, name="downsamplers_0")(x)
            res.append(x)
        return x, tuple(res)


class PlainDownBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    norm_num_groups: int
    norm_eps: float
    dropout: float
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, temb, deterministic=True):
        res = []
        for i in range(self.num_layers):
            x = ResnetBlock(
                self.out_channels, norm_num_groups=self.norm_num_groups,
                eps=self.norm_eps, dropout=self.dropout, dtype=self.dtype,
                precision=self.precision, name=f"resnets_{i}",
            )(x, temb, deterministic)
            res.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             precision=self.precision, name="downsamplers_0")(x)
            res.append(x)
        return x, tuple(res)


class CrossAttnUpBlock(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    head_dim: int
    depth: int
    use_linear_projection: bool
    add_upsample: bool
    norm_num_groups: int
    norm_eps: float
    dropout: float
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "xla"
    fuse_qkv: bool = True
    remat_transformer: bool = False

    @nn.compact
    def __call__(self, x, res_samples, temb, context, deterministic=True):
        for i in range(self.num_layers):
            r = res_samples[-1]
            res_samples = res_samples[:-1]
            x = jnp.concatenate([x, r], axis=-1)
            x = ResnetBlock(
                self.out_channels, norm_num_groups=self.norm_num_groups,
                eps=self.norm_eps, dropout=self.dropout, dtype=self.dtype,
                precision=self.precision, name=f"resnets_{i}",
            )(x, temb, deterministic)
            x = Transformer2D(
                heads=self.heads, head_dim=self.head_dim, depth=self.depth,
                use_linear_projection=self.use_linear_projection,
                norm_num_groups=self.norm_num_groups, dtype=self.dtype,
                precision=self.precision, attn_impl=self.attn_impl, fuse_qkv=self.fuse_qkv,
                remat=self.remat_transformer,
                name=f"attentions_{i}",
            )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           precision=self.precision, name="upsamplers_0")(x)
        return x


class PlainUpBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    norm_num_groups: int
    norm_eps: float
    dropout: float
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, res_samples, temb, deterministic=True):
        for i in range(self.num_layers):
            r = res_samples[-1]
            res_samples = res_samples[:-1]
            x = jnp.concatenate([x, r], axis=-1)
            x = ResnetBlock(
                self.out_channels, norm_num_groups=self.norm_num_groups,
                eps=self.norm_eps, dropout=self.dropout, dtype=self.dtype,
                precision=self.precision, name=f"resnets_{i}",
            )(x, temb, deterministic)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           precision=self.precision, name="upsamplers_0")(x)
        return x


class CrossAttnMidBlock(nn.Module):
    channels: int
    heads: int
    head_dim: int
    depth: int
    use_linear_projection: bool
    norm_num_groups: int
    norm_eps: float
    dropout: float
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "xla"
    fuse_qkv: bool = True
    remat_transformer: bool = False

    @nn.compact
    def __call__(self, x, temb, context, deterministic=True):
        rb = lambda name: ResnetBlock(
            self.channels, norm_num_groups=self.norm_num_groups,
            eps=self.norm_eps, dropout=self.dropout, dtype=self.dtype,
            precision=self.precision, name=name,
        )
        x = rb("resnets_0")(x, temb, deterministic)
        x = Transformer2D(
            heads=self.heads, head_dim=self.head_dim, depth=self.depth,
            use_linear_projection=self.use_linear_projection,
            norm_num_groups=self.norm_num_groups, dtype=self.dtype,
            precision=self.precision, attn_impl=self.attn_impl, fuse_qkv=self.fuse_qkv,
            remat=self.remat_transformer,
            name="attentions_0",
        )(x, context)
        x = rb("resnets_1")(x, temb, deterministic)
        return x


class UNet2DCondition(nn.Module):
    config: UNet2DConditionConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        precision = cfg.precision
        ch0 = cfg.block_out_channels[0]
        self.conv_in = nn.Conv(ch0, (3, 3), padding=1, dtype=dtype,
                               precision=precision)
        self.time_mlp = TimestepEmbedMLP(4 * ch0, dtype=dtype,
                                         precision=precision)
        if cfg.addition_embed_dim:
            self.add_embedding = TimestepEmbedMLP(4 * ch0, dtype=dtype,
                                                  precision=precision)

        n_down = len(cfg.down_block_types)
        head_dims = (
            cfg.attention_head_dim
            if isinstance(cfg.attention_head_dim, (tuple, list))
            else (cfg.attention_head_dim,) * n_down
        )
        down = []
        for i, bt in enumerate(cfg.down_block_types):
            common = dict(
                out_channels=cfg.block_out_channels[i],
                num_layers=cfg.layers_per_block,
                add_downsample=(i < n_down - 1),
                norm_num_groups=cfg.norm_num_groups,
                norm_eps=cfg.norm_eps,
                dropout=cfg.dropout,
                dtype=dtype,
                precision=precision,
            )
            if bt == "cross":
                down.append(CrossAttnDownBlock(
                    heads=cfg.attention_heads[i], head_dim=head_dims[i],
                    depth=cfg.transformer_depth[i],
                    use_linear_projection=cfg.use_linear_projection,
                    attn_impl=cfg.attn_impl, fuse_qkv=cfg.fuse_qkv,
                    remat_transformer=cfg.remat_transformer, **common,
                ))
            else:
                down.append(PlainDownBlock(**common))
        self.down_blocks = down

        self.mid_block = CrossAttnMidBlock(
            channels=cfg.block_out_channels[-1],
            heads=cfg.attention_heads[-1], head_dim=head_dims[-1],
            depth=cfg.transformer_depth[-1],
            use_linear_projection=cfg.use_linear_projection,
            norm_num_groups=cfg.norm_num_groups, norm_eps=cfg.norm_eps,
            dropout=cfg.dropout, dtype=dtype, precision=precision,
            attn_impl=cfg.attn_impl, fuse_qkv=cfg.fuse_qkv,
            remat_transformer=cfg.remat_transformer,
        )

        rev_ch = tuple(reversed(cfg.block_out_channels))
        rev_heads = tuple(reversed(cfg.attention_heads))
        rev_depth = tuple(reversed(cfg.transformer_depth))
        rev_head_dims = tuple(reversed(head_dims))
        n_up = len(cfg.up_block_types)
        up = []
        for i, bt in enumerate(cfg.up_block_types):
            common = dict(
                out_channels=rev_ch[i],
                num_layers=cfg.layers_per_block + 1,
                add_upsample=(i < n_up - 1),
                norm_num_groups=cfg.norm_num_groups,
                norm_eps=cfg.norm_eps,
                dropout=cfg.dropout,
                dtype=dtype,
                precision=precision,
            )
            if bt == "cross":
                up.append(CrossAttnUpBlock(
                    heads=rev_heads[i], head_dim=rev_head_dims[i],
                    depth=rev_depth[i],
                    use_linear_projection=cfg.use_linear_projection,
                    attn_impl=cfg.attn_impl, fuse_qkv=cfg.fuse_qkv,
                    remat_transformer=cfg.remat_transformer, **common,
                ))
            else:
                up.append(PlainUpBlock(**common))
        self.up_blocks = up

        self.conv_norm_out = nn.GroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps, dtype=dtype
        )
        self.conv_out = nn.Conv(cfg.out_channels, (3, 3), padding=1,
                                dtype=dtype, precision=precision)

    # ---- internals --------------------------------------------------------

    def _embed(self, t, batch, added_cond=None):
        cfg = self.config
        t = jnp.asarray(t)
        if t.ndim == 0:
            t = jnp.broadcast_to(t[None], (batch,))
        feat = timestep_embedding(
            t, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        emb = self.time_mlp(feat)
        if cfg.addition_embed_dim:
            if added_cond is None:
                raise ValueError(
                    "this config uses SDXL addition embeddings: pass "
                    "added_cond=(text_embeds, time_ids)"
                )
            text_embeds, time_ids = added_cond
            tf = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift,
            ).reshape(time_ids.shape[0], -1)
            add = jnp.concatenate([text_embeds, tf], axis=-1)
            if add.shape[0] == 1 and batch > 1:
                add = jnp.broadcast_to(add, (batch,) + add.shape[1:])
            emb = emb + self.add_embedding(add)
        return emb

    def _call_down(self, block, x, emb, ctx, deterministic):
        if isinstance(block, CrossAttnDownBlock):
            return block(x, emb, ctx, deterministic)
        return block(x, emb, deterministic)

    def _call_up(self, block, x, res, emb, ctx, deterministic):
        if isinstance(block, CrossAttnUpBlock):
            return block(x, res, emb, ctx, deterministic)
        return block(x, res, emb, deterministic)

    def _run_up(self, h, skips, emb, ctx, deterministic):
        n_res = self.config.layers_per_block + 1
        for block in self.up_blocks:
            res = skips[-n_res:]
            skips = skips[:-n_res]
            h = self._call_up(block, h, res, emb, ctx, deterministic)
        return h

    def _head(self, h):
        return self.conv_out(nn.silu(self.conv_norm_out(h)))

    # ---- public -----------------------------------------------------------

    def __call__(self, x, t, encoder_hidden_states, deterministic=True,
                 added_cond=None):
        ctx = encoder_hidden_states
        if ctx.shape[0] == 1 and x.shape[0] > 1:
            ctx = jnp.broadcast_to(ctx, (x.shape[0],) + ctx.shape[1:])
        emb = self._embed(t, x.shape[0], added_cond)
        h = self.conv_in(x)
        skips = (h,)
        for block in self.down_blocks:
            h, res = self._call_down(block, h, emb, ctx, deterministic)
            skips = skips + res
        h = self.mid_block(h, emb, ctx, deterministic)
        h = self._run_up(h, skips, emb, ctx, deterministic)
        return self._head(h)

    def encode(self, x, t, encoder_hidden_states, tap: TapPoint,
               deterministic=True, added_cond=None):
        return self.encode_with_state(
            x, t, encoder_hidden_states, tap, deterministic, added_cond
        )[0]

    def encode_with_state(self, x, t, encoder_hidden_states, tap: TapPoint,
                          deterministic=True, added_cond=None):
        tap = TapPoint(*tap).validate(len(self.down_blocks), len(self.up_blocks))
        ctx = encoder_hidden_states
        if ctx.shape[0] == 1 and x.shape[0] > 1:
            ctx = jnp.broadcast_to(ctx, (x.shape[0],) + ctx.shape[1:])
        emb = self._embed(t, x.shape[0], added_cond)
        h = self.conv_in(x)
        if tap.inner is not None:
            # encode-only intra-block tap (reference down_block_forward,
            # utils.py:638-719 — SD blocks; decode unsupported there too)
            for i in range(tap.block_idx):
                h, _ = self._call_down(self.down_blocks[i], h, emb, ctx,
                                       deterministic)
            blk = self.down_blocks[tap.block_idx]
            if isinstance(blk, CrossAttnDownBlock):
                h, _ = blk(h, emb, ctx, deterministic, stop_at=tap.inner)
            else:
                raise ValueError("inner taps need a cross-attention block")
            return h, CondTapState(emb, (), ctx)
        skips = (h,)
        for i, block in enumerate(self.down_blocks):
            h, res = self._call_down(block, h, emb, ctx, deterministic)
            if tap.op == "down" and tap.block_idx == i:
                return h, CondTapState(emb, skips + res[:-1], ctx)
            skips = skips + res
        h = self.mid_block(h, emb, ctx, deterministic)
        if tap.op == "mid":
            return h, CondTapState(emb, skips, ctx)
        n_res = self.config.layers_per_block + 1
        for i, block in enumerate(self.up_blocks):
            res = skips[-n_res:]
            skips = skips[:-n_res]
            h = self._call_up(block, h, res, emb, ctx, deterministic)
            if tap.block_idx == i:
                return h, CondTapState(emb, skips, ctx)
        raise AssertionError("unreachable")

    def decode_with_state(self, h, state: CondTapState, tap: TapPoint,
                          deterministic=True):
        tap = TapPoint(*tap).validate(len(self.down_blocks), len(self.up_blocks))
        if tap.inner is not None:
            raise NotImplementedError(
                "decode from intra-block taps is not supported (reference "
                "get_h_to_e asserts the same, utils.py:544)"
            )
        state = _broadcast_cond_state(CondTapState(*state), h.shape[0])
        emb, skips, ctx = state
        if tap.op == "down":
            skips = skips + (h,)
            for i in range(tap.block_idx + 1, len(self.down_blocks)):
                h, res = self._call_down(
                    self.down_blocks[i], h, emb, ctx, deterministic
                )
                skips = skips + res
            h = self.mid_block(h, emb, ctx, deterministic)
            h = self._run_up(h, skips, emb, ctx, deterministic)
        elif tap.op == "mid":
            h = self._run_up(h, skips, emb, ctx, deterministic)
        else:
            n_res = self.config.layers_per_block + 1
            for i in range(tap.block_idx + 1, len(self.up_blocks)):
                res = skips[-n_res:]
                skips = skips[:-n_res]
                h = self._call_up(self.up_blocks[i], h, res, emb, ctx,
                                  deterministic)
        return self._head(h)

    def forward_dh(self, x, t, encoder_hidden_states, dh, tap: TapPoint,
                   deterministic=True):
        h, state = self.encode_with_state(
            x, t, encoder_hidden_states, tap, deterministic
        )
        return self.decode_with_state(h + dh, state, tap, deterministic)

    def shallow_encode(self, x, t, encoder_hidden_states, deterministic=True,
                       added_cond=None):
        """Cheap shallow pass: time embedding + conv_in + the first down
        block's per-layer outputs — exactly the skips the LAST up block
        consumes. Powers encoder-reuse (DeepCache-style) sampling on the SD
        family (samplers/deepcache.py): deep features are cached across
        steps, only this slice and the last up block recompute per step."""
        ctx = encoder_hidden_states
        if ctx.shape[0] == 1 and x.shape[0] > 1:
            ctx = jnp.broadcast_to(ctx, (x.shape[0],) + ctx.shape[1:])
        emb = self._embed(t, x.shape[0], added_cond)
        h = self.conv_in(x)
        block = self.down_blocks[0]
        stop = ("attn" if isinstance(block, CrossAttnDownBlock) else "res",
                self.config.layers_per_block - 1)
        if isinstance(block, CrossAttnDownBlock):
            out, res = block(h, emb, ctx, deterministic, stop_at=stop)
        else:
            # PlainDownBlock has no stop_at; its per-layer outputs are res
            out, res = block(h, emb, deterministic)
            res, out = tuple(res[:self.config.layers_per_block - 1]), \
                res[self.config.layers_per_block - 1]
        return CondTapState(emb, (h,) + tuple(res) + (out,), ctx)
