"""ADM U-Net (guided-diffusion / improved-diffusion family) with taps.

TPU-native coverage of the reference's vendored OpenAI model stacks
(/root/reference/src/models/guided_diffusion/unet.py UNetModel:398,
improved_diffusion + improved_ddpm_old variants — each hand-extended there
with get_h:686-702 and local_encoder_pullback_xt:704-781). Features beyond
the DDPM family: FiLM scale-shift conditioning (`use_scale_shift_norm`,
unet.py:250-255), learned-σ heads, class conditioning, multi-head QKV
attention at selected resolutions, residual up/downsampling blocks.

Tap semantics extend the reference's (mid-only on these nets) to level
granularity: ('down', level) → after that level's final input block;
('mid', 0); ('up', level). Flax submodule names mirror the torch checkpoint
layout (input_blocks.N.M.in_layers.0 …) so models/convert.py loads ADM/P2
checkpoints through the same generic mapping.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from .configs import ADMConfig
from .layers import timestep_embedding
from .unet2d import TapPoint


def _zeros_conv(features, kernel, dtype, precision, name, zero=True):
    """ADM zero-module: output convs start at zero so blocks begin as
    identities (checkpoint-parity init). ``zero=False`` (config.zero_init)
    gives standard init for training-from-scratch / tests."""
    if not zero:
        return nn.Conv(features, kernel, padding=kernel[0] // 2, dtype=dtype,
                       precision=precision, name=name)
    return nn.Conv(
        features, kernel, padding=kernel[0] // 2, dtype=dtype,
        precision=precision, kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros, name=name,
    )


class ADMResBlock(nn.Module):
    out_channels: int
    use_scale_shift_norm: bool
    dropout: float
    updown: Optional[str] = None  # None | 'up' | 'down'
    norm_num_groups: int = 32
    dtype: Any = jnp.float32
    precision: Any = None
    zero_init: bool = True

    @nn.compact
    def __call__(self, x, emb, deterministic=True):
        in_ch = x.shape[-1]
        gn = lambda name: nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-5, dtype=self.dtype,
            name=name,
        )
        conv = lambda feat, name, zero=False: (
            _zeros_conv(feat, (3, 3), self.dtype, self.precision, name,
                        zero=self.zero_init)
            if zero
            else nn.Conv(feat, (3, 3), padding=1, dtype=self.dtype,
                         precision=self.precision, name=name)
        )

        def resample(v):
            b, hh, ww, c = v.shape
            if self.updown == "up":
                return jax.image.resize(v, (b, hh * 2, ww * 2, c), "nearest")
            if self.updown == "down":
                return nn.avg_pool(v, (2, 2), strides=(2, 2))
            return v

        h = nn.silu(gn("in_layers_0")(x))
        if self.updown:
            h = resample(h)
            x = resample(x)
        h = conv(self.out_channels, "in_layers_2")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm
            else self.out_channels,
            dtype=self.dtype, precision=self.precision, name="emb_layers_1",
        )(nn.silu(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = gn("out_layers_0")(h) * (1 + scale) + shift
        else:
            h = h + emb_out[:, None, None, :]
            h = gn("out_layers_0")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv(self.out_channels, "out_layers_3", zero=True)(h)

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        precision=self.precision, name="skip_connection")(x)
        return x + h


class ADMAttentionBlock(nn.Module):
    num_heads: int
    norm_num_groups: int = 32
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "xla"
    zero_init: bool = True
    # qkv channel layout of the torch checkpoint (guided_diffusion/
    # unet.py:258-275): False → QKVAttentionLegacy, heads-major
    # [h0:qkv, h1:qkv, …]; True → QKVAttention ("new order"), qkv-major
    # [Q(all heads); K; V] — used by the ImageNet64Cond / 512px
    # checkpoints (script_util.py IMAGENET_64_COND_DICT).
    new_order: bool = False

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        hd = c // self.num_heads
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm")(x)
        h = h.reshape(b, hh * ww, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, precision=self.precision,
                       name="qkv")(h)
        if self.new_order:
            q, k, v = (part.reshape(b, -1, self.num_heads, hd)
                       for part in jnp.split(qkv, 3, axis=-1))
        else:
            q, k, v = jnp.split(qkv.reshape(b, -1, self.num_heads, 3 * hd),
                                3, axis=-1)
        out = attention(q, k, v, impl=self.attn_impl, precision=self.precision)
        out = nn.Dense(
            c, dtype=self.dtype, precision=self.precision,
            kernel_init=(nn.initializers.zeros if self.zero_init
                         else nn.initializers.lecun_normal()),
            name="proj_out",
        )(out.reshape(b, hh * ww, c))
        return x + out.reshape(b, hh, ww, c)


class ADMTapState(NamedTuple):
    emb: jax.Array
    skips: Tuple[jax.Array, ...]


class UNetADM(nn.Module):
    config: ADMConfig

    def setup(self):
        cfg = self.config
        self._dtype = jnp.dtype(cfg.dtype)

    def _heads(self, ch: int) -> int:
        cfg = self.config
        if cfg.num_head_channels > 0:
            return max(1, ch // cfg.num_head_channels)
        return cfg.num_heads

    def _embed(self, t, y, batch):
        cfg = self.config
        t = jnp.asarray(t)
        if t.ndim == 0:
            t = jnp.broadcast_to(t[None], (batch,))
        ddpm_style = getattr(cfg, "time_embed_style", "adm") == "ddpm"
        feat = timestep_embedding(t, cfg.model_channels,
                                  flip_sin_to_cos=not ddpm_style,
                                  downscale_freq_shift=1.0 if ddpm_style
                                  else 0.0)
        emb = nn.Dense(4 * cfg.model_channels, dtype=self._dtype,
                       name="time_embed_0")(feat)
        emb = nn.Dense(4 * cfg.model_channels, dtype=self._dtype,
                       name="time_embed_2")(nn.silu(emb))
        if cfg.num_classes:
            if y is None:
                raise ValueError("class-conditional model requires labels y")
            emb = emb + nn.Embed(cfg.num_classes, 4 * cfg.model_channels,
                                 dtype=self._dtype, name="label_emb")(y)
        return emb

    @nn.compact
    def __call__(self, x, t, y=None, deterministic=True, tap=None, h_in=None,
                 tap_state=None, mode="full"):
        """mode: 'full' → ε[,σ]; 'encode' → (h, state); 'decode' → resume from
        (h_in, tap_state). One compact method so all modes share parameters.
        """
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        attn_at = set(cfg.attention_resolutions)
        if tap is not None:
            tap = TapPoint(*tap)
            if tap.inner is not None:
                raise ValueError(
                    "UNetADM does not support intra-block taps (the "
                    "reference's after_res/after_sa exist only on the SD "
                    "diffusers blocks, utils.py:638-719)")

        resblock = lambda ch, updown, name: ADMResBlock(
            ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
            dropout=cfg.dropout, updown=updown,
            norm_num_groups=cfg.norm_num_groups, dtype=dtype,
            precision=cfg.precision, zero_init=cfg.zero_init, name=name,
        )
        attnblock = lambda ch, name: ADMAttentionBlock(
            self._heads(ch), norm_num_groups=cfg.norm_num_groups,
            dtype=dtype, precision=cfg.precision, attn_impl=cfg.attn_impl,
            zero_init=cfg.zero_init,
            new_order=getattr(cfg, "use_new_attention_order", False),
            name=name,
        )

        decoding = mode == "decode"
        if decoding:
            emb, skips = ADMTapState(*tap_state).emb, list(ADMTapState(*tap_state).skips)
            batch = h_in.shape[0]
            if emb.shape[0] == 1 and batch > 1:
                emb = jnp.broadcast_to(emb, (batch,) + emb.shape[1:])
                skips = [jnp.broadcast_to(s, (batch,) + s.shape[1:]) for s in skips]
            h = h_in
        else:
            emb = self._embed(t, y, x.shape[0])
            skips = []
            h = None

        n_levels = len(cfg.channel_mult)
        blk = 0  # running torch-style input_blocks index

        # ---- input (down) path -------------------------------------------
        ds = 1
        if not decoding or (tap.op == "down"):
            run_down = not decoding
            if not run_down:
                # decode from a 'down' tap: skip levels <= tap.block_idx
                pass
            if not decoding:
                h = nn.Conv(cfg.model_channels, (3, 3), padding=1, dtype=dtype,
                            precision=cfg.precision, name="input_blocks_0_0")(x)
                skips.append(h)
            blk = 1
            for level, mult in enumerate(cfg.channel_mult):
                ch = int(cfg.model_channels * mult)
                skip_level = decoding and level <= tap.block_idx
                for i in range(cfg.num_res_blocks):
                    if not skip_level:
                        h = resblock(ch, None, f"input_blocks_{blk}_0")(
                            h, emb, deterministic)
                        if ds in attn_at:
                            h = attnblock(ch, f"input_blocks_{blk}_1")(h)
                        skips.append(h)
                    blk += 1
                if level != n_levels - 1:
                    if not skip_level:
                        if cfg.resblock_updown:
                            h = resblock(ch, "down", f"input_blocks_{blk}_0")(
                                h, emb, deterministic)
                        else:
                            h = nn.Conv(ch, (3, 3), (2, 2), padding=1,
                                        dtype=dtype, precision=cfg.precision,
                                        name=f"input_blocks_{blk}_0")(h)
                        skips.append(h)
                    blk += 1
                    ds *= 2
                if not decoding and tap is not None and mode == "encode" \
                        and tap.op == "down" and tap.block_idx == level:
                    # tapped activation is the last skip; drop it (decode
                    # re-inserts h), mirroring UNet2D semantics
                    return h, ADMTapState(emb, tuple(skips[:-1]))
                if decoding and tap.op == "down" and tap.block_idx == level:
                    skips.append(h)  # h_in re-inserted as its own skip

        # ---- middle -------------------------------------------------------
        mid_ch = int(cfg.model_channels * cfg.channel_mult[-1])
        run_mid = (not decoding) or tap.op == "down"
        if run_mid:
            h = resblock(mid_ch, None, "middle_block_0")(h, emb, deterministic)
            h = attnblock(mid_ch, "middle_block_1")(h)
            h = resblock(mid_ch, None, "middle_block_2")(h, emb, deterministic)
            if mode == "encode" and tap.op == "mid":
                return h, ADMTapState(emb, tuple(skips))

        # ---- output (up) path --------------------------------------------
        blk = 0
        ds = 2 ** (n_levels - 1)
        for level, mult in enumerate(reversed(cfg.channel_mult)):
            ch = int(cfg.model_channels * mult)
            skip_up = decoding and tap.op == "up" and level <= tap.block_idx
            for i in range(cfg.num_res_blocks + 1):
                if not skip_up:
                    s = skips.pop()
                    h = jnp.concatenate([h, s], axis=-1)
                    h = resblock(ch, None, f"output_blocks_{blk}_0")(
                        h, emb, deterministic)
                    sub = 1
                    if ds in attn_at:
                        h = attnblock(ch, f"output_blocks_{blk}_{sub}")(h)
                        sub += 1
                    if level != n_levels - 1 and i == cfg.num_res_blocks:
                        if cfg.resblock_updown:
                            h = resblock(ch, "up", f"output_blocks_{blk}_{sub}")(
                                h, emb, deterministic)
                        else:
                            b_, hh, ww, c_ = h.shape
                            h = jax.image.resize(h, (b_, hh * 2, ww * 2, c_),
                                                 "nearest")
                            h = nn.Conv(ch, (3, 3), padding=1, dtype=dtype,
                                        precision=cfg.precision,
                                        name=f"output_blocks_{blk}_{sub}")(h)
                # levels skipped during decode-from-'up' consumed their
                # skips in the encode pass; nothing to pop here
                blk += 1
            if level != n_levels - 1:
                ds //= 2
            if mode == "encode" and tap.op == "up" and tap.block_idx == level:
                return h, ADMTapState(emb, tuple(skips))

        out_ch = cfg.out_channels * (2 if cfg.learn_sigma else 1)
        h = nn.silu(nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                                 dtype=dtype, name="out_0")(h))
        return _zeros_conv(out_ch, (3, 3), dtype, cfg.precision, "out_2",
                           zero=cfg.zero_init)(h)

    # convenience wrappers matching the UNet2D method surface
    def encode(self, x, t, tap, y=None, deterministic=True):
        return self.__call__(x, t, y=y, deterministic=deterministic, tap=tap,
                             mode="encode")[0]

    def encode_with_state(self, x, t, tap, y=None, deterministic=True):
        return self.__call__(x, t, y=y, deterministic=deterministic, tap=tap,
                             mode="encode")

    def decode_with_state(self, h, state, tap, deterministic=True):
        return self.__call__(None, None, deterministic=deterministic, tap=tap,
                             h_in=h, tap_state=state, mode="decode")


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (reference guided_diffusion/unet.py:24-54):
    prepend the mean token, add a learned positional embedding, one
    multi-head self-attention pass, read out token 0."""

    num_head_channels: int
    output_dim: int
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        tokens = x.reshape(b, hh * ww, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1
        )                                                   # (B, S+1, C)
        pos = self.param(
            "positional_embedding",
            lambda k, shape: jax.random.normal(k, shape, jnp.float32)
            / (c ** 0.5),
            (hh * ww + 1, c),
        )
        tokens = tokens + pos[None].astype(tokens.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, precision=self.precision,
                       name="qkv_proj")(tokens)
        heads = c // self.num_head_channels
        # The reference pool runs QKVAttention (unet.py:363 — "splits in a
        # different order"): qkv is laid out [Q(C); K(C); V(C)] along the
        # channel axis, heads nested inside each block — NOT the legacy
        # per-head interleave the U-Net attention blocks use.
        q, k, v = (
            part.reshape(b, -1, heads, self.num_head_channels)
            for part in jnp.split(qkv, 3, axis=-1)
        )
        out = attention(q, k, v, impl=self.attn_impl, precision=self.precision)
        out = nn.Dense(self.output_dim, dtype=self.dtype,
                       precision=self.precision, name="c_proj")(
            out.reshape(b, -1, c))
        return out[:, 0]


class EncoderUNetADM(nn.Module):
    """Half-U-Net classifier (reference EncoderUNetModel,
    guided_diffusion/unet.py:801-1012): ADM down path + middle with a pooled
    head — the noisy-image classifier that drives `classifier_grad_fn`
    guidance. Pool variants: 'adaptive' (global avg → zero 1×1 conv),
    'attention' (CLIP attention pool), 'spatial'/'spatial_v2' (per-block
    spatial means → MLP). Submodule names mirror the torch layout."""

    config: Any  # ADMEncoderConfig

    def _heads(self, ch: int) -> int:
        cfg = self.config
        if cfg.num_head_channels > 0:
            return max(1, ch // cfg.num_head_channels)
        return cfg.num_heads

    @nn.compact
    def __call__(self, x, t, deterministic=True):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        attn_at = set(cfg.attention_resolutions)
        spatial = cfg.pool.startswith("spatial")

        t = jnp.asarray(t)
        if t.ndim == 0:
            t = jnp.broadcast_to(t[None], (x.shape[0],))
        feat = timestep_embedding(t, cfg.model_channels,
                                  flip_sin_to_cos=True,
                                  downscale_freq_shift=0.0)
        emb = nn.Dense(4 * cfg.model_channels, dtype=dtype,
                       name="time_embed_0")(feat)
        emb = nn.Dense(4 * cfg.model_channels, dtype=dtype,
                       name="time_embed_2")(nn.silu(emb))

        resblock = lambda ch, updown, name: ADMResBlock(
            ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
            dropout=cfg.dropout, updown=updown,
            norm_num_groups=cfg.norm_num_groups, dtype=dtype,
            precision=cfg.precision, zero_init=cfg.zero_init, name=name,
        )
        attnblock = lambda ch, name: ADMAttentionBlock(
            self._heads(ch), norm_num_groups=cfg.norm_num_groups,
            dtype=dtype, precision=cfg.precision, attn_impl=cfg.attn_impl,
            zero_init=cfg.zero_init,
            new_order=getattr(cfg, "use_new_attention_order", False),
            name=name,
        )

        results = []
        pooled = lambda v: v.astype(jnp.float32).mean(axis=(1, 2))

        h = nn.Conv(cfg.model_channels, (3, 3), padding=1, dtype=dtype,
                    precision=cfg.precision, name="input_blocks_0_0")(x)
        if spatial:
            results.append(pooled(h))
        blk, ds = 1, 1
        n_levels = len(cfg.channel_mult)
        for level, mult in enumerate(cfg.channel_mult):
            ch = int(cfg.model_channels * mult)
            for _ in range(cfg.num_res_blocks):
                h = resblock(ch, None, f"input_blocks_{blk}_0")(
                    h, emb, deterministic)
                if ds in attn_at:
                    h = attnblock(ch, f"input_blocks_{blk}_1")(h)
                if spatial:
                    results.append(pooled(h))
                blk += 1
            if level != n_levels - 1:
                if cfg.resblock_updown:
                    h = resblock(ch, "down", f"input_blocks_{blk}_0")(
                        h, emb, deterministic)
                else:
                    h = nn.Conv(ch, (3, 3), (2, 2), padding=1, dtype=dtype,
                                precision=cfg.precision,
                                name=f"input_blocks_{blk}_0")(h)
                if spatial:
                    results.append(pooled(h))
                blk += 1
                ds *= 2

        mid_ch = int(cfg.model_channels * cfg.channel_mult[-1])
        h = resblock(mid_ch, None, "middle_block_0")(h, emb, deterministic)
        h = attnblock(mid_ch, "middle_block_1")(h)
        h = resblock(mid_ch, None, "middle_block_2")(h, emb, deterministic)

        if spatial:
            results.append(pooled(h))
            h = jnp.concatenate(results, axis=-1)
            h = nn.Dense(2048, dtype=dtype, precision=cfg.precision,
                         name="out_0")(h)
            if cfg.pool == "spatial_v2":
                h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                                 dtype=dtype, name="out_1")(h)
                h = nn.silu(h)
            else:
                h = nn.relu(h)
            last = "out_2" if cfg.pool == "spatial" else "out_3"
            return nn.Dense(cfg.out_channels, dtype=dtype,
                            precision=cfg.precision, name=last)(h)

        h = nn.silu(nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                                 dtype=dtype, name="out_0")(h))
        if cfg.pool == "adaptive":
            h = h.mean(axis=(1, 2), keepdims=True)
            # torch Sequential index 3: (norm, SiLU, AdaptiveAvgPool2d, conv)
            # — unet.py:143-148 — so the checkpoint name is `out.3`.
            h = _zeros_conv(cfg.out_channels, (1, 1), dtype, cfg.precision,
                            "out_3", zero=cfg.zero_init)(h)
            return h.reshape(h.shape[0], -1)
        if cfg.pool == "attention":
            return AttentionPool2d(
                cfg.num_head_channels, cfg.out_channels, dtype=dtype,
                precision=cfg.precision, attn_impl=cfg.attn_impl,
                name="out_2",
            )(h)
        raise ValueError(f"unknown pool {cfg.pool!r}")


class SuperResUNetADM(nn.Module):
    """Super-resolution ADM U-Net (reference SuperResModel,
    guided_diffusion/unet.py:784-798): conditions on a low-resolution image
    by bilinear-upsampling it to the target size and concatenating along
    channels; everything else is the plain UNetADM with 2× in_channels.
    The inner module owns the params, so tap/encode/decode methods work
    through `.unet` unchanged."""

    config: ADMConfig

    def setup(self):
        import dataclasses as _dc

        self.unet = UNetADM(
            _dc.replace(self.config, in_channels=2 * self.config.in_channels)
        )

    def __call__(self, x, t, low_res=None, y=None, deterministic=True):
        if low_res is None:
            raise ValueError("SuperResUNetADM requires low_res conditioning")
        b, hh, ww, _ = x.shape
        up = jax.image.resize(
            low_res, (low_res.shape[0], hh, ww, low_res.shape[-1]), "bilinear"
        )
        up = jnp.broadcast_to(up, (b,) + up.shape[1:])
        return self.unet(jnp.concatenate([x, up], axis=-1), t, y=y,
                         deterministic=deterministic)
