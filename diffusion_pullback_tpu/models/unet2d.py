"""Unconditional 2-D diffusion U-Net with first-class feature taps.

This is the TPU-native re-design of the reference's model layer for the DDPM
family. Where the reference monkey-patches `get_h` / `get_h_to_e` /
`forward_dh` onto diffusers modules by re-writing their forward passes
(/root/reference/src/utils/utils.py:113-163, 438-719), here the tap is part
of the module contract:

    eps              = unet.apply(params, x, t)
    h                = unet.apply(params, x, t, tap, method=UNet2D.encode)
    h, state         = unet.apply(params, x, t, tap, method=UNet2D.encode_with_state)
    eps              = unet.apply(params, h, state, tap, method=UNet2D.decode_with_state)

`encode` traces only the sub-graph up to the tap (a 'mid' tap never builds
the up blocks — the compiler sees exactly the Jacobian-relevant slice), and
`decode_with_state` resumes from a (possibly batch-expanded) h, broadcasting
the cached skip activations across the probe batch — the functional
equivalent of get_h_to_e's `res_sample.repeat(pca_rank, 1, 1, 1)`
(utils.py:582,595,605). Unlike the reference, 'up' taps are supported in the
decode direction too.

Tap semantics (matching utils.py:476-525):
    ('down', i) → output of down block i (after its downsampler)
    ('mid', 0)  → mid block output
    ('up', i)   → output of up block i

Layout is NHWC throughout (TPU-native); converters transpose torch NCHW.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .configs import UNet2DConfig
from .layers import (
    Downsample2D,
    ResnetBlock,
    SelfAttention2D,
    TimestepEmbedMLP,
    Upsample2D,
    timestep_embedding,
)


class TapPoint(NamedTuple):
    op: str            # 'down' | 'mid' | 'up'
    block_idx: int = 0
    # intra-block tap (encode-only, like the reference's down_block_forward
    # after_res/after_sa taps, utils.py:638-719): ('res', j) → after resnet j
    # of the block; ('attn', j) → after self-attention j. None = block output.
    inner: Optional[Tuple[str, int]] = None

    def validate(self, num_down: int, num_up: int) -> "TapPoint":
        if self.op == "mid":
            if self.block_idx != 0:
                raise ValueError("mid tap requires block_idx == 0")
        elif self.op == "down":
            if not 0 <= self.block_idx < num_down:
                raise ValueError(f"down tap block_idx out of range: {self.block_idx}")
        elif self.op == "up":
            if not 0 <= self.block_idx < num_up:
                raise ValueError(f"up tap block_idx out of range: {self.block_idx}")
        else:
            raise ValueError(f"invalid tap op: {self.op!r}")
        if self.inner is not None:
            if self.op != "down":
                raise ValueError("inner taps are only supported on down blocks")
            kind, _ = self.inner
            if kind not in ("res", "attn"):
                raise ValueError(f"invalid inner tap kind: {kind!r}")
        return self


class TapState(NamedTuple):
    """Everything needed to resume the forward pass from a tap.

    ``skips`` excludes the tapped activation itself for 'down' taps (decode
    re-inserts the supplied h as its own skip, mirroring the reference's
    `res_samples[-1] = input_h` at utils.py:581,594).
    """

    emb: jax.Array
    skips: Tuple[jax.Array, ...]


def _broadcast_state(state: TapState, batch: int) -> TapState:
    """Expand a batch-1 state to the probe batch (broadcast, no copy in XLA)."""
    b0 = state.emb.shape[0]
    if b0 == batch:
        return state
    if b0 != 1:
        raise ValueError(f"state batch {b0} incompatible with h batch {batch}")
    bc = lambda a: jnp.broadcast_to(a, (batch,) + a.shape[1:])
    return TapState(bc(state.emb), tuple(bc(s) for s in state.skips))


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_attention: bool
    add_downsample: bool
    attention_head_dim: Optional[int]
    norm_num_groups: int
    norm_eps: float
    dropout: float
    asymmetric_downsample: bool
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True, stop_at=None):
        res = []
        for i in range(self.num_layers):
            x = ResnetBlock(
                self.out_channels,
                norm_num_groups=self.norm_num_groups,
                eps=self.norm_eps,
                dropout=self.dropout,
                dtype=self.dtype,
                precision=self.precision,
                name=f"resnets_{i}",
            )(x, temb, deterministic)
            if stop_at == ("res", i):
                return x, tuple(res)
            if self.add_attention:
                x = SelfAttention2D(
                    num_head_channels=self.attention_head_dim,
                    norm_num_groups=self.norm_num_groups,
                    eps=self.norm_eps,
                    dtype=self.dtype,
                    precision=self.precision,
                    name=f"attentions_{i}",
                )(x)
                if stop_at == ("attn", i):
                    return x, tuple(res)
            res.append(x)
        if self.add_downsample:
            x = Downsample2D(
                self.out_channels,
                asymmetric=self.asymmetric_downsample,
                dtype=self.dtype,
                precision=self.precision,
                name="downsamplers_0",
            )(x)
            res.append(x)
        return x, tuple(res)


class UpBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_attention: bool
    add_upsample: bool
    attention_head_dim: Optional[int]
    norm_num_groups: int
    norm_eps: float
    dropout: float
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, res_samples: Tuple[jax.Array, ...], temb, deterministic=True):
        for i in range(self.num_layers):
            r = res_samples[-1]
            res_samples = res_samples[:-1]
            x = jnp.concatenate([x, r], axis=-1)
            x = ResnetBlock(
                self.out_channels,
                norm_num_groups=self.norm_num_groups,
                eps=self.norm_eps,
                dropout=self.dropout,
                dtype=self.dtype,
                precision=self.precision,
                name=f"resnets_{i}",
            )(x, temb, deterministic)
            if self.add_attention:
                x = SelfAttention2D(
                    num_head_channels=self.attention_head_dim,
                    norm_num_groups=self.norm_num_groups,
                    eps=self.norm_eps,
                    dtype=self.dtype,
                    precision=self.precision,
                    name=f"attentions_{i}",
                )(x)
        if self.add_upsample:
            x = Upsample2D(
                self.out_channels, dtype=self.dtype, precision=self.precision,
                name="upsamplers_0",
            )(x)
        return x


class MidBlock(nn.Module):
    channels: int
    add_attention: bool
    attention_head_dim: Optional[int]
    norm_num_groups: int
    norm_eps: float
    dropout: float
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, temb, deterministic=True):
        x = ResnetBlock(
            self.channels,
            norm_num_groups=self.norm_num_groups,
            eps=self.norm_eps,
            dropout=self.dropout,
            dtype=self.dtype,
            precision=self.precision,
            name="resnets_0",
        )(x, temb, deterministic)
        if self.add_attention:
            x = SelfAttention2D(
                num_head_channels=self.attention_head_dim,
                norm_num_groups=self.norm_num_groups,
                eps=self.norm_eps,
                dtype=self.dtype,
                precision=self.precision,
                name="attentions_0",
            )(x)
        x = ResnetBlock(
            self.channels,
            norm_num_groups=self.norm_num_groups,
            eps=self.norm_eps,
            dropout=self.dropout,
            dtype=self.dtype,
            precision=self.precision,
            name="resnets_1",
        )(x, temb, deterministic)
        return x


class UNet2D(nn.Module):
    config: UNet2DConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        precision = cfg.precision
        self._dtype, self._precision = dtype, precision
        ch0 = cfg.block_out_channels[0]
        self.conv_in = nn.Conv(
            ch0, (3, 3), padding=1, dtype=dtype, precision=precision
        )
        self.time_mlp = TimestepEmbedMLP(
            cfg.time_embed_dim or 4 * ch0, dtype=dtype, precision=precision
        )

        down = []
        n_down = len(cfg.down_block_types)
        for i, bt in enumerate(cfg.down_block_types):
            down.append(
                DownBlock(
                    out_channels=cfg.block_out_channels[i],
                    num_layers=cfg.layers_per_block,
                    add_attention=(bt == "attn_down"),
                    add_downsample=(i < n_down - 1),
                    attention_head_dim=cfg.attention_head_dim,
                    norm_num_groups=cfg.norm_num_groups,
                    norm_eps=cfg.norm_eps,
                    dropout=cfg.dropout,
                    asymmetric_downsample=cfg.asymmetric_downsample,
                    dtype=dtype,
                    precision=precision,
                )
            )
        self.down_blocks = down

        self.mid_block = MidBlock(
            channels=cfg.block_out_channels[-1],
            add_attention=cfg.add_mid_attention,
            attention_head_dim=cfg.attention_head_dim,
            norm_num_groups=cfg.norm_num_groups,
            norm_eps=cfg.norm_eps,
            dropout=cfg.dropout,
            dtype=dtype,
            precision=precision,
        )

        up = []
        rev = tuple(reversed(cfg.block_out_channels))
        n_up = len(cfg.up_block_types)
        for i, bt in enumerate(cfg.up_block_types):
            up.append(
                UpBlock(
                    out_channels=rev[i],
                    num_layers=cfg.layers_per_block + 1,
                    add_attention=(bt == "attn_up"),
                    add_upsample=(i < n_up - 1),
                    attention_head_dim=cfg.attention_head_dim,
                    norm_num_groups=cfg.norm_num_groups,
                    norm_eps=cfg.norm_eps,
                    dropout=cfg.dropout,
                    dtype=dtype,
                    precision=precision,
                )
            )
        self.up_blocks = up

        self.conv_norm_out = nn.GroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps, dtype=dtype
        )
        self.conv_out = nn.Conv(
            cfg.effective_out_channels, (3, 3), padding=1,
            dtype=dtype, precision=precision,
        )

    # ---- internals --------------------------------------------------------

    def _embed(self, t: jax.Array, batch: int) -> jax.Array:
        cfg = self.config
        t = jnp.asarray(t)
        if t.ndim == 0:
            t = jnp.broadcast_to(t[None], (batch,))
        feat = timestep_embedding(
            t, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        return self.time_mlp(feat)

    def _run_down(self, h, emb, stop_at: Optional[int], deterministic):
        """Run down blocks; if stop_at is set, stop after that block and drop
        its own output from the skip list (decode re-adds the tapped h)."""
        skips = (h,)
        for i, block in enumerate(self.down_blocks):
            h, res = block(h, emb, deterministic)
            if stop_at == i:
                return h, skips + res[:-1]
            skips = skips + res
        return h, skips

    def _run_up(self, h, skips, emb, deterministic):
        n_res = self.config.layers_per_block + 1
        for block in self.up_blocks:
            res = skips[-n_res:]
            skips = skips[:-n_res]
            h = block(h, res, emb, deterministic)
        return h

    def _head(self, h):
        return self.conv_out(nn.silu(self.conv_norm_out(h)))

    # ---- public methods ---------------------------------------------------

    def __call__(self, x, t, deterministic: bool = True):
        """Full forward pass: predict ε (or [ε, logvar] if learn_sigma)."""
        emb = self._embed(t, x.shape[0])
        h = self.conv_in(x)
        h, skips = self._run_down(h, emb, None, deterministic)
        h = self.mid_block(h, emb, deterministic)
        h = self._run_up(h, skips, emb, deterministic)
        return self._head(h)

    def encode(self, x, t, tap: TapPoint, deterministic: bool = True):
        """Run the sub-graph x → h(tap) only (reference get_h)."""
        return self.encode_with_state(x, t, tap, deterministic)[0]

    def encode_with_state(self, x, t, tap: TapPoint, deterministic: bool = True):
        tap = TapPoint(*tap).validate(len(self.down_blocks), len(self.up_blocks))
        emb = self._embed(t, x.shape[0])
        h = self.conv_in(x)
        if tap.inner is not None:
            # encode-only intra-block tap (the reference's get_h_to_e asserts
            # these out of the decode path too, utils.py:544)
            for i in range(tap.block_idx):
                h, res = self.down_blocks[i](h, emb, deterministic)
            h, _ = self.down_blocks[tap.block_idx](
                h, emb, deterministic, stop_at=tap.inner
            )
            return h, TapState(emb, ())
        if tap.op == "down":
            h, skips = self._run_down(h, emb, tap.block_idx, deterministic)
            return h, TapState(emb, skips)
        h, skips = self._run_down(h, emb, None, deterministic)
        h = self.mid_block(h, emb, deterministic)
        if tap.op == "mid":
            return h, TapState(emb, skips)
        n_res = self.config.layers_per_block + 1
        for i, block in enumerate(self.up_blocks):
            res = skips[-n_res:]
            skips = skips[:-n_res]
            h = block(h, res, emb, deterministic)
            if tap.block_idx == i:
                return h, TapState(emb, skips)
        raise AssertionError("unreachable")

    def decode_with_state(
        self, h, state: TapState, tap: TapPoint, deterministic: bool = True
    ):
        """Resume h(tap) → ε, broadcasting cached skips over h's batch
        (reference get_h_to_e, utils.py:529-635 — extended to 'up' taps)."""
        tap = TapPoint(*tap).validate(len(self.down_blocks), len(self.up_blocks))
        if tap.inner is not None:
            raise NotImplementedError(
                "decode from intra-block taps is not supported (reference "
                "get_h_to_e asserts the same, utils.py:544)"
            )
        state = _broadcast_state(TapState(*state), h.shape[0])
        emb, skips = state.emb, state.skips
        if tap.op == "down":
            skips = skips + (h,)
            for i in range(tap.block_idx + 1, len(self.down_blocks)):
                h, res = self.down_blocks[i](h, emb, deterministic)
                skips = skips + res
            h = self.mid_block(h, emb, deterministic)
            h = self._run_up(h, skips, emb, deterministic)
        elif tap.op == "mid":
            h = self._run_up(h, skips, emb, deterministic)
        else:  # up
            n_res = self.config.layers_per_block + 1
            for i in range(tap.block_idx + 1, len(self.up_blocks)):
                res = skips[-n_res:]
                skips = skips[:-n_res]
                h = self.up_blocks[i](h, res, emb, deterministic)
        return self._head(h)

    def shallow_encode(self, x, t, deterministic: bool = True) -> TapState:
        """Cheap shallow pass: time embedding + conv_in + the first down
        block's resnet/attention outputs — exactly the skips the LAST up
        block consumes. Powers encoder-reuse sampling (samplers/deepcache.py):
        deep features are cached across steps, only this shallow slice and
        the last up block recompute per step."""
        emb = self._embed(t, x.shape[0])
        h = self.conv_in(x)
        block = self.down_blocks[0]
        kind = "attn" if block.add_attention else "res"
        out, res = block(
            h, emb, deterministic,
            stop_at=(kind, self.config.layers_per_block - 1),
        )
        return TapState(emb, (h,) + res + (out,))

    def forward_dh(
        self, x, t, dh, tap: TapPoint, deterministic: bool = True
    ):
        """ε(x with h(tap) := h(tap) + dh) — reference forward_dh
        (utils.py:350-436): perturb the tapped feature, finish the pass."""
        h, state = self.encode_with_state(x, t, tap, deterministic)
        return self.decode_with_state(h + dh, state, tap, deterministic)
