"""Config-generic functional torch (NCHW) mirror of models/unet2d.UNet2D.

Consumes the converter-exported state dict by its *torch names* — the shape
a real diffusers checkpoint has on disk (google/ddpm-ema-celebahq-256 etc.,
the loaders at /root/reference/src/utils/utils.py:56-111) — so forwarding
through it validates the converter mapping end to end at any config,
including the full released-checkpoint layouts. Generalizes the tiny
hard-wired mirror in test_reference_oracle.py to arbitrary
``UNet2DConfig``s (block types, layers_per_block, head dims, asymmetric
downsampling).

It also exposes the reference's model contract (`get_h(x, t=…, op=…,
block_idx=…)`, utils.py:113-163) so the reference's own extracted
algorithms (Algorithm 1, YHCustomScheduler loops) can run on it unmodified.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


class TorchUNet2D:
    def __init__(self, state_dict, cfg):
        self.sd = {
            k: torch.as_tensor(np.asarray(v), dtype=torch.float32)
            for k, v in state_dict.items()
        }
        self.cfg = cfg

    # -- primitives ----------------------------------------------------------

    def _conv(self, name, x, stride=1, padding=1):
        return F.conv2d(
            x, self.sd[f"{name}.weight"], self.sd[f"{name}.bias"],
            stride=stride, padding=padding,
        )

    def _linear(self, name, x):
        return F.linear(x, self.sd[f"{name}.weight"], self.sd[f"{name}.bias"])

    def _gn(self, name, x):
        # autograd.functional.jacobian feeds non-contiguous views
        return F.group_norm(
            x.contiguous(), self.cfg.norm_num_groups,
            self.sd[f"{name}.weight"], self.sd[f"{name}.bias"],
            eps=self.cfg.norm_eps,
        )

    def _t_emb(self, t, batch):
        cfg = self.cfg
        dim = cfg.block_out_channels[0]
        half = dim // 2
        t = torch.as_tensor(t, dtype=torch.float32).reshape(-1)
        if t.numel() == 1:
            t = t.expand(batch)
        exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
        exponent = exponent / (half - cfg.freq_shift)
        emb = t[:, None] * torch.exp(exponent)[None, :]
        if cfg.flip_sin_to_cos:
            emb = torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)
        else:
            emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        emb = self._linear("time_embedding.linear_1", emb)
        return self._linear("time_embedding.linear_2", F.silu(emb))

    def _resnet(self, name, x, temb):
        in_ch = x.shape[1]
        out_ch = self.sd[f"{name}.conv1.weight"].shape[0]
        h = F.silu(self._gn(f"{name}.norm1", x))
        h = self._conv(f"{name}.conv1", h)
        proj = self._linear(f"{name}.time_emb_proj", F.silu(temb))
        h = h + proj[:, :, None, None]
        h = F.silu(self._gn(f"{name}.norm2", h))
        h = self._conv(f"{name}.conv2", h)
        if in_ch != out_ch:
            x = self._conv(f"{name}.conv_shortcut", x, padding=0)
        return x + h

    def _attention(self, name, x):
        b, c, hh, ww = x.shape
        hd = self.cfg.attention_head_dim
        heads = 1 if hd is None else c // hd
        head_dim = c // heads
        h = self._gn(f"{name}.group_norm", x)
        tok = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q = self._linear(f"{name}.to_q", tok).view(b, -1, heads, head_dim)
        k = self._linear(f"{name}.to_k", tok).view(b, -1, heads, head_dim)
        v = self._linear(f"{name}.to_v", tok).view(b, -1, heads, head_dim)
        q, k, v = (a.transpose(1, 2) for a in (q, k, v))   # (b, heads, S, hd)
        probs = torch.softmax(
            q @ k.transpose(-1, -2) / math.sqrt(head_dim), dim=-1
        )
        out = (probs @ v).transpose(1, 2).reshape(b, hh * ww, c)
        out = self._linear(f"{name}.to_out", out)
        return x + out.reshape(b, hh, ww, c).permute(0, 3, 1, 2)

    def _downsample(self, name, x):
        if self.cfg.asymmetric_downsample:
            x = F.pad(x, (0, 1, 0, 1))
            return self._conv(name, x, stride=2, padding=0)
        return self._conv(name, x, stride=2)

    # -- model graph ---------------------------------------------------------

    def _down(self, x, temb, stop_at=None):
        """conv_in output in, (h, skips) out — mirrors UNet2D._run_down
        including the tap semantics (stop after block `stop_at`, drop its
        own output from the skip list)."""
        cfg = self.cfg
        skips = [x]
        n_down = len(cfg.down_block_types)
        for bi, bt in enumerate(cfg.down_block_types):
            res = []
            for li in range(cfg.layers_per_block):
                x = self._resnet(f"down_blocks.{bi}.resnets.{li}", x, temb)
                if bt == "attn_down":
                    x = self._attention(
                        f"down_blocks.{bi}.attentions.{li}", x)
                res.append(x)
            if bi < n_down - 1:
                x = self._downsample(f"down_blocks.{bi}.downsamplers.0", x)
                res.append(x)
            if stop_at == bi:
                return x, skips + res[:-1]
            skips += res
        return x, skips

    def _mid(self, x, temb):
        x = self._resnet("mid_block.resnets.0", x, temb)
        if self.cfg.add_mid_attention:
            x = self._attention("mid_block.attentions.0", x)
        return self._resnet("mid_block.resnets.1", x, temb)

    def _up(self, x, skips, temb):
        cfg = self.cfg
        n_res = cfg.layers_per_block + 1
        n_up = len(cfg.up_block_types)
        for bi, bt in enumerate(cfg.up_block_types):
            res = skips[-n_res:]
            skips = skips[:-n_res]
            for li in range(n_res):
                x = torch.cat([x, res[-1 - li]], dim=1)
                x = self._resnet(f"up_blocks.{bi}.resnets.{li}", x, temb)
                if bt == "attn_up":
                    x = self._attention(f"up_blocks.{bi}.attentions.{li}", x)
            if bi < n_up - 1:
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                x = self._conv(f"up_blocks.{bi}.upsamplers.0", x)
        return x

    def get_h(self, x, t=None, op=None, block_idx=None):
        """Reference model contract (utils.py:113-163; mid tap is the
        shipped path, down taps mirror UNet2D.encode)."""
        temb = self._t_emb(t, x.shape[0])
        h = self._conv("conv_in", x)
        if op == "down":
            h, _ = self._down(h, temb, stop_at=block_idx)
            return h
        assert (op, block_idx) == ("mid", 0)
        h, _ = self._down(h, temb)
        return self._mid(h, temb)

    def forward(self, x, t):
        temb = self._t_emb(t, x.shape[0])
        h = self._conv("conv_in", x)
        h, skips = self._down(h, temb)
        h = self._mid(h, temb)
        h = self._up(h, skips, temb)
        h = F.silu(self._gn("conv_norm_out", h))
        return self._conv("conv_out", h)

    def __call__(self, x, t):
        """diffusers-pipeline calling convention: model(x, t).sample — the
        reference's scheduler loops call unet(x, t)[0] / .sample."""
        out = self.forward(x, t)

        class _O:
            def __init__(self, s):
                self.sample = s

            def __getitem__(self, i):
                assert i == 0
                return self.sample

        return _O(out)


class TorchCondEncoderMirror:
    """Generic NCHW torch mirror of UNet2DCondition's conditioned get_h path
    (encode to the mid tap) at ANY UNet2DConditionConfig with linear
    transformer projections — used by the FULL-SIZE SD2.1 oracle
    (tests/test_fullscale_sd_oracle.py), generalizing the tiny hard-coded
    mirror in test_reference_oracle_sd.py. Consumes the converter-exported
    state dict and exposes the reference's conditioned model contract
    `get_h(sample, timestep=, encoder_hidden_states=, op=, block_idx=)`
    (/root/reference/src/utils/utils.py:438-527)."""

    def __init__(self, state_dict, cfg):
        assert cfg.use_linear_projection, (
            "mirror implements the SD2.x/SDXL linear proj_in/out layout")
        assert not cfg.addition_embed_dim, (
            "SDXL addition embeddings not mirrored here")
        self.sd = {
            k: torch.as_tensor(np.asarray(v), dtype=torch.float32)
            for k, v in state_dict.items()
        }
        self.cfg = cfg

    def _conv(self, name, x, stride=1, padding=1):
        return F.conv2d(x, self.sd[f"{name}.weight"], self.sd[f"{name}.bias"],
                        stride=stride, padding=padding)

    def _linear(self, name, x, bias=True):
        return F.linear(x, self.sd[f"{name}.weight"],
                        self.sd[f"{name}.bias"] if bias else None)

    def _gn(self, name, x, eps):
        return F.group_norm(
            x.contiguous(), self.cfg.norm_num_groups,
            self.sd[f"{name}.weight"], self.sd[f"{name}.bias"], eps=eps,
        )

    def _ln(self, name, x):
        return F.layer_norm(x, (x.shape[-1],), self.sd[f"{name}.weight"],
                            self.sd[f"{name}.bias"], eps=1e-6)

    def _t_emb(self, t, batch):
        cfg = self.cfg
        dim = cfg.block_out_channels[0]
        half = dim // 2
        t = torch.as_tensor(t, dtype=torch.float32).reshape(-1)
        if t.numel() == 1:
            t = t.expand(batch)
        exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
        exponent = exponent / (half - cfg.freq_shift)
        emb = t[:, None] * torch.exp(exponent)[None, :]
        parts = [torch.cos(emb), torch.sin(emb)]
        if not cfg.flip_sin_to_cos:
            parts = parts[::-1]
        emb = torch.cat(parts, dim=-1)
        emb = self._linear("time_embedding.linear_1", emb)
        return self._linear("time_embedding.linear_2", F.silu(emb))

    def _resnet(self, name, x, temb):
        in_ch = x.shape[1]
        out_ch = self.sd[f"{name}.conv1.weight"].shape[0]
        h = F.silu(self._gn(f"{name}.norm1", x, self.cfg.norm_eps))
        h = self._conv(f"{name}.conv1", h)
        proj = self._linear(f"{name}.time_emb_proj", F.silu(temb))
        h = h + proj[:, :, None, None]
        h = F.silu(self._gn(f"{name}.norm2", h, self.cfg.norm_eps))
        h = self._conv(f"{name}.conv2", h)
        if in_ch != out_ch:
            x = self._conv(f"{name}.conv_shortcut", x, padding=0)
        return x + h

    def _mha(self, name, x_tok, ctx, heads):
        b, sq, _ = x_tok.shape
        sk = ctx.shape[1]
        q = self._linear(f"{name}.to_q", x_tok, bias=False)
        k = self._linear(f"{name}.to_k", ctx, bias=False)
        v = self._linear(f"{name}.to_v", ctx, bias=False)
        d = q.shape[-1] // heads
        split = lambda a, s: a.reshape(b, s, heads, d).permute(0, 2, 1, 3)
        q, k, v = split(q, sq), split(k, sk), split(v, sk)
        probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
        out = (probs @ v).permute(0, 2, 1, 3).reshape(b, sq, heads * d)
        return self._linear(f"{name}.to_out", out)

    def _transformer(self, name, x, ctx, heads, depth):
        b, c, hh, ww = x.shape
        residual = x
        h = self._gn(f"{name}.norm", x, 1e-6)  # Transformer2D GN eps
        tok = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        tok = self._linear(f"{name}.proj_in", tok)
        for di in range(depth):
            blk = f"{name}.transformer_blocks.{di}"
            sa = self._ln(f"{blk}.norm1", tok)
            tok = tok + self._mha(f"{blk}.attn1", sa, sa, heads)
            tok = tok + self._mha(
                f"{blk}.attn2", self._ln(f"{blk}.norm2", tok), ctx, heads)
            ff_in = self._ln(f"{blk}.norm3", tok)
            proj = self._linear(f"{blk}.ff.net.0.proj", ff_in)
            a, gate = proj.chunk(2, dim=-1)
            tok = tok + self._linear(f"{blk}.ff.net.2",
                                     a * F.gelu(gate, approximate="none"))
        tok = self._linear(f"{name}.proj_out", tok)
        return residual + tok.reshape(b, hh, ww, c).permute(0, 3, 1, 2)

    def get_h(self, sample, timestep=None, encoder_hidden_states=None,
              op=None, block_idx=None):
        assert (op, block_idx) == ("mid", 0), "mirror taps the mid block only"
        cfg = self.cfg
        ctx = encoder_hidden_states
        temb = self._t_emb(timestep, sample.shape[0])
        h = self._conv("conv_in", sample)
        n = len(cfg.down_block_types)
        for i, bt in enumerate(cfg.down_block_types):
            for j in range(cfg.layers_per_block):
                h = self._resnet(f"down_blocks.{i}.resnets.{j}", h, temb)
                if bt == "cross":
                    h = self._transformer(
                        f"down_blocks.{i}.attentions.{j}", h, ctx,
                        cfg.attention_heads[i], cfg.transformer_depth[i])
            if i < n - 1:
                h = self._conv(f"down_blocks.{i}.downsamplers.0", h, stride=2)
        h = self._resnet("mid_block.resnets.0", h, temb)
        h = self._transformer("mid_block.attentions.0", h, ctx,
                              cfg.attention_heads[-1], cfg.transformer_depth[-1])
        return self._resnet("mid_block.resnets.1", h, temb)
