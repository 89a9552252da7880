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
