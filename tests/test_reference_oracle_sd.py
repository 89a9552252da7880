"""SD-flavour composed-algorithm oracle: the reference's own
`local_encoder_pullback_zt` (/root/reference/src/utils/utils.py:722-816 —
the text-conditioned Algorithm 1 with encoder_hidden_states, AST-extracted
so its torch/einops code runs unmodified) on a torch mirror of the tiny
conditional U-Net's get_h path, fed by `flax_params_to_torch_state_dict`,
vs our `local_pullback` through `UNet2DCondition.encode`.

Complements tests/test_reference_oracle.py (uncond flavour): this one
exercises the cross-attention transformer stack — GN→proj_in→[LN,
self-attn, LN, cross-attn, LN, GEGLU]→proj_out — under both autodiff
engines.
"""

import ast
import math
import pathlib
import time

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusion_pullback_tpu.geometry import local_pullback  # noqa: E402
from diffusion_pullback_tpu.geometry.metrics import (  # noqa: E402
    compare_bases,
    passes_acceptance,
)
from diffusion_pullback_tpu.models import (  # noqa: E402
    TapPoint,
    UNet2DCondition,
    sd_tiny_unet,
)
from diffusion_pullback_tpu.models.convert import (  # noqa: E402
    flax_params_to_torch_state_dict,
)

REFERENCE_UTILS = pathlib.Path("/root/reference/src/utils/utils.py")


pytestmark = pytest.mark.slow  # heavy e2e/oracle/mesh (make test-all)


def _load_reference_pullback_zt():
    from einops import einsum

    tree = ast.parse(REFERENCE_UTILS.read_text())
    fn = next(
        node for node in tree.body
        if isinstance(node, ast.FunctionDef)
        and node.name == "local_encoder_pullback_zt"
    )
    module = ast.Module(body=[fn], type_ignores=[])
    ns = {"torch": torch, "time": time, "einsum": einsum}
    exec(compile(module, str(REFERENCE_UTILS), "exec"), ns)
    return ns["local_encoder_pullback_zt"]


class TorchTinyCondEncoder:
    """Torch (NCHW) mirror of UNet2DCondition's get_h path at the
    sd_tiny_unet config: conv_in → cross-attn down block → plain down
    block → cross-attn mid block. Consumes the converter-exported state
    dict; exposes the reference's conditioned model contract
    `get_h(sample, timestep=, encoder_hidden_states=, op=, block_idx=)`
    (utils.py:438-527)."""

    def __init__(self, state_dict, cfg):
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
        # flax nn.LayerNorm default epsilon
        return F.layer_norm(x, (x.shape[-1],), self.sd[f"{name}.weight"],
                            self.sd[f"{name}.bias"], eps=1e-6)

    def _t_emb(self, t, batch):
        dim = self.cfg.block_out_channels[0]
        half = dim // 2
        t = torch.as_tensor(t, dtype=torch.float32).reshape(-1)
        if t.numel() == 1:
            t = t.expand(batch)
        exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
        exponent = exponent / (half - self.cfg.freq_shift)
        emb = t[:, None] * torch.exp(exponent)[None, :]
        # flip_sin_to_cos=True (SD family): [cos, sin]
        emb = torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)
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

    def _mha(self, name, x_tok, ctx):
        heads = self.cfg.attention_heads[0]
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

    def _transformer(self, name, x, ctx):
        b, c, hh, ww = x.shape
        residual = x
        h = self._gn(f"{name}.norm", x, 1e-6)  # Transformer2D GN eps
        tok = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        tok = self._linear(f"{name}.proj_in", tok)
        blk = f"{name}.transformer_blocks.0"
        tok = tok + self._mha(f"{blk}.attn1", self._ln(f"{blk}.norm1", tok),
                              self._ln(f"{blk}.norm1", tok))
        tok = tok + self._mha(f"{blk}.attn2", self._ln(f"{blk}.norm2", tok),
                              ctx)
        ff_in = self._ln(f"{blk}.norm3", tok)
        proj = self._linear(f"{blk}.ff.net.0.proj", ff_in)
        a, gate = proj.chunk(2, dim=-1)
        tok = tok + self._linear(f"{blk}.ff.net.2",
                                 a * F.gelu(gate, approximate="none"))
        tok = self._linear(f"{name}.proj_out", tok)
        return residual + tok.reshape(b, hh, ww, c).permute(0, 3, 1, 2)

    def get_h(self, sample, timestep=None, encoder_hidden_states=None,
              op=None, block_idx=None):
        assert (op, block_idx) == ("mid", 0)
        ctx = encoder_hidden_states
        temb = self._t_emb(timestep, sample.shape[0])
        h = self._conv("conv_in", sample)
        # down block 0: cross (resnet, transformer, downsample)
        h = self._resnet("down_blocks.0.resnets.0", h, temb)
        h = self._transformer("down_blocks.0.attentions.0", h, ctx)
        h = self._conv("down_blocks.0.downsamplers.0", h, stride=2)
        # down block 1: plain (resnet)
        h = self._resnet("down_blocks.1.resnets.0", h, temb)
        # mid: resnet, transformer, resnet
        h = self._resnet("mid_block.resnets.0", h, temb)
        h = self._transformer("mid_block.attentions.0", h, ctx)
        return self._resnet("mid_block.resnets.1", h, temb)


@pytest.fixture(scope="module")
def rig():
    cfg = sd_tiny_unet(16)
    unet = UNet2DCondition(cfg)
    z0 = jnp.zeros((1, 16, 16, 4))
    ctx0 = jnp.zeros((1, 8, cfg.cross_attention_dim))
    params = unet.init(jax.random.key(21), z0, jnp.float32(0.0), ctx0)
    sd = flax_params_to_torch_state_dict(params)
    return cfg, unet, params, TorchTinyCondEncoder(sd, cfg)


def test_cond_get_h_parity(rig):
    """The torch mirror of the conditioned get_h path (through the exported
    state dict) matches UNet2DCondition.encode to ≤1e-5."""
    cfg, unet, params, tmodel = rig
    rng = np.random.default_rng(4)
    z = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    ctx = rng.normal(size=(2, 8, cfg.cross_attention_dim)).astype(np.float32)
    t = 561.3
    h_jax = np.asarray(unet.apply(
        params, jnp.asarray(z), jnp.float32(t), jnp.asarray(ctx),
        TapPoint("mid", 0), method=UNet2DCondition.encode,
    ))
    with torch.no_grad():
        h_t = tmodel.get_h(
            torch.as_tensor(z).permute(0, 3, 1, 2).contiguous(),
            timestep=t, encoder_hidden_states=torch.as_tensor(ctx),
            op="mid", block_idx=0,
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(h_t, h_jax, atol=1e-5, rtol=1e-4)


def test_reference_sd_algorithm1_oracle(rig):
    """The reference's text-conditioned power iteration agrees with
    local_pullback through the encode tap (σ-gap-grouped cos ≥ 0.99)."""
    cfg, unet, params, tmodel = rig
    rank, top = 8, 6
    rng = np.random.default_rng(9)
    z = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    ctx = rng.normal(size=(1, 8, cfg.cross_attention_dim)).astype(np.float32)
    t = 561.3

    ref_pullback = _load_reference_pullback_zt()
    torch.manual_seed(0)
    u_ref, s_ref, vT_ref = ref_pullback(
        tmodel, torch.as_tensor(z).permute(0, 3, 1, 2).contiguous(), t,
        encoder_hidden_states=torch.as_tensor(ctx),
        op="mid", block_idx=0, pca_rank=rank, chunk_size=4,
        min_iter=4, max_iter=30, convergence_threshold=1e-5,
    )
    vT_ref = (
        vT_ref.detach().numpy().reshape(rank, 4, 16, 16)
        .transpose(0, 2, 3, 1).reshape(rank, -1)
    )
    s_ref = s_ref.detach().numpy()

    res = local_pullback(
        lambda q: unet.apply(
            params, q, jnp.float32(t), jnp.asarray(ctx), TapPoint("mid", 0),
            method=UNet2DCondition.encode,
        ),
        jnp.asarray(z), jax.random.key(13),
        pca_rank=rank, min_iter=6, max_iter=30, atol=1e-6,
    )

    cmp = compare_bases(
        np.asarray(res.vT)[:top], np.asarray(res.s)[:top],
        vT_ref[:top], s_ref[:top],
    )
    assert passes_acceptance(cmp), (cmp.per_direction_cos, cmp.sigma_rel_err)
