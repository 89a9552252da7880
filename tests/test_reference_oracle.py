"""Composed-algorithm oracle: the REFERENCE's own power iteration (torch)
vs our local_pullback, through the real checkpoint converter.

VERDICT r1 item 4. Previous parity tests exercised layers in isolation;
this one runs the reference's actual `local_encoder_pullback_xt`
(/root/reference/src/utils/utils.py:165-249, extracted verbatim by AST so
its torch/einops code executes unmodified) on a torch mirror of our tiny
UNet whose weights come out of `flax_params_to_torch_state_dict` — i.e. the
full pipeline a user of the converter relies on:

    flax params ──converter──▶ torch state dict ──▶ torch forward (ε parity)
                                   │
                                   ▼
                reference Algorithm 1 (jacfwd + autograd.jacobian + SVD)
                                   │
          compare_bases (σ-gap-grouped principal angles) vs local_pullback

Acceptance is BASELINE.md's: per-direction cosine ≥ 0.99 within σ-gap
groups and singular values within 5%.
"""

import ast
import math
import pathlib
import time

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusion_pullback_tpu.geometry import local_pullback  # noqa: E402
from diffusion_pullback_tpu.geometry.metrics import (  # noqa: E402
    compare_bases,
    passes_acceptance,
)
from diffusion_pullback_tpu.models import TapPoint, UNet2D, ddpm_tiny  # noqa: E402
from diffusion_pullback_tpu.models.convert import (  # noqa: E402
    flax_params_to_torch_state_dict,
)

REFERENCE_UTILS = pathlib.Path("/root/reference/src/utils/utils.py")


pytestmark = pytest.mark.slow  # heavy e2e/oracle/mesh (make test-all)


def _load_reference_pullback():
    """Extract the reference's module-level `local_encoder_pullback_xt`
    function (utils.py:165-249) without importing the module (its top-level
    imports need diffusers, absent here). The function body itself only
    touches torch / time / einops.einsum."""
    from einops import einsum

    tree = ast.parse(REFERENCE_UTILS.read_text())
    fn = next(
        node for node in tree.body
        if isinstance(node, ast.FunctionDef)
        and node.name == "local_encoder_pullback_xt"
    )
    module = ast.Module(body=[fn], type_ignores=[])
    ns = {"torch": torch, "time": time, "einsum": einsum}
    exec(compile(module, str(REFERENCE_UTILS), "exec"), ns)
    return ns["local_encoder_pullback_xt"]


class TorchTinyUNet:
    """Functional torch (NCHW) mirror of models/unet2d.UNet2D at the
    ddpm_tiny config, consuming the converter-exported state dict by its
    torch names — the shape a real diffusers checkpoint has on disk.

    Exposes the reference's model contract: `get_h(x, t=..., op=...,
    block_idx=...)` (utils.py:113-163) plus the full ε forward.
    """

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
            x.contiguous(), self.cfg.norm_num_groups, self.sd[f"{name}.weight"],
            self.sd[f"{name}.bias"], eps=self.cfg.norm_eps,
        )

    def _t_emb(self, t, batch):
        dim = self.cfg.block_out_channels[0]
        half = dim // 2
        t = torch.as_tensor(t, dtype=torch.float32).reshape(-1)
        if t.numel() == 1:
            t = t.expand(batch)
        exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
        exponent = exponent / (half - self.cfg.freq_shift)
        emb = t[:, None] * torch.exp(exponent)[None, :]
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
        h = self._gn(f"{name}.group_norm", x)
        tok = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q = self._linear(f"{name}.to_q", tok)
        k = self._linear(f"{name}.to_k", tok)
        v = self._linear(f"{name}.to_v", tok)
        probs = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
        out = self._linear(f"{name}.to_out", probs @ v)
        return x + out.reshape(b, hh, ww, c).permute(0, 3, 1, 2)

    # -- model graph (tiny config: layers_per_block=1) ------------------------

    def _down(self, x, temb):
        """conv_in + down blocks; returns (h, skips) like UNet2D._run_down."""
        skips = [x]
        # down block 0: 'down' (resnet, downsample)
        x = self._resnet("down_blocks.0.resnets.0", x, temb)
        skips.append(x)
        x = self._conv("down_blocks.0.downsamplers.0", x, stride=2)
        skips.append(x)
        # down block 1: 'attn_down' (resnet, attention), no downsample
        x = self._resnet("down_blocks.1.resnets.0", x, temb)
        x = self._attention("down_blocks.1.attentions.0", x)
        skips.append(x)
        return x, skips

    def _mid(self, x, temb):
        x = self._resnet("mid_block.resnets.0", x, temb)
        x = self._attention("mid_block.attentions.0", x)
        return self._resnet("mid_block.resnets.1", x, temb)

    def get_h(self, x, t=None, op=None, block_idx=None):
        """Reference model contract (utils.py:113-163): mid-block tap."""
        assert (op, block_idx) == ("mid", 0)
        temb = self._t_emb(t, x.shape[0])
        h = self._conv("conv_in", x)
        h, _ = self._down(h, temb)
        return self._mid(h, temb)

    def forward(self, x, t):
        temb = self._t_emb(t, x.shape[0])
        h = self._conv("conv_in", x)
        h, skips = self._down(h, temb)
        h = self._mid(h, temb)
        # up block 0: 'attn_up', 2 layers + upsample
        for i in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = self._resnet(f"up_blocks.0.resnets.{i}", h, temb)
            h = self._attention(f"up_blocks.0.attentions.{i}", h)
        h = F.interpolate(h, scale_factor=2, mode="nearest")
        h = self._conv("up_blocks.0.upsamplers.0", h)
        # up block 1: 'up', 2 layers, no upsample
        for i in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = self._resnet(f"up_blocks.1.resnets.{i}", h, temb)
        h = F.silu(self._gn("conv_norm_out", h))
        return self._conv("conv_out", h)


@pytest.fixture(scope="module")
def rig():
    cfg = ddpm_tiny(16)
    model = UNet2D(cfg)
    params = model.init(
        jax.random.key(11), jnp.zeros((1, 16, 16, 3)), jnp.float32(0.0)
    )
    sd = flax_params_to_torch_state_dict(params)
    return cfg, model, params, TorchTinyUNet(sd, cfg)


def test_converted_eps_parity(rig):
    """Full tiny-UNet ε parity through the converter: the torch forward on
    the exported state dict matches the flax forward to ≤1e-5 (BASELINE.md
    checkpoint-conversion acceptance)."""
    cfg, model, params, tmodel = rig
    x = np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32)
    t = 403.7
    eps_jax = np.asarray(model.apply(params, jnp.asarray(x), jnp.float32(t)))
    with torch.no_grad():
        eps_t = tmodel.forward(
            torch.as_tensor(x).permute(0, 3, 1, 2), t
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(eps_t, eps_jax, atol=1e-5, rtol=1e-5)


def test_reference_algorithm1_oracle(rig):
    """The reference's own power iteration (extracted source, torch autodiff,
    LAPACK SVD) and our local_pullback agree on the pullback spectrum and the
    σ-gap-grouped singular directions at the mid tap."""
    cfg, model, params, tmodel = rig
    rank, top = 8, 6   # slack probes: the trailing direction of a rank-k
    # subspace iteration absorbs the unconverged residual (in BOTH
    # implementations — the reference's own convergence printout never drops
    # for it), so acceptance compares the leading `top` triplets
    x = np.random.default_rng(3).normal(size=(1, 16, 16, 3)).astype(np.float32)
    t = 403.7

    ref_pullback = _load_reference_pullback()
    torch.manual_seed(0)
    u_ref, s_ref, vT_ref = ref_pullback(
        tmodel, torch.as_tensor(x).permute(0, 3, 1, 2).contiguous(), t,
        op="mid", block_idx=0, pca_rank=rank, chunk_size=4,
        min_iter=4, max_iter=30, convergence_threshold=1e-5,
    )
    # reference rows flatten NCHW; ours flatten NHWC — re-layout for compare
    vT_ref = (
        vT_ref.detach().numpy().reshape(rank, 3, 16, 16)
        .transpose(0, 2, 3, 1).reshape(rank, -1)
    )
    s_ref = s_ref.detach().numpy()

    res = local_pullback(
        lambda z: model.apply(
            params, z, jnp.float32(t), TapPoint("mid", 0), method=UNet2D.encode
        ),
        jnp.asarray(x), jax.random.key(5),
        pca_rank=rank, min_iter=6, max_iter=30, atol=1e-6,
    )

    cmp = compare_bases(
        np.asarray(res.vT)[:top], np.asarray(res.s)[:top],
        vT_ref[:top], s_ref[:top],
    )
    assert passes_acceptance(cmp), (
        cmp.per_direction_cos, cmp.sigma_rel_err
    )
