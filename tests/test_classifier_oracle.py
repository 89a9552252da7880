"""EncoderUNetADM vs the reference's own EncoderUNetModel (imported from
/root/reference and EXECUTED as the oracle — no reference code is copied).

This is the layout + math proof for the guidance classifier: real torch
weights from the reference module flow through convert_torch_state_dict and
must reproduce the reference logits. Catches qkv head-order mistakes in the
attention pool (QKVAttention block order, unet.py:363-393) and Sequential
index naming (adaptive head conv is `out.3`, unet.py:143-148) that a
self-consistent round-trip test cannot see.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusion_pullback_tpu.models import EncoderUNetADM  # noqa: E402
from diffusion_pullback_tpu.models.configs import ADMEncoderConfig  # noqa: E402
from diffusion_pullback_tpu.models.convert import (  # noqa: E402
    convert_torch_state_dict,
)

REF_MODELS = "/root/reference/src/models"


def _ref_unet_module():
    if REF_MODELS not in sys.path:
        sys.path.insert(0, REF_MODELS)
    # unet.py imports torchvision.utils only for its pullback debug dumps;
    # torchvision isn't installed here — stub the names it touches at import
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    from guided_diffusion import unet

    return unet


def _ours_config(pool: str) -> ADMEncoderConfig:
    # channels ≥ 32 so the reference's fixed GroupNorm32 applies; mid
    # channels 64 with num_head_channels 8 → 8 heads, so any head-order
    # mismatch in the pool is numerically visible
    return ADMEncoderConfig(
        image_size=16, in_channels=3, out_channels=10, model_channels=32,
        num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(2,),
        num_head_channels=8, norm_num_groups=32, pool=pool,
    )


@pytest.mark.parametrize("pool", ["attention", "adaptive"])
def test_classifier_logits_match_reference(pool):
    unet = _ref_unet_module()
    ref = unet.EncoderUNetModel(
        image_size=16, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=8, use_scale_shift_norm=True, resblock_updown=True,
        pool=pool,
    )
    # re-randomize zero_module'd convs so the comparison is non-trivial
    gen = torch.Generator().manual_seed(0)
    sd = ref.state_dict()
    for k, v in sd.items():
        if v.ndim > 0 and not v.abs().sum().item():
            sd[k] = 0.1 * torch.randn(v.shape, generator=gen)
    ref.load_state_dict(sd)
    ref.eval()

    ours = EncoderUNetADM(_ours_config(pool))
    x = np.random.default_rng(1).normal(size=(2, 16, 16, 3)).astype(
        np.float32)
    template = ours.init(jax.random.key(0), jnp.asarray(x),
                         jnp.float32(0.0))
    params = convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()}, template)

    t = np.asarray([3.0, 250.0], np.float32)
    with torch.no_grad():
        want = ref(torch.as_tensor(x.transpose(0, 3, 1, 2)),
                   torch.as_tensor(t)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
