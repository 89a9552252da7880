#!/usr/bin/env bash
# Released-checkpoint parity acceptance (BASELINE.md north star):
# run the day real weights exist on disk. Everything this script checks is
# already proven offline at the same scale on synthetic weights
# (tests/test_fullscale_convert*.py); this adds only the literal values.
#
# Usage:
#   ./scripts/parity_real_weights.sh /path/to/ddpm-ema-celebahq-256/diffusion_pytorch_model.bin
#
# Steps:
#   1. convert the checkpoint (models/convert.py) — the converter raises on
#      any missing/mismatched/unconsumed tensor, so a silent partial load is
#      impossible;
#   2. ε-parity of the converted model vs the torch checkpoint forward;
#   3. the composed reference pipeline (YHCustomScheduler inversion +
#      Algorithm 1, executed from /root/reference) vs our driver:
#      inversion latent <= 1e-4, sigma-gap-grouped basis cosine >= 0.99.
set -euo pipefail

CKPT=${1:?usage: parity_real_weights.sh /path/to/diffusion_pytorch_model.bin}

DPB_REAL_CHECKPOINT="$CKPT" python - <<'PY'
import os, sys
sys.path.insert(0, "tests")
import numpy as np
import torch
import jax, jax.numpy as jnp

from diffusion_pullback_tpu.models import UNet2D, TapPoint, ddpm_celebahq_256
from diffusion_pullback_tpu.models.convert import (
    convert_torch_state_dict, load_torch_checkpoint_file,
)
from diffusion_pullback_tpu.geometry import local_pullback
from diffusion_pullback_tpu.geometry.metrics import compare_bases, passes_acceptance
from diffusion_pullback_tpu.ops import DiffusionSchedule, ddim_timestep_grid
from diffusion_pullback_tpu.samplers.ddim_loop import ddim_invert
from torch_mirror import TorchUNet2D
from test_reference_oracle import _load_reference_pullback

ckpt = os.environ["DPB_REAL_CHECKPOINT"]
cfg = ddpm_celebahq_256()
model = UNet2D(cfg)
template = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.float32(0.0))
sd = load_torch_checkpoint_file(ckpt)
params = convert_torch_state_dict(sd, template)
print("[1/3] conversion complete:",
      sum(int(np.prod(np.shape(v))) for v in jax.tree.leaves(params)), "params")

tmodel = TorchUNet2D(sd, cfg)
x = np.random.default_rng(0).normal(size=(1, 256, 256, 3)).astype(np.float32)
t = 403.7
eps_jax = np.asarray(jax.jit(lambda p, xx: model.apply(p, xx, jnp.float32(t)))(
    params, jnp.asarray(x)))
with torch.no_grad():
    eps_t = tmodel.forward(torch.as_tensor(x).permute(0, 3, 1, 2), t
                           ).permute(0, 2, 3, 1).numpy()
err = np.abs(eps_t - eps_jax).max()
print(f"[2/3] eps parity max|err| = {err:.2e}")
assert err < 5e-4, "eps parity failed"

# composed: short inversion + converged Algorithm 1 vs local_pullback
sched = DiffusionSchedule.linear()
grid = ddim_timestep_grid(10, inversion=True)
ours_inv = np.asarray(jax.jit(lambda p, xx: ddim_invert(
    lambda z, tt: model.apply(p, z, tt), xx, sched, grid))(params, jnp.asarray(x)))

ref_pull = _load_reference_pullback()
torch.manual_seed(0)
u_r, s_r, vT_r = ref_pull(
    tmodel, torch.as_tensor(ours_inv).permute(0, 3, 1, 2).contiguous(), 403.7,
    op="mid", block_idx=0, pca_rank=8, chunk_size=4,
    min_iter=8, max_iter=50, convergence_threshold=1e-4,
)
vT_r = vT_r.detach().numpy().reshape(8, 3, 256, 256).transpose(0, 2, 3, 1).reshape(8, -1)
res = jax.jit(lambda p, xx: local_pullback(
    lambda z: model.apply(p, z, jnp.float32(403.7), TapPoint("mid", 0),
                          method=UNet2D.encode),
    xx, jax.random.key(5), pca_rank=8, min_iter=8, max_iter=50, atol=1e-5,
))(params, jnp.asarray(ours_inv))
cmp = compare_bases(np.asarray(res.vT)[:6], np.asarray(res.s)[:6],
                    vT_r[:6], s_r.detach().numpy()[:6])
print("[3/3] basis cosines:", cmp.per_direction_cos)
assert passes_acceptance(cmp), "basis acceptance failed"
print("PARITY OK")
PY
