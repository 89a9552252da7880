"""diffusion_pullback_tpu — a TPU-native JAX framework for Riemannian-geometry
analysis and editing of diffusion-model latent spaces.

Re-designed from scratch (TPU-first: jit/vmap/lax.scan/pjit/Pallas) with the
capability surface of enkeejunior1/Diffusion-Pullback (NeurIPS 2023,
arXiv:2307.12868): DDIM inversion, pullback-metric SVD of U-Net feature maps,
x-space-guidance editing — for unconditional DDPM and Stable Diffusion model
families.

Layout:
    ops/        schedules, DDIM step math, attention kernels (Pallas + XLA)
    models/     Flax U-Nets / VAE / CLIP text with first-class feature taps
    geometry/   pullback power iteration, PCA, inverse-Jacobian, transport
    samplers/   lax.scan DDIM loops and x-space-guidance editing
    parallel/   mesh / sharding utilities and sharded pullback
    training/   diffusion trainer (DP/FSDP over a Mesh, EMA, bf16)
    experiments/ reference-parity experiment drivers + artifact cache
    utils/      config, datasets, logging
"""

__version__ = "0.1.0"
