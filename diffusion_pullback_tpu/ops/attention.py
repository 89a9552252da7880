"""Attention ops with switchable implementations.

The pullback machinery differentiates *through* attention with forward-mode
AD (jax.jvp / jax.linearize). The reference disables its only fused-attention
path (xformers) precisely because fused kernels lack forward-mode rules
(reference src/utils/utils.py:322-323). Here the XLA implementation is fully
jvp/vjp-differentiable by construction, and the Pallas flash kernel (see
ops/pallas/flash_attention.py) is used on the plain sampling path where only
primal evaluation matters; `impl='auto'` picks per-context.

Layout: (batch, seq, heads, head_dim) — TPU-native, feature dims last.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    precision=None,
) -> jax.Array:
    """Reference attention: softmax(q kᵀ · scale) v, computed in f32.

    q: (B, Sq, H, D), k/v: (B, Sk, H, D) → (B, Sq, H, D).
    Softmax runs in float32 regardless of input dtype (bf16-safe), the
    matmuls ask for f32 accumulation so the MXU keeps full precision.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    dtype = q.dtype
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k,
        preferred_element_type=jnp.float32, precision=precision,
    )
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        probs.astype(dtype),
        v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.astype(dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    impl: str = "auto",
    precision=None,
) -> jax.Array:
    """Dispatch between implementations.

    impl: 'xla' (differentiable reference), 'flash' (Pallas kernel, primal +
    custom VJP + custom JVP), or 'auto' (flash on TPU for long sequences,
    otherwise xla).
    """
    if impl == "xla":
        return xla_attention(q, k, v, scale, precision)
    if impl in ("flash", "auto"):
        try:
            from .pallas.flash_attention import flash_attention

            seq_q, seq_k = q.shape[1], k.shape[1]
            on_tpu = jax.default_backend() == "tpu"
            if impl == "flash" or (on_tpu and seq_q >= 1024 and seq_k >= 1024):
                return flash_attention(q, k, v, scale)
        except ImportError:
            pass
        return xla_attention(q, k, v, scale, precision)
    raise ValueError(f"unknown attention impl: {impl!r}")
