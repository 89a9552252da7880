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

    impl:
      'xla'       — reference implementation; jvp/vjp/transpose-native.
      'blockwise' — O(S·block) memory, still fully differentiable both modes.
      'flash'     — Pallas fused kernels (custom_vjp): fastest primal+grad,
                    but NOT forward-mode differentiable — never select it on
                    a path that will be jax.linearize'd (the pullback).
      'flash_jvp' — Pallas fused forward + streaming tangent kernel
                    (custom_jvp): for jax.jvp/linearize'd paths (the
                    pullback's tangent half). No transpose/reverse rule —
                    pair with 'flash' via local_pullback's fn_vjp.
      'ring'      — sequence-parallel exact attention over the mesh published
                    via parallel.ring_attention.set_ring_mesh (an 'sp' axis):
                    S shards over devices, K/V rotate with ppermute, partials
                    merge by row LSE. Inner kernel: fused Pallas LSE on
                    accelerators (primal-only — same discipline as 'flash'),
                    XLA on CPU (differentiable both modes). Falls back to the
                    dense path when no mesh is set, the sequence doesn't
                    divide, or shards drop below MIN_SHARD_TOKENS rows.
      'auto'      — safe default: blockwise for long sequences, else xla.
                    Deliberately avoids 'flash' because this dispatcher can't
                    see whether it is inside forward-mode AD.
    """
    if impl == "xla":
        return xla_attention(q, k, v, scale, precision)
    if impl == "blockwise":
        return blockwise_attention(q, k, v, scale, precision=precision)
    if impl in ("flash", "flash_jvp"):
        # fused kernels pay off on long self-attention; short or
        # block-irregular sequences (e.g. 77-token cross-attention context)
        # route to the XLA path, which is differentiable in every mode
        sq, sk = q.shape[1], k.shape[1]
        bq, bk = min(512, sq), min(512, sk)
        if sq < 1024 or sk < 128 or sq % bq or sk % bk:
            return xla_attention(q, k, v, scale, precision)
        interpret = jax.default_backend() == "cpu"  # tests / CPU-mesh runs
        if impl == "flash":
            from .pallas.flash_attention import flash_attention

            return flash_attention(q, k, v, scale, interpret=interpret)
        from .pallas.flash_attention import flash_attention_jvp

        return flash_attention_jvp(q, k, v, scale, interpret=interpret)
    if impl in ("ring", "ring_xla"):
        # 'ring_xla' forces the XLA inner kernel, which is differentiable in
        # both AD modes — the pullback drivers select it when the model's
        # sampling impl is 'ring' (the default flash inner is primal-only,
        # same constraint as 'flash')
        from ..parallel.ring_attention import (
            MIN_SHARD_TOKENS,
            get_ring_mesh,
            ring_attention,
        )

        mesh, axis = get_ring_mesh()
        n = int(mesh.shape[axis]) if mesh is not None else 1
        sq, sk = q.shape[1], k.shape[1]
        if (n > 1 and sq % n == 0 and sk % n == 0
                and min(sq, sk) // n >= MIN_SHARD_TOKENS):
            return ring_attention(
                q, k, v, scale, mesh=mesh, axis=axis, precision=precision,
                inner="xla" if impl == "ring_xla" else "auto",
                interpret=jax.default_backend() == "cpu",
            )
        if q.shape[1] >= 1024 and k.shape[1] >= 1024:
            return blockwise_attention(q, k, v, scale, precision=precision)
        return xla_attention(q, k, v, scale, precision)
    if impl == "auto":
        seq_q, seq_k = q.shape[1], k.shape[1]
        if seq_q >= 1024 and seq_k >= 1024:
            return blockwise_attention(q, k, v, scale, precision=precision)
        return xla_attention(q, k, v, scale, precision)
    raise ValueError(f"unknown attention impl: {impl!r}")


def blockwise_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_k: int = 1024,
    precision=None,
) -> jax.Array:
    """Memory-efficient attention in pure XLA: lax.scan over K/V blocks with
    an online-softmax carry — logits never materialise beyond (Sq, block_k).

    This is the *differentiation-friendly* long-sequence path: because it is
    built from ordinary jnp ops, JAX derives forward-mode (jvp), reverse-mode
    (vjp) and the linear transpose automatically — exactly what the pullback
    machinery needs at SDXL sequence lengths, where the reference must
    disable its fused kernel to keep jacfwd alive (utils.py:322-323) and a
    Pallas kernel would need hand-written jvp/transpose rules.

    Memory: O(Sq·block_k + Sq·D) instead of O(Sq·Sk).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sk <= block_k:
        return xla_attention(q, k, v, scale, precision)
    if sk % block_k != 0:
        # largest divisor of sk not exceeding the requested block size keeps
        # the scan uniform without masking/padding; pathological lengths
        # (primes → divisor 1) fall back to the dense path instead of a
        # thousands-step scan
        bk = block_k
        while sk % bk:
            bk -= 1
        if bk < max(64, block_k // 8):
            return xla_attention(q, k, v, scale, precision)
        block_k = bk
    nk = sk // block_k
    dtype = q.dtype

    kb = k.reshape(b, nk, block_k, h, d).transpose(1, 0, 2, 3, 4)
    vb = v.reshape(b, nk, block_k, h, d).transpose(1, 0, 2, 3, 4)

    def body(carry, kv):
        m, l, acc = carry                    # (b,h,sq,1), (b,h,sq,1), (b,sq,h,d)
        kblk, vblk = kv                      # (b, block_k, h, d)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kblk,
                       preferred_element_type=jnp.float32,
                       precision=precision) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)               # (b,h,sq,block_k) f32
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhqk,bkhd->bqhd", p.astype(dtype), vblk,
                        preferred_element_type=jnp.float32,
                        precision=precision)
        acc_new = acc * corr.transpose(0, 2, 1, 3) + pv
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b, h, sq, 1), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, sq, 1), jnp.float32),
        jnp.zeros((b, sq, h, d), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, (kb, vb))
    return (acc / l.transpose(0, 2, 1, 3)).astype(dtype)
