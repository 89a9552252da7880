"""Pallas TPU flash attention: fused forward + flash backward kernels.

Replaces the O(S²)-memory attention the reference is forced into (it
*disables* xformers to keep forward-mode AD alive — reference
src/utils/utils.py:322-323). Here the sampling path gets a fused blockwise
kernel — logits never touch HBM. Reverse-mode runs through the flash
backward kernels below (logsumexp recompute; measured 1.87x over XLA
attention fwd+bwd at 4096 tokens on v5e). Forward-mode paths (the pullback)
use the XLA/blockwise implementations in ops/attention.py, which JAX can
jvp/linearize/transpose natively; `attention(impl='auto')` dispatches.

Kernel shape: grid (B·H, S_q/Bq, S_k/Bk), K-blocks innermost; online-softmax
state (running max m, normalizer l, accumulator acc) lives in VMEM scratch
and is carried across the K-block axis of the grid (canonical Mosaic
accumulation pattern). All compute in f32 on the MXU via
preferred_element_type; inputs may be bf16.

Self-attention sizes this serves: SD up/down blocks 4096 tokens, VAE 4096,
SDXL mid 16384 (BASELINE config 5).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Every kernel below carries its online-softmax / accumulator scratch state
# only across the INNERMOST grid axis; the (B·H) and outer block axes are
# embarrassingly parallel. Declaring that lets Mosaic reorder/parallelize
# the outer axes instead of assuming a fully sequential grid.
_GRID_SEMANTICS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel", "arbitrary"))

# ---- block-size selection ---------------------------------------------------
# 512×512 is the hardware-validated default for every kernel. Running
# `bench.py --flash-tune --apply` on real hardware sweeps the hot shapes and
# persists any >2% winners into flash_tuned.json next to this module; the
# kernels consult that table per (kind, Sq, Sk, D) so a re-tune never needs
# a code change. Explicit block_q/block_k arguments always win (the sweep
# itself uses them).

_DEFAULT_BLOCK = 512
_TUNED_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "flash_tuned.json")
_TUNED: Optional[dict] = None


def _device_kind() -> str:
    """Best-effort device kind for keying tuned entries ('' if unknown)."""
    try:
        return jax.devices()[0].device_kind
    except Exception:
        return ""


def _tuned_table() -> dict:
    """Lazy-load {"{kind}:{sq}x{sk}:d{d}": [block_q, block_k]} written by
    `bench.py --flash-tune --apply`; missing/corrupt file → empty table,
    and individually malformed entries (non-int / non-positive blocks) are
    dropped rather than crashing every kernel call at that shape. Entries
    are measured on one device generation and may exceed VMEM on a smaller
    chip, so a table stamped with a ``_platform`` that differs from the
    running device kind is ignored wholesale (ADVICE r3) — the validated
    512x512 default applies instead of a foreign winner."""
    global _TUNED
    if _TUNED is None:
        try:
            with open(_TUNED_PATH) as f:
                raw = json.load(f)
            plat = raw.pop("_platform", None)
            if plat is not None and plat != _device_kind():
                _TUNED = {}
            else:
                _TUNED = {
                    k: (int(v[0]), int(v[1]))
                    for k, v in raw.items()
                    if isinstance(v, (list, tuple)) and len(v) == 2
                    and all(isinstance(x, int) and x > 0 for x in v)
                }
        except (OSError, ValueError, TypeError, AttributeError):
            _TUNED = {}
    return _TUNED


# Largest (block_q*block_k) tiling validated inside a COMPOSED differentiated
# program on v5e. The jvp/bwd kernels keep ~3-4 live (block_q, block_k) f32
# intermediates (s, p, ds, p*ds) on the scoped-VMEM stack, so a 1024x1024
# tiling that wins in a standalone sweep (~12 MB of intermediates alone)
# overflows the 16 MB scoped-vmem limit once the surrounding program (fused
# QKV residuals, probe vmap) adds its share — the r4 config3/config4 AOT
# compile fault ("Scoped allocation with size 16.95M and limit 16.00M",
# docs/compile_helper_faults.md). Table-sourced tilings above this product
# are CLAMPED by halving block_q until they fit (1024x1024 -> 512x1024:
# block_k stays wide, so the k-loop count — where the win mostly lives — is
# preserved; q-halving only doubles the embarrassingly-parallel outer grid
# axis). Explicit block args still win so the sweep can measure anything.
_DIFF_KERNEL_MAX_BLOCK_PRODUCT = 512 * 1024
_DIFF_KERNELS = ("jvp", "bwd")


def _blocks(kind: str, sq: int, sk: int, d: int,
            block_q: Optional[int] = None,
            block_k: Optional[int] = None) -> tuple:
    """Resolve kernel block sizes: explicit args win, then the tuned table,
    then the default. A stale tuned entry that no longer divides the
    sequence falls back to the default silently; explicit non-divisible
    arguments raise (caller asked for exactly that tiling)."""
    if block_q is None and block_k is None:
        block_q, block_k = _tuned_table().get(
            f"{kind}:{sq}x{sk}:d{d}", (_DEFAULT_BLOCK, _DEFAULT_BLOCK))
        if sq % min(block_q, sq) or sk % min(block_k, sk):
            block_q = block_k = _DEFAULT_BLOCK
        if kind in _DIFF_KERNELS:
            while (block_q * block_k > _DIFF_KERNEL_MAX_BLOCK_PRODUCT
                   and block_q > _DEFAULT_BLOCK):
                block_q //= 2
            if block_q * block_k > _DIFF_KERNEL_MAX_BLOCK_PRODUCT:
                block_q = block_k = _DEFAULT_BLOCK
    else:
        block_q = _DEFAULT_BLOCK if block_q is None else block_q
        block_k = _DEFAULT_BLOCK if block_k is None else block_k
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    if sq % block_q or sk % block_k:
        raise ValueError(f"sequence ({sq},{sk}) not divisible by blocks "
                         f"({block_q},{block_k})")
    return block_q, block_k


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (Bq, D)
    k = k_ref[0]  # (Bk, D)
    v = v_ref[0]  # (Bk, D)

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                        # (Bq, Bk) f32

    m_prev = m_ref[:, :1]                            # (Bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)        # (Bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp(m_prev - m_new)                   # (Bq, 1)
    p = jnp.exp(s - m_new)                           # (Bq, Bk)

    l_new = l_ref[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    block_q: Optional[int] = None, block_k: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """q: (BH, Sq, D), k/v: (BH, Sk, D) → (BH, Sq, D)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q, block_k = _blocks("fwd", sq, sk, d, block_q, block_k)
    grid = (bh, sq // block_q, sk // block_k)

    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # normalizer
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
        compiler_params=_GRID_SEMANTICS,
        interpret=interpret,
    )(q, k, v)


# ---- backward kernels -------------------------------------------------------
# Standard flash backward with recompute: the forward re-emits the row
# logsumexp L; dq accumulates over K blocks, dk/dv over Q blocks — two
# sequential-grid kernels so each output owns a single accumulator.

def _flash_fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                          m_ref, l_ref, acc_ref, *, scale):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_ref[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            m_ref[:, :1] + jnp.log(l_ref[:, :1]), lse_ref.shape[1:]
        ).astype(jnp.float32)


def _flash_forward_lse(q, k, v, scale, block_q=None, block_k=None,
                       interpret=False):
    bh, sq, d = q.shape
    sk = k.shape[1]
    # own tuned-table kind: this kernel carries an extra (bh, sq, 128) f32
    # output and different VMEM pressure than the plain forward, so 'fwd'
    # winners must not silently apply to it
    block_q, block_k = _blocks("fwd_lse", sq, sk, d, block_q, block_k)
    grid = (bh, sq // block_q, sk // block_k)
    return pl.pallas_call(
        functools.partial(_flash_fwd_lse_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, iq, ik: (b, iq, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=_GRID_SEMANTICS,
        interpret=interpret,
    )(q, k, v)


def _flash_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref, dq_ref,
                     acc_ref, *, scale):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    dlt = dlt_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(s - lse)                                    # (bq, bk)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dlt)                                     # (bq, bk)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                      dk_ref, dv_ref, dk_acc, dv_acc, *, scale):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    dlt = dlt_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(s - lse)                                    # (bq, bk)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),          # pᵀ do
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dlt)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q,
        dimension_numbers=(((0,), (0,)), ((), ())),          # dsᵀ q
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, do, lse, scale, block_q=None, block_k=None,
                    interpret=False):
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q, block_k = _blocks("bwd", sq, sk, d, block_q, block_k)
    # δ_i = Σ_d dO_i O_i — tiny elementwise reduce, fine in XLA; broadcast to
    # the 128-lane layout the kernels read
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (bh, sq, 128))

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale),
        grid=(bh, sq // block_q, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=_GRID_SEMANTICS,
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale),
        grid=(bh, sk // block_k, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, ik, iq: (b, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=_GRID_SEMANTICS,
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


def _xla_reference(q, k, v, scale):
    from ..attention import xla_attention

    return xla_attention(q, k, v, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale, interpret):
    return _flash_forward(q, k, v, scale, interpret=interpret)


def _flash_fwd(q, k, v, scale, interpret):
    o, lse = _flash_forward_lse(q, k, v, scale, interpret=interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, interpret, res, g):
    # Pallas flash backward: recompute P per block from the saved logsumexp.
    q, k, v, o, lse = res
    return _flash_backward(q, k, v, o, g, lse, scale, interpret=interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---- forward-mode (JVP) kernel ----------------------------------------------
# The reference's whole xformers-off constraint (utils.py:322-323) exists
# because fused attention kernels lack forward-mode rules. This one has one:
# given the forward's row logsumexp, the attention JVP is itself a streaming
# blockwise pass —
#     ṡ  = (q̇ kᵀ + q k̇ᵀ)·scale            per (Q,K) block
#     p  = exp(s − lse)                     recomputed, never materialised
#     ȯ  = Σ_k (p∘ṡ) v + p v̇  −  (Σ_k rowsum(p∘ṡ)) ∘ o
# so tangents cost ~2.5× the forward's matmuls with the same O(S·block)
# memory. Five MXU matmuls per block, all f32-accumulated.

def _flash_tangent_kernel(q_ref, k_ref, v_ref, dq_ref, dk_ref, dv_ref,
                          o_ref, lse_ref, do_ref, acc_ref, rsum_ref, *, scale):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        rsum_ref[:] = jnp.zeros_like(rsum_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    dq = dq_ref[0]
    dk = dk_ref[0]
    dv = dv_ref[0]
    lse = lse_ref[0][:, :1]

    dot = lambda a, b, dims: jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = dot(q, k, ((1,), (1,))) * scale                   # (Bq, Bk)
    p = jnp.exp(s - lse)                                  # true probs
    ds = (dot(dq, k, ((1,), (1,))) + dot(q, dk, ((1,), (1,)))) * scale
    pds = p * ds
    acc_ref[:] = acc_ref[:] + dot(pds.astype(v.dtype), v, ((1,), (0,))) \
        + dot(p.astype(dv.dtype), dv, ((1,), (0,)))
    rsum_ref[:] = rsum_ref[:] + jnp.sum(pds, axis=1, keepdims=True)

    @pl.when(ik == nk - 1)
    def _finish():
        o = o_ref[0].astype(jnp.float32)
        do_ref[0] = (acc_ref[:] - rsum_ref[:, :1] * o).astype(do_ref.dtype)


def _flash_tangent(q, k, v, dq, dk, dv, o, lse, scale,
                   block_q=None, block_k=None, interpret=False):
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q, block_k = _blocks("jvp", sq, sk, d, block_q, block_k)
    grid = (bh, sq // block_q, sk // block_k)
    qspec = pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0))
    kspec = pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0))
    return pl.pallas_call(
        functools.partial(_flash_tangent_kernel, scale=scale),
        grid=grid,
        in_specs=[
            qspec, kspec, kspec, qspec, kspec, kspec, qspec,
            pl.BlockSpec((1, block_q, 128), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),    # tangent accumulator
            pltpu.VMEM((block_q, 128), jnp.float32),  # rowsum(p∘ṡ)
        ],
        compiler_params=_GRID_SEMANTICS,
        interpret=interpret,
    )(q, k, v, dq, dk, dv, o, lse)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4))
def _flash_fwdmode(q, k, v, scale, interpret):
    return _flash_forward(q, k, v, scale, interpret=interpret)


@_flash_fwdmode.defjvp
def _flash_fwdmode_jvp(scale, interpret, primals, tangents):
    q, k, v = primals
    dq, dk, dv = tangents
    o, lse = _flash_forward_lse(q, k, v, scale, interpret=interpret)
    zeros = lambda a: jnp.zeros(a.shape, a.dtype)
    inst = lambda t, p: zeros(p) if isinstance(
        t, jax.custom_derivatives.SymbolicZero) else t.astype(p.dtype)
    do = _flash_tangent(
        q, k, v, inst(dq, q), inst(dk, k), inst(dv, v), o, lse, scale,
        interpret=interpret,
    )
    return o, do.astype(o.dtype)


def flash_attention_jvp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Forward-mode-differentiable fused attention (layout (B, S, H, D)).

    Use on paths that will be `jax.linearize`d/`jax.jvp`'d — the pullback's
    tangent sweeps. NOT reverse-mode differentiable (the tangent map has no
    transpose rule — JAX's linear_call lacks a batching rule, and the
    pullback vmaps tangents over probes); for the cotangent half pair it
    with the custom_vjp `flash_attention` via local_pullback's ``fn_vjp``.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq, bk = min(512, sq), min(512, sk)
    if sq % bq or sk % bk:
        raise ValueError(
            f"flash_attention_jvp requires sequence lengths divisible by the "
            f"block size (sq={sq}, sk={sk}, blocks=({bq},{bk}))"
        )
    to_bh = lambda x, s: x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    out = _flash_fwdmode(
        to_bh(q, sq), to_bh(k, sk), to_bh(v, sk), float(scale), interpret
    )
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Public entry. Layout (B, S, H, D) like ops.attention."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    sk = k.shape[1]
    # validate tiling once for every kernel this may route to (fwd, lse-fwd
    # under custom_vjp, and the backward kernels) — the non-primal paths
    # would otherwise silently truncate non-divisible sequences
    bq, bk = min(512, sq), min(512, sk)
    if sq % bq or sk % bk:
        raise ValueError(
            f"flash_attention requires sequence lengths divisible by the "
            f"block size (sq={sq}, sk={sk}, blocks=({bq},{bk})); use "
            f"impl='blockwise' or 'xla' for irregular lengths"
        )
    to_bh = lambda x, s: x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    out = _flash(to_bh(q, sq), to_bh(k, sk), to_bh(v, sk), float(scale), interpret)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
