"""FLOP / MFU accounting for benchmark sections (SURVEY §6 metrics).

XLA's HLO cost analysis counts a ``while``/``scan`` body ONCE regardless of
trip count (verified empirically: a 10-step scan of a matmul reports the
same flops as one matmul). Every hot program in this framework is a loop
(power iteration, DDIM scan), so per-program cost analysis would undercount
by the iteration count. Instead, FLOPs are measured on LOOP-FREE component
programs — exactly the bodies the loops run — and multiplied by the known
trip counts:

  * ``linearized_pass_flops``: lowers the (linearize + r·tangent) program at
    two probe counts and solves the affine system for (primal, per-tangent)
    FLOPs — the real cost split of `geometry.local_pullback`'s loop body.
  * ``transpose_pass_flops``: same for the cotangent half (linear_transpose
    of the linearization, or an explicit ``fn_vjp``).
  * ``compiled_flops``: raw cost-analysis wrapper for loop-free programs
    (single U-Net forward, single DDIM step).

All model callables take ``(params, x)`` — params must enter the lowered
program as ARGUMENTS; a closed-over weight pytree would be baked into the
HLO as multi-hundred-MB literals (oversized remote compiles).

MFU is reported against the chip's bf16 peak (the MXU's native rate);
f32-compute sections therefore read low by construction — the point is to
rank sections by headroom, and bf16 is the production dtype (--dtype auto).

The reference has no FLOPs accounting anywhere (its instrumentation is
wall-clock prints, /root/reference/src/utils/utils.py:813-814); this module
is part of the TPU-first performance surface, not a port.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# bf16 MXU peak per chip, by device_kind prefix. Public numbers:
# v5e 197 TFLOP/s, v4 275, v5p 459, v6e (Trillium) 918.
_PEAK_BF16_TFLOPS = (
    ("TPU v6", 918.0),
    ("TPU v5p", 459.0),
    ("TPU v5 lite", 197.0),
    ("TPU v5e", 197.0),
    ("TPU v5", 459.0),  # after the lite/e prefixes: remaining v5 is v5p
    ("TPU v4 lite", 137.0),
    ("TPU v4", 275.0),
    ("TPU v3", 123.0),
    ("TPU v2", 46.0),
)

ModelFn = Callable[[Any, jax.Array], jax.Array]  # (params, x) -> h


def peak_bf16_tflops(device=None) -> Optional[float]:
    """bf16 peak TFLOP/s of ``device`` (default: first visible), or None on
    CPU / unknown kinds."""
    try:
        dev = device or jax.devices()[0]
        kind = dev.device_kind
    except Exception:
        return None
    for prefix, tflops in _PEAK_BF16_TFLOPS:
        if kind.startswith(prefix):
            return tflops
    return None


def compiled_flops(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Total FLOPs of the compiled program for ``fn(*args)`` per XLA cost
    analysis, or None when the backend can't report it. Only meaningful for
    loop-free programs (see module docstring)."""
    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _probe_batch(x: jax.Array, rank: int) -> jax.Array:
    return jnp.zeros((rank,) + x.shape, x.dtype)


def linearized_pass_flops(
    fn: ModelFn, params: Any, x: jax.Array, r1: int = 1, r2: int = 2
) -> Optional[Tuple[float, float]]:
    """(primal_flops, per_tangent_flops) of ``jax.linearize(fn(params,·), x)``
    + r vmapped tangent applications — the forward half of the pullback loop.

    Lowers the program at two small probe counts; FLOPs are affine in r
    (F(r) = primal + r·tangent), so two points determine both terms without
    compiling the full-rank program (an SDXL-sized compile saved).
    """

    def prog(rank):
        def run(p, xx, probes):
            _, jvp_fn = jax.linearize(lambda q: fn(p, q), xx)
            return jax.vmap(jvp_fn)(probes)

        return compiled_flops(run, params, x, _probe_batch(x, rank))

    f1, f2 = prog(r1), prog(r2)
    if f1 is None or f2 is None or r2 == r1:
        return None
    tangent = (f2 - f1) / (r2 - r1)
    primal = f1 - r1 * tangent
    return max(primal, 0.0), max(tangent, 0.0)


def transpose_pass_flops(
    fn: ModelFn,
    params: Any,
    x: jax.Array,
    fn_vjp: Optional[ModelFn] = None,
    r1: int = 1,
    r2: int = 2,
) -> Optional[Tuple[float, float]]:
    """(primal_flops, per_cotangent_flops) of the pullback loop's backward
    half: ``linear_transpose`` of the linearization, or ``jax.vjp(fn_vjp)``
    when a separate cotangent implementation is used (the fused flash pair,
    geometry/pullback.py fn_vjp)."""
    h = jax.eval_shape((fn_vjp or fn), params, x)

    def prog(rank):
        def run(p, xx, cotangents):
            if fn_vjp is None:
                _, jvp_fn = jax.linearize(lambda q: fn(p, q), xx)
                tr = jax.linear_transpose(jvp_fn, xx)
                return jax.vmap(lambda u: tr(u)[0])(cotangents)
            _, vjp_fn = jax.vjp(lambda q: fn_vjp(p, q), xx)
            return jax.vmap(lambda u: vjp_fn(u)[0])(cotangents)

        cot = jnp.zeros((rank,) + h.shape, h.dtype)
        return compiled_flops(run, params, x, cot)

    f1, f2 = prog(r1), prog(r2)
    if f1 is None or f2 is None or r2 == r1:
        return None
    cotangent = (f2 - f1) / (r2 - r1)
    primal = f1 - r1 * cotangent
    return max(primal, 0.0), max(cotangent, 0.0)


def pullback_fits(
    fn: ModelFn,
    params: Any,
    x: jax.Array,
    fn_vjp: Optional[ModelFn] = None,
) -> Optional[Tuple[Tuple[float, float], Tuple[float, float]]]:
    """The (fwd, bwd) affine fits of the pullback loop body — the expensive
    half of `pullback_flops` (four SD/SDXL-scale lowers). Rank/iteration
    independent, so callers can persist the fits and recompute totals for
    any (pca_rank, iters) via `pullback_flops_from_fits` (bench.py caches
    these in .jax_cache/flops_cache.json keyed by program + code salt)."""
    fwd = linearized_pass_flops(fn, params, x)
    bwd = transpose_pass_flops(fn, params, x, fn_vjp=fn_vjp)
    if fwd is None or bwd is None:
        return None
    return fwd, bwd


def pullback_flops_from_fits(
    fits: Tuple[Tuple[float, float], Tuple[float, float]],
    pca_rank: int,
    iters: int,
    uses_fn_vjp: bool,
) -> float:
    """Total pullback FLOPs from precomputed `pullback_fits`: one linearize
    primal (+ one vjp primal when a separate fn_vjp is used), iters·rank
    tangent + iters·rank cotangent passes, plus the final rank tangent
    passes for u. The r×r SVD/QR is negligible and excluded."""
    (p_fwd, f_tan), (p_bwd, f_cot) = fits
    primal = p_fwd + (p_bwd if uses_fn_vjp else 0.0)
    return primal + iters * pca_rank * (f_tan + f_cot) + pca_rank * f_tan


def pullback_flops(
    fn: ModelFn,
    params: Any,
    x: jax.Array,
    pca_rank: int,
    iters: int,
    fn_vjp: Optional[ModelFn] = None,
) -> Optional[float]:
    """Total FLOPs of one `geometry.local_pullback` run at fixed iteration
    count (see `pullback_flops_from_fits` for the formula)."""
    fits = pullback_fits(fn, params, x, fn_vjp=fn_vjp)
    if fits is None:
        return None
    return pullback_flops_from_fits(fits, pca_rank, iters,
                                    uses_fn_vjp=fn_vjp is not None)


def mfu_fields(flops: Optional[float], seconds: float) -> dict:
    """Bench-section fields: achieved TFLOP/s and model FLOPs utilization
    vs the chip's bf16 peak. Empty when flops are unknown (CPU backends,
    cost-analysis failure) so sections degrade gracefully."""
    if not flops or not seconds or seconds <= 0:
        return {}
    tflops_per_sec = flops / seconds / 1e12
    out = {
        "tflops": round(flops / 1e12, 3),
        "tflops_per_sec": round(tflops_per_sec, 2),
    }
    peak = peak_bf16_tflops()
    if peak:
        out["mfu_vs_bf16_peak"] = round(tflops_per_sec / peak, 4)
    return out
