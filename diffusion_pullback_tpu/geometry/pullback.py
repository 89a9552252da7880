"""Pullback-metric SVD: top-k singular triplets of a network Jacobian.

The numerical heart of the framework — the TPU-native re-design of the
reference's Algorithm-1 subspace power iteration
(/root/reference/src/utils/utils.py:722-816 for SD latents, :165-249 for
pixel space, src/models/ddpm/diffusion.py:484-633 for the custom DDPM).

The reference's loop per iteration, per chunk of 5 probes, re-runs
`torch.func.jacfwd` (a fresh forward+tangent graph) and then a separate
`autograd.functional.jacobian` (a fresh forward+backward graph), staging
probes through CPU between chunks, and takes a LAPACK SVD of the full
(r × dim_x) matrix.

Here the Jacobian operator is linearised ONCE (`jax.linearize`) — the primal
pass and its residuals are computed a single time and reused by every
iteration — and each iteration is:

    u_i  = vmap(jvp)(v_i)                 # r batched tangent passes (MXU)
    ṽ_i  = vmap(transpose(jvp))(u_i)      # r batched cotangent passes
    G    = ṽ ṽᵀ  (r × r Gram)             # one short-fat matmul
    eigh(G) → singular values/vectors     # tiny, on-device
    v    ← sign-aligned new right vectors # keeps ±-flapping out of the
                                          #   convergence test
    δ    = max|v - v_prev|                # on-device loop carry; no host sync

inside a single `lax.while_loop` under jit — no Python loop, no chunk
staging, no host round-trips. Probe-axis chunking (`chunk_size`) and
rematerialisation (`remat`) are available for memory-bound configs (SDXL),
and the probe axis shards over a device mesh in parallel/sharded_pullback.
"""

from __future__ import annotations


import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class PullbackResult(NamedTuple):
    """Top-k singular triplets of J = ∂f/∂x at the evaluation point.

    Matches the reference's return convention (utils.py:810): ``u`` has the
    h-space directions as *columns* (dim_h, k) with norms ≈ σ_k (not unit —
    callers normalise, edit.py:267), ``s`` is sqrt of the singular values of
    the JᵀJ-iterated matrix (≈ σ_k of J), ``vT`` has unit x-space directions
    as *rows* (k, dim_x).
    """

    u: jax.Array
    s: jax.Array
    vT: jax.Array
    iterations: jax.Array    # () int32 — iterations actually run
    final_delta: jax.Array   # () f32 — last convergence residual


try:
    # jax.export refuses to serialize programs whose OUTPUT pytree contains
    # an unregistered NamedTuple; without this every pullback program falls
    # back to per-process re-tracing in the AOT cache (utils/aot.py)
    jax.export.register_namedtuple_serialization(
        PullbackResult,
        serialized_name="diffusion_pullback_tpu.PullbackResult.v1")
except (AttributeError, ValueError):
    pass  # older jax (no registry) or double-registration under reload


def _orthonormal_probes(key: jax.Array, dim: int, rank: int) -> jax.Array:
    """(rank, dim) matrix with orthonormal rows (QR of a Gaussian block)."""
    g = jax.random.normal(key, (dim, rank), dtype=jnp.float32)
    q, _ = jnp.linalg.qr(g)
    return q.T


def _short_fat_svd(m: jax.Array, eps: float = 1e-12, method: str = "qr"):
    """SVD of a short-fat (r, d) matrix without a d-sized LAPACK call
    (the reference SVDs the full matrix on GPU/CPU, utils.py:799).

    Returns (s, vT) with singular values descending and unit rows in vT.
      'qr'   (default): tall QR of mᵀ then SVD of the tiny r×r R factor —
             conditioning ∝ σ, accurate down the spectrum tail. Cost
             O(d·r²), all TPU-friendly.
      'gram': eigh of m mᵀ — one matmul cheaper, but conditioning ∝ σ², so
             directions with σ_k/σ_1 ≲ √eps_f32 are lost; fine for small
             ranks / well-separated spectra.
    """
    if method == "gram":
        gram = m @ m.T  # (r, r), f32 accumulate
        w, q = jnp.linalg.eigh(gram)          # ascending
        w = w[::-1]
        q = q[:, ::-1]
        s = jnp.sqrt(jnp.maximum(w, 0.0))
        vT = (q.T @ m) / jnp.maximum(s, eps)[:, None]
        # guard: when the Gram is numerically rank-deficient (σ_k/σ_1 ≲
        # eps_f32^(1/4)) the eps division above blows rows up and the power
        # iteration diverges to NaN — re-unitize so it merely loses accuracy
        vT = vT / jnp.clip(jnp.linalg.norm(vT, axis=1, keepdims=True), eps)
        return s, vT
    if method == "qr":
        qtall, rfac = jnp.linalg.qr(m.T)       # m.T = Q (d×r) · R (r×r)
        u, s, wT = jnp.linalg.svd(rfac.T)      # mᵀ = Q Rᵀᵀ… m = Rᵀ Qᵀ = U S (Wᵀ Qᵀ)
        vT = wT @ qtall.T                      # (r, d) unit rows
        return s, vT
    raise ValueError(f"unknown svd method: {method!r}")


def _batched(fn: Callable, chunk_size: Optional[int], rank: int):
    """vmap fn over the probe axis, optionally chunked via lax.map to bound
    peak memory (replaces the reference's Python chunk loop, utils.py:761)."""
    if chunk_size is None or chunk_size >= rank:
        return jax.vmap(fn)
    if rank % chunk_size != 0:
        raise ValueError(f"pca_rank {rank} must be divisible by chunk_size {chunk_size}")

    def run(batch):
        chunks = jax.tree.map(
            lambda a: a.reshape((rank // chunk_size, chunk_size) + a.shape[1:]), batch
        )
        out = jax.lax.map(jax.vmap(fn), chunks)
        return jax.tree.map(lambda a: a.reshape((rank,) + a.shape[2:]), out)

    return run


def local_pullback(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    key: jax.Array,
    pca_rank: int = 50,
    min_iter: int = 10,
    max_iter: int = 50,
    atol: float = 1e-3,
    chunk_size: Optional[int] = None,
    remat: bool = False,
    svd_method: str = "qr",
    probe_sharding=None,
    fn_vjp: Optional[Callable[[jax.Array], jax.Array]] = None,
    v_init: Optional[jax.Array] = None,
) -> PullbackResult:
    """Top-``pca_rank`` singular triplets of ∂fn/∂x at ``x``.

    ``fn`` maps one sample (with its leading batch axis, usually 1) to a
    feature tensor; it must be jvp-differentiable. Convergence follows the
    reference (utils.py:806): the earliest converged exit happens after
    min_iter + 2 completed iterations (their `i > min_iter` break, 0-based),
    else at ``max_iter``.

    ``probe_sharding`` (a `jax.sharding.NamedSharding` over the probe axis,
    e.g. ``NamedSharding(mesh, P('probe'))``) constrains the (r, ·) iterates
    inside the loop so GSPMD splits the vmapped tangent/cotangent passes
    across the mesh — the multi-device path of SURVEY §2.3 (the reference has
    no equivalent; its chunk loop is single-GPU, utils.py:761-773). Mutually
    exclusive with ``chunk_size``.

    ``fn_vjp``: optional second implementation of the SAME map used for the
    cotangent half. Default (None) transposes the single linearization —
    cheapest. Pass it when ``fn`` uses forward-mode-only fused kernels
    (attn_impl='flash_jvp', which has no transpose rule): the cotangent side
    then runs `jax.vjp(fn_vjp, x)` — a second linearization, exactly the
    reference's jacfwd+jacobian split (utils.py:766-796), with both halves
    on fused Pallas kernels. Numerics are identical up to float ordering.

    ``v_init``: explicit (pca_rank, dim_x) probe matrix overriding the
    seeded orthonormal init — matched-init oracle tests inject the SAME
    subspace into this and the reference's torch iteration so fixed
    iteration counts are directly comparable without convergence.
    """
    if remat:
        fn = jax.checkpoint(fn)
        if fn_vjp is not None:
            fn_vjp = jax.checkpoint(fn_vjp)
    if probe_sharding is not None and chunk_size is not None:
        raise ValueError("probe_sharding and chunk_size are mutually exclusive")

    def shard(a):
        if probe_sharding is None:
            return a
        return jax.lax.with_sharding_constraint(a, probe_sharding)

    x = x.astype(jnp.float32)
    dim_x = math.prod(x.shape)
    _, jvp_fn = jax.linearize(fn, x)
    if fn_vjp is None:
        transpose_fn = jax.linear_transpose(jvp_fn, x)
    else:
        _, vjp_fn = jax.vjp(fn_vjp, x)
        transpose_fn = vjp_fn

    h_aval = jax.eval_shape(fn, x)
    h_shape, h_dtype = h_aval.shape, h_aval.dtype
    fwd = _batched(lambda vi: jvp_fn(vi.reshape(x.shape)).ravel(), chunk_size, pca_rank)
    bwd = _batched(
        lambda ui: transpose_fn(ui.reshape(h_shape).astype(h_dtype))[0].ravel(),
        chunk_size, pca_rank,
    )

    if v_init is not None:
        if v_init.shape != (pca_rank, dim_x):
            raise ValueError(
                f"v_init shape {v_init.shape} != ({pca_rank}, {dim_x})")
        v0 = shard(jnp.asarray(v_init, jnp.float32))
    else:
        v0 = shard(_orthonormal_probes(key, dim_x, pca_rank))

    def one_iteration(v):
        u = shard(fwd(v))                 # (r, dim_h)
        vt = shard(bwd(u))                # (r, dim_x)
        s, v_new = _short_fat_svd(vt, method=svd_method)
        # sign-align rows to the previous iterate so the convergence test
        # (and the final output) is free of ± flapping
        signs = jnp.sign(jnp.sum(v_new * v, axis=1))
        signs = jnp.where(signs == 0, 1.0, signs)
        v_new = shard(v_new * signs[:, None])
        delta = jnp.max(jnp.abs(v_new - v))
        return v_new, s, delta

    def cond(carry):
        _, _, delta, it = carry
        # reference break fires at 0-based i > min_iter ⇒ min_iter + 2
        # iterations minimum when converged
        return (it < max_iter) & ((it <= min_iter + 1) | (delta > atol))

    def body(carry):
        v, _, _, it = carry
        v_new, s, delta = one_iteration(v)
        return (v_new, s, delta, it + 1)

    s0 = jnp.zeros((pca_rank,), jnp.float32)
    v, s, delta, it = jax.lax.while_loop(
        cond, body, (v0, s0, jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0, jnp.int32))
    )

    # final tangent pass so u corresponds to the converged v (the reference
    # returns u from the last pre-SVD v — identical at convergence)
    u = fwd(v)  # (r, dim_h), row norms ≈ σ
    return PullbackResult(u=u.T, s=jnp.sqrt(s), vT=v, iterations=it, final_delta=delta)


def batched_local_pullback(
    fn: Callable[[jax.Array], jax.Array],
    xs: jax.Array,
    key: jax.Array,
    pca_rank: int = 50,
    min_iter: int = 10,
    max_iter: int = 50,
    atol: float = 1e-3,
    chunk_size: Optional[int] = None,
    remat: bool = False,
    svd_method: str = "qr",
    fn_vjp: Optional[Callable[[jax.Array], jax.Array]] = None,
    v_init: Optional[jax.Array] = None,
) -> PullbackResult:
    """B independent pullbacks fused into ONE program (the throughput path
    for basis-harvest sweeps, reference src/main.py:45-91 workload).

    ``fn`` maps a (B, *x_dims) batch to (B, *h_dims) and MUST be per-sample
    independent — sample b's output depends only on sample b's input, so the
    Jacobian is block-diagonal over the batch (true for every model here:
    GroupNorm/attention act within a sample; per-sample timesteps ride the
    batch axis of the embedding). Probe i of every sample then shares one
    tangent pass: the per-probe model call runs at batch B instead of 1,
    filling the MXU better and amortizing dispatch + QR/SVD overhead over
    the whole batch — 48 single-basis dispatches become 3 tap programs
    (per-tap measured on one v5e chip: 5.98 s → see bench config2).

    Returns a PullbackResult with a leading batch axis: u (B, dim_h, r),
    s (B, r), vT (B, r, dim_x). ``iterations``/``final_delta`` are shared —
    with atol > 0 the fused while_loop runs until ALL samples converge
    (delta is the max over the batch); fixed-iteration configs are exact.

    ``v_init``: optional (B, pca_rank, dim_x) explicit probe init; default
    draws an independent orthonormal block per sample from ``key``.
    """
    if remat:
        fn = jax.checkpoint(fn)
        if fn_vjp is not None:
            fn_vjp = jax.checkpoint(fn_vjp)

    xs = xs.astype(jnp.float32)
    batch = xs.shape[0]
    x_dims = xs.shape[1:]
    dim_x = math.prod(x_dims)
    _, jvp_fn = jax.linearize(fn, xs)
    if fn_vjp is None:
        transpose_fn = jax.linear_transpose(jvp_fn, xs)
    else:
        _, vjp_fn = jax.vjp(fn_vjp, xs)
        transpose_fn = vjp_fn

    h_aval = jax.eval_shape(fn, xs)
    h_shape, h_dtype = h_aval.shape, h_aval.dtype
    dim_h = math.prod(h_shape[1:])

    # probe axis of the (B, r, dim) iterates is vmapped at axis 1 (model
    # batch stays leading inside the pass), chunked via lax.map when asked
    def over_probes(pass_fn, out_dim):
        def one(vi):  # (B, dim_in) -> (B, dim_out)
            return pass_fn(vi)

        if chunk_size is None or chunk_size >= pca_rank:
            return jax.vmap(one, in_axes=1, out_axes=1)
        if pca_rank % chunk_size != 0:
            raise ValueError(
                f"pca_rank {pca_rank} must be divisible by chunk_size {chunk_size}")

        def run(v):  # (B, r, dim_in)
            chunks = jnp.moveaxis(
                v.reshape(batch, pca_rank // chunk_size, chunk_size, -1), 1, 0)
            out = jax.lax.map(jax.vmap(one, in_axes=1, out_axes=1), chunks)
            return jnp.moveaxis(out, 0, 1).reshape(batch, pca_rank, out_dim)

        return run

    fwd = over_probes(
        lambda vi: jvp_fn(vi.reshape(xs.shape)).reshape(batch, dim_h), dim_h)
    bwd = over_probes(
        lambda ui: transpose_fn(
            ui.reshape(h_shape).astype(h_dtype))[0].reshape(batch, dim_x),
        dim_x)

    if v_init is not None:
        if v_init.shape != (batch, pca_rank, dim_x):
            raise ValueError(
                f"v_init shape {v_init.shape} != ({batch}, {pca_rank}, {dim_x})")
        v0 = jnp.asarray(v_init, jnp.float32)
    else:
        v0 = jax.vmap(lambda k: _orthonormal_probes(k, dim_x, pca_rank))(
            jax.random.split(key, batch))

    batched_svd = jax.vmap(lambda m: _short_fat_svd(m, method=svd_method))

    def one_iteration(v):
        u = fwd(v)                         # (B, r, dim_h)
        vt = bwd(u)                        # (B, r, dim_x)
        s, v_new = batched_svd(vt)
        signs = jnp.sign(jnp.sum(v_new * v, axis=2))
        signs = jnp.where(signs == 0, 1.0, signs)
        v_new = v_new * signs[..., None]
        delta = jnp.max(jnp.abs(v_new - v))
        return v_new, s, delta

    def cond(carry):
        _, _, delta, it = carry
        return (it < max_iter) & ((it <= min_iter + 1) | (delta > atol))

    def body(carry):
        v, _, _, it = carry
        v_new, s, delta = one_iteration(v)
        return (v_new, s, delta, it + 1)

    s0 = jnp.zeros((batch, pca_rank), jnp.float32)
    v, s, delta, it = jax.lax.while_loop(
        cond, body,
        (v0, s0, jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0, jnp.int32)),
    )

    u = fwd(v)  # (B, r, dim_h)
    return PullbackResult(
        u=jnp.swapaxes(u, 1, 2), s=jnp.sqrt(s), vT=v,
        iterations=it, final_delta=delta,
    )


def local_encoder_pullback(
    encode_fn: Callable[[jax.Array], jax.Array],
    sample: jax.Array,
    key: jax.Array,
    **kwargs,
) -> PullbackResult:
    """Pullback of the U-Net encoder x_t → h (reference
    local_encoder_pullback_zt/xt). ``encode_fn`` is already closed over
    params/timestep/condition/tap — e.g.
    ``lambda z: unet.apply(params, z, t, tap, method=UNet2D.encode)``."""
    return local_pullback(encode_fn, sample, key, **kwargs)


def local_decoder_pullback(
    decode_fn: Callable[[jax.Array], jax.Array],
    h: jax.Array,
    key: jax.Array,
    **kwargs,
) -> PullbackResult:
    """Pullback of the decoder h → ε (reference local_decoder_pullback_zt,
    utils.py:818-898; local_x0_decoder variants wrap decode_fn with the
    Tweedie map before calling this)."""
    return local_pullback(decode_fn, h, key, **kwargs)


def pullback_covector(
    fn: Callable[[jax.Array], jax.Array], x: jax.Array, u: jax.Array
) -> jax.Array:
    """v = Jᵀ u for a single h-space covector — the reference's inverse-
    Jacobian trick (inv_jac_zt, utils.py:1117-1160: one VJP of ⟨u, f(x)⟩)."""
    _, vjp_fn = jax.vjp(fn, x)
    (v,) = vjp_fn(u)
    return v
