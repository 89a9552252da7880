"""Ring attention: exact attention with the sequence axis sharded over a
mesh axis ('sp').

The reference has no sequence parallelism of any kind (SURVEY §5: its longest
sequence is the 16 384-token SDXL mid-block attention, computed as one dense
O(S²) matmul on one GPU). On a TPU pod the O(S²) attention work splits the
TPU-native way instead: `shard_map` the (B, S, H, D) tensors over an 'sp'
mesh axis, let every device compute its query shard against the K/V shard it
currently holds, rotate K/V around the ring with `lax.ppermute` (one ICI hop
per step), and merge the per-block partial outputs with their row
log-sum-exps — the same online-softmax algebra the flash kernel uses across
K blocks, applied across devices. n devices → n× less attention FLOPs and
O(S/n) attention memory per chip, with compute/communication overlap left to
XLA's latency-hiding scheduler.

Built from jnp ops + ppermute + scan, the 'xla' inner path is differentiable
in BOTH modes (jvp and vjp), so it is safe anywhere — including under the
pullback's linearize. The 'flash' inner path runs the fused Pallas LSE
kernel per block (primal-only, same discipline as ``attention(impl='flash')``).

Wiring: `--attn_impl ring` (or `--attn_impl auto` with an 'sp' axis in
`--mesh_axes`) routes every model attention call here via
`ops.attention`; the drivers publish the mesh through `set_ring_mesh` when
it has an 'sp' axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level API
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

# Ambient mesh published by the drivers (experiments/_common.py) so model
# code — which only knows its `attn_impl` string — can reach the ring without
# threading a Mesh through every module config. Trace-time state: reading it
# inside a traced function is fine because tracing happens in Python.
_RING_MESH: Optional[Mesh] = None
_RING_AXIS: str = "sp"

# Engage the ring only when every shard keeps at least this many rows —
# below that the O(S²) work is too small for the ppermute round trips to
# pay, and short cross-attention contexts (77-token CLIP) stay dense.
MIN_SHARD_TOKENS = 128


def set_ring_mesh(mesh: Optional[Mesh], axis: str = "sp") -> None:
    """Publish (or clear, with None) the mesh used by ``attention(impl='ring')``."""
    global _RING_MESH, _RING_AXIS
    _RING_MESH = mesh
    _RING_AXIS = axis


def get_ring_mesh() -> Tuple[Optional[Mesh], str]:
    return _RING_MESH, _RING_AXIS


def _partial_xla(q, k, v, scale, precision):
    """Block-normalized partial attention + row LSE, pure XLA (both-mode
    differentiable). q: (B,Sq,H,D), k/v: (B,Sk,H,D) → o f32 (B,Sq,H,D),
    lse f32 (B,Sq,H)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32,
                   precision=precision).astype(jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bkhd->bqhd", (p / l).astype(q.dtype), v,
                   preferred_element_type=jnp.float32,
                   precision=precision).astype(jnp.float32)
    lse = (m + jnp.log(l))[..., 0].transpose(0, 2, 1)  # (B,Sq,H)
    return o, lse


def _partial_flash(q, k, v, scale, interpret, block_q=None, block_k=None):
    """Same contract as `_partial_xla` through the fused Pallas LSE kernel
    (ops/pallas/flash_attention.py). Primal-only."""
    from ..ops.pallas.flash_attention import _flash_forward_lse

    b, sq, h, d = q.shape
    sk = k.shape[1]
    fold = lambda x, s: x.transpose(0, 2, 1, 3).reshape(b * h, s, x.shape[-1])
    o, lse = _flash_forward_lse(fold(q, sq), fold(k, sk), fold(v, sk),
                                scale, block_q=block_q, block_k=block_k,
                                interpret=interpret)
    o = o.reshape(b, h, sq, d).transpose(0, 2, 1, 3).astype(jnp.float32)
    lse = lse[:, :, 0].reshape(b, h, sq).transpose(0, 2, 1)  # (B,Sq,H)
    return o, lse


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "sp",
    inner: str = "auto",
    precision=None,
    interpret: bool = False,
) -> jax.Array:
    """Exact softmax(q kᵀ·scale) v with S sharded over ``mesh.shape[axis]``.

    q: (B, Sq, H, D), k/v: (B, Sk, H, D) → (B, Sq, H, D); Sq and Sk must
    divide the axis size (the `ops.attention` dispatcher guards this and
    falls back to the dense path). When the mesh also has a 'dp' axis that
    divides B, the batch co-shards over it in the same program.

    inner: 'xla' (differentiable both modes) | 'flash' (fused Pallas LSE
    kernel per block, primal-only) | 'auto' (flash on accelerators).
    """
    if mesh is None:
        mesh, axis = get_ring_mesh()
    if mesh is None:
        raise ValueError("ring_attention needs a mesh (arg or set_ring_mesh)")
    n = int(mesh.shape[axis])
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sq % n or sk % n:
        raise ValueError(f"sequence ({sq},{sk}) not divisible by {axis}={n}")
    if scale is None:
        scale = d ** -0.5
    if inner == "auto":
        inner = "xla" if jax.default_backend() == "cpu" else "flash"
    if inner == "flash":
        # the fused kernel tiles the SHARD-LOCAL sequence; shapes whose
        # largest ≤512 divisor is degenerate (e.g. 2304-row shards) drop to
        # the XLA inner instead of raising at trace time
        def _div(s, cap=512):
            b = min(cap, s)
            while s % b:
                b -= 1
            return b
        bq, bk = _div(sq // n), _div(sk // n)
        if min(bq, bk) < 128:
            inner = "xla"
        else:
            partial = lambda q, k, v: _partial_flash(
                q, k, v, scale, interpret, bq, bk)
    if inner != "flash":
        partial = lambda q, k, v: _partial_xla(q, k, v, scale, precision)

    axis_b = None
    if "dp" in mesh.axis_names and axis != "dp" and b % mesh.shape["dp"] == 0:
        axis_b = "dp"
    spec = P(axis_b, axis)

    def local(qs, ks, vs):
        o, lse = partial(qs, ks, vs)
        if n > 1:
            perm = [(j, (j + 1) % n) for j in range(n)]

            def step(carry, _):
                o, lse, kr, vr = carry
                kr = jax.lax.ppermute(kr, axis, perm)
                vr = jax.lax.ppermute(vr, axis, perm)
                ob, lb = partial(qs, kr, vr)
                m = jnp.logaddexp(lse, lb)
                o = (o * jnp.exp(lse - m)[..., None]
                     + ob * jnp.exp(lb - m)[..., None])
                return (o, m, kr, vr), None

            (o, lse, _, _), _ = jax.lax.scan(
                step, (o, lse, ks, vs), None, length=n - 1)
        return o.astype(qs.dtype)

    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )(q, k, v)
