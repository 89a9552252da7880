"""Tensor-parallel parameter sharding for the U-Net / transformer families.

Megatron-style TP expressed the GSPMD way: instead of rewriting modules with
explicit collectives, annotate the parameter LAYOUT — column-parallel
(output-feature sharded) for attention q/k/v and MLP up-projections,
row-parallel (input-feature sharded) for the matching output projections —
and let XLA propagate the shardings through the unchanged forward and insert
the all-reduce after each row-parallel matmul (the scaling-book recipe).
Works on `UNet2DCondition` / `UNet2D` / `Transformer2D` (and any Flax tree
using the same diffusers-derived layer names) without touching module code.

The reference has no TP of any kind (SURVEY §2.3 — its only parallelism is a
dead MPI/NCCL trainer); this is a TPU-native addition. Motivation beyond
throughput: the SDXL-1024 fused edit-tail program RESOURCE_EXHAUSTs a single
chip (TODO.md r3), and sharding the transformer weights + activations over a
'tp' mesh axis is the architecturally-correct fix once multi-chip hardware
exists. Numerical behavior is identical by GSPMD construction; the CPU-mesh
parity test (tests/test_parallel.py) asserts it.

Head alignment note: q/k/v kernels are sharded on the flat heads*head_dim
output axis (heads-major layout), so the per-device slice lands on head
boundaries iff heads % tp == 0 — the natural mesh choice for these models
(SD2.1: 5/10/20 heads; SDXL: 10/20). When it doesn't divide, XLA falls back
to resharding around the (b, s, heads, head_dim) reshape: still correct,
just more collective traffic.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense/Conv module names whose kernel output axis shards over 'tp'
# (column-parallel). "proj" is GEGLU's fused value‖gate up-projection
# (transformer2d.py): contiguous sharding of the 2·inner output axis does
# NOT land the value/gate halves on matching devices (a true Megatron GEGLU
# shards each half separately, which a PartitionSpec on the fused axis
# cannot express), so XLA inserts one activation reshard before the
# elementwise value·gelu(gate). Still net-positive: the dominant up-proj
# matmul FLOPs and its weights shard 1/tp, paid for with one (B,S,2·inner)
# boundary move.
COLUMN_PARALLEL = frozenset({"to_q", "to_k", "to_v", "proj", "proj_in"})
# names whose kernel input axis shards (row-parallel; XLA psums the output)
ROW_PARALLEL = frozenset({"to_out", "net_2", "proj_out"})


def _spec_for(path, leaf, tp: int, axis: str):
    names = [p.key for p in path if hasattr(p, "key")]
    if not names:
        return P()
    leaf_name, owner = names[-1], names[-2] if len(names) >= 2 else ""
    if leaf_name == "kernel" and leaf.ndim >= 2:
        # Dense kernels are (I, O); Conv kernels (kh, kw, I, O) — in both,
        # O is the last axis and I the second-to-last.
        if owner in COLUMN_PARALLEL and leaf.shape[-1] % tp == 0:
            spec = [None] * leaf.ndim
            spec[-1] = axis
            return P(*spec)
        if owner in ROW_PARALLEL and leaf.shape[-2] % tp == 0:
            spec = [None] * leaf.ndim
            spec[-2] = axis
            return P(*spec)
    if (leaf_name == "bias" and owner in COLUMN_PARALLEL and leaf.ndim == 1
            and leaf.shape[0] % tp == 0):
        return P(axis)
    # row-parallel biases stay replicated (added after the psum), as does
    # everything else: convs, norms, time embeddings
    return P()


def tp_param_specs(params: Any, mesh: Mesh, axis: str = "tp"):
    """NamedSharding tree: Megatron column/row-parallel layout for every
    attention/MLP projection whose feature axis divides mesh.shape[axis];
    all other leaves replicated (over 'tp' — an additional 'fsdp'/'dp' axis
    in the same mesh composes via the other helpers)."""
    tp = mesh.shape[axis]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, tp, axis)),
        params,
    )


def tp_shard_params(params: Any, mesh: Mesh, axis: str = "tp"):
    """device_put the tree onto its TP layout."""
    return jax.device_put(params, tp_param_specs(params, mesh, axis))


def tp_sharded_leaf_count(specs: Any) -> int:
    """How many leaves actually shard (diagnostics + test assertions)."""
    return sum(
        1 for s in jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, NamedSharding))
        if isinstance(s, NamedSharding) and s.spec != P()
    )
