"""Mesh-sharded pullback power iteration.

The probe axis (the r top-k directions) is the natural parallel axis of the
subspace iteration: each probe's tangent/cotangent pass through the U-Net is
independent; only the tiny r×r Gram/QR step couples them. Sharding probes
over devices therefore scales the expensive part linearly while the coupling
costs one all-gather of the (r, dim_x) iterate per iteration.

Implementation is GSPMD-idiomatic: the *same* single-device algorithm from
geometry/pullback.py runs under jit with sharding constraints on the probe
axis (`local_pullback(probe_sharding=...)`) — XLA's SPMD partitioner splits
the vmapped JVP/VJP across devices and inserts the ICI collectives for the
Gram matmul. (No hand-written NCCL/MPI as in the reference's dead dist_util;
no manual collectives at all.)
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.pullback import PullbackResult, local_pullback


def make_sharded_pullback(
    fn: Callable,
    mesh: Mesh,
    probe_axis: str = "probe",
    pca_rank: int = 50,
    fn_vjp: Callable = None,
    **kwargs,
) -> Callable:
    """Build a reusable jitted probe-sharded pullback runner.

    ``fn(z, *fn_args)`` maps a sample to the tapped feature tensor;
    ``fn_args`` (params, prompt embeddings, timestep, …) are passed through
    as replicated jit arguments so large weight trees are NOT baked into the
    HLO as literals. Returns ``runner(x, key, *fn_args) -> PullbackResult``;
    call it repeatedly — the jit is built once here.

    ``pca_rank`` must be divisible by the probe-axis size. The sample ``x``
    and the result's u/s are replicated; vT comes back probe-sharded (tiny
    to re-replicate if needed).
    """
    n_shards = mesh.shape[probe_axis]
    if pca_rank % n_shards != 0:
        raise ValueError(
            f"pca_rank {pca_rank} not divisible by probe axis size {n_shards}"
        )

    probe_sharding = NamedSharding(mesh, P(probe_axis))
    replicated = NamedSharding(mesh, P())

    def constrained(z, k, *fargs):
        return local_pullback(
            lambda v: fn(v, *fargs),
            z,
            k,
            pca_rank=pca_rank,
            probe_sharding=probe_sharding,
            fn_vjp=(lambda v: fn_vjp(v, *fargs)) if fn_vjp is not None else None,
            **kwargs,
        )

    run = jax.jit(
        constrained,
        # a single sharding is a valid pytree prefix for every argument
        in_shardings=replicated,
        out_shardings=PullbackResult(
            u=replicated,
            s=replicated,
            vT=probe_sharding,
            iterations=replicated,
            final_delta=replicated,
        ),
    )

    def runner(x, key, *fn_args):
        with mesh:
            return run(x, key, *fn_args)

    return runner


def sharded_local_pullback(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    key: jax.Array,
    mesh: Mesh,
    probe_axis: str = "probe",
    pca_rank: int = 50,
    **kwargs,
) -> PullbackResult:
    """One-shot convenience wrapper over `make_sharded_pullback` for a ``fn``
    already closed over params (fine for small models/tests; experiment
    drivers use `make_sharded_pullback` and pass params as jit arguments)."""
    runner = make_sharded_pullback(
        fn, mesh, probe_axis=probe_axis, pca_rank=pca_rank, **kwargs
    )
    return runner(x, key)


def dp_vmap(fn, mesh: Mesh, axis_name: str = "dp"):
    """Data-parallel map: jit(vmap(fn)) with every argument/output sharded on
    its leading axis over ``mesh[axis_name]``.

    This is the sweep-axis parallelism of SURVEY §7 stage 8: the (sample ×
    timestep × prompt) harvest grid becomes one array axis laid out across
    the mesh — each device runs its slice of the vmapped pullbacks, XLA
    inserting collectives only if fn itself couples instances (it doesn't).
    """
    sh = NamedSharding(mesh, P(axis_name))

    vf = jax.vmap(fn)
    cache = {}

    def run(*args):
        # one jit per (tree-structure, leaf shape/dtype) signature, reused
        # across calls: a fresh jax.jit object every call would retrace, and
        # keying on structure alone would pin the first call's in_shardings
        # onto later same-structure/different-shape calls
        leaves, treedef = jax.tree.flatten(args)
        key = (treedef, tuple((a.shape, a.dtype.name) for a in leaves))
        if key not in cache:
            cache[key] = jax.jit(
                vf,
                in_shardings=jax.tree.map(lambda _: sh, args),
                out_shardings=None,  # let XLA propagate the dp layout
            )
        with mesh:
            return cache[key](*args)

    return run
