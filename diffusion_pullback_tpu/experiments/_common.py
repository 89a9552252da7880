"""Shared machinery for the experiment drivers.

Both drivers (EditUncondDiffusion, EditStableDiffusion) need the same
jit-cache plumbing, mesh gating, and tap construction; keeping one copy
here prevents the two from drifting (they did once: the ADM
layers-per-block guard had to be fixed in two places).
"""

from __future__ import annotations

import jax

from ..models.unet2d import TapPoint


class DriverCommonMixin:
    """Requires the host class to provide ``self._jit_cache`` (dict),
    ``self.cfg`` (experiment config with mesh/pullback knobs) and
    ``self._arch_config`` (the architecture config of the differentiated
    model)."""

    def _jitted(self, name, fn):
        return self._cached(name, lambda: self._stage(name, fn))

    def _stage(self, name, fn):
        """jit, optionally through the AOT export cache (utils/aot.py):
        'auto' exports on single-device accelerator runs — later processes
        skip the multi-second re-trace of U-Net-sized programs (first-run
        UX, VERDICT r3 item 9). Mesh runs stay plain jit (sharded exports
        add constraints the cache doesn't key on)."""
        mode = getattr(self.cfg, "aot_export", "off")
        on = mode == "on" or (
            mode == "auto"
            and self.cfg.mesh is None
            and jax.default_backend() != "cpu"
        )
        if not on:
            return jax.jit(fn)
        from ..utils.aot import AOTProgramCache

        if not hasattr(self, "_aot_programs"):
            self._aot_programs = AOTProgramCache()
        return self._aot_programs.wrap(name, fn, self._cfg_fingerprint())

    def _cfg_fingerprint(self) -> str:
        """Digest of every primitive config field that could reach a traced
        closure as a baked-in constant (guidance scales, step counts, eta,
        dtypes, chunk sizes …). Excludes IO paths (never traced) and the
        mesh object (mesh runs skip AOT export anyway). Keying exports on
        this prevents a process launched with different flags from
        replaying a stale export with the old constants (ADVICE r4)."""
        # recomputed per call (cheap): run methods mutate cfg fields
        # (e.g. edit_prompt), and a stale memo would miss that
        import dataclasses
        import hashlib

        parts = []
        for f in dataclasses.fields(self.cfg):
            if f.name == "mesh" or any(
                s in f.name for s in ("folder", "dir", "path")
            ):
                continue
            v = getattr(self.cfg, f.name)
            if isinstance(v, (int, float, bool, str, type(None), tuple, list)):
                parts.append(f"{f.name}={v!r}")
        return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]

    def _cached(self, name, builder):
        if name not in self._jit_cache:
            self._jit_cache[name] = builder()
        return self._jit_cache[name]

    def _mesh_probe_size(self, pca_rank: int) -> int:
        """Probe-axis size when the configured mesh can shard this pullback
        (0 = run single-device)."""
        mesh = self.cfg.mesh
        if mesh is None or "probe" not in mesh.axis_names:
            return 0
        n = mesh.shape["probe"]
        if n <= 1 or pca_rank % n != 0 or self.cfg.pullback_chunk_size:
            return 0
        return n

    def _make_tap(self, op, block_idx, after_res=False, after_sa=False):
        """Intra-block tap modifiers (reference after_res/after_sa flags,
        down_block_forward utils.py:638-719: the tap moves after the block's
        LAST resnet / transformer instead of the block output)."""
        if after_res or after_sa:
            if not hasattr(self._arch_config, "layers_per_block"):
                raise ValueError(
                    "intra-block taps (after_res/after_sa) are not "
                    "supported for this model family")
            layer = self._arch_config.layers_per_block - 1
            inner = ("res", layer) if after_res else ("attn", layer)
            return TapPoint(op, block_idx, inner)
        return TapPoint(op, block_idx)

    def _place_weights(self, params):
        """Place a weight tree onto the configured mesh: Megatron
        tensor-parallel layout when the mesh has a 'tp' axis (parallel/tp.py
        — attention/MLP projections column/row-sharded, GSPMD inserts the
        collectives), full replication otherwise. An 'sp' axis additionally
        publishes the mesh for ring attention (`attention(impl='ring')`).
        No mesh → unchanged."""
        mesh = self.cfg.mesh
        if mesh is not None:
            from ..parallel import set_ring_mesh

            # a driver that owns a mesh also owns the ring global: publish
            # it when the mesh has an 'sp' axis, clear any stale one
            # otherwise (a later non-sp driver must not ring over a
            # previous driver's mesh)
            has_sp = "sp" in mesh.axis_names and mesh.shape["sp"] > 1
            set_ring_mesh(mesh if has_sp else None)
        if mesh is None:
            return params
        if "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
            from ..parallel import tp_shard_params

            return tp_shard_params(params, mesh)
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(params, NamedSharding(mesh, PartitionSpec()))

    def _harvest_dp(self, n_items: int, log_name: str) -> int:
        """dp-axis size when the configured mesh can shard an n-item sweep
        (0 = run sequentially on one device)."""
        mesh = self.cfg.mesh
        if mesh is None or "dp" not in mesh.axis_names or mesh.shape["dp"] <= 1:
            return 0
        if n_items % mesh.shape["dp"] != 0:
            self.log.log(log_name, num_t=n_items, dp=mesh.shape["dp"])
            return 0
        return mesh.shape["dp"]
