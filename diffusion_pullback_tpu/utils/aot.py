"""AOT program export: skip per-process re-tracing of the hot programs.

First-run UX at SD scale pays, per process, (a) the Python trace of each
U-Net-sized program (seconds) and (b) the compile — (b) is already served by
the persistent compilation cache (.jax_cache), but (a) repeats every
process. This module serializes the traced program (`jax.export`, StableHLO)
keyed by (program name, argument avals, device kind, code salt); later
processes deserialize instead of re-tracing, and the deserialized call's
XLA compile hits the persistent cache.

Safety: the key includes a salt over the package's source files (name,
size, mtime_ns) plus the Pallas tuned-block table, so editing model code or
retuning kernels invalidates every export rather than silently replaying a
stale program. Any failure (serialization of an exotic primitive, version
skew, disk) falls back to the plain jit — this is an accelerator-startup
optimization, never a correctness dependency.

The reference has no equivalent (a torch process re-builds its graphs every
run); this is TPU-first plumbing for the jit/trace model.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Optional

import jax
import numpy as np

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SALT: Optional[str] = None


def _code_salt() -> str:
    """Hash of the package's source metadata — invalidates exports when any
    model/op code changes (content hashes would be safer but cost ~10ms per
    startup; size+mtime catches every editor/git write)."""
    global _SALT
    if _SALT is None:
        h = hashlib.sha256()
        h.update(jax.__version__.encode())
        for root, _, files in sorted(os.walk(_PKG_DIR)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith((".py", ".json")):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
        _SALT = h.hexdigest()[:16]
    return _SALT


def code_salt() -> str:
    """Public alias: the package-source salt (also used by bench.py to key
    the persisted FLOP-fit cache — FLOPs only change when code does)."""
    return _code_salt()


def default_export_dir() -> str:
    return os.path.join(os.path.dirname(_PKG_DIR), ".jax_cache", "exports")


def _aval_key(args) -> str:
    leaves, treedef = jax.tree.flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        a = np.asarray(leaf) if not hasattr(leaf, "dtype") else leaf
        parts.append(f"{getattr(a, 'shape', ())}:{getattr(a, 'dtype', type(leaf))}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:20]


class AOTProgramCache:
    """Per-process registry of exported programs (see module docstring).

    ``wrap(name, fn)`` returns a callable with jit semantics; the first call
    per (name, arg-avals) either deserializes a stored export (no trace) or
    traces + exports + stores. Thread-compat: last writer wins, both write
    identical artifacts.
    """

    def __init__(self, directory: Optional[str] = None):
        self.dir = directory or default_export_dir()
        self._loaded: dict = {}

    def _path(self, name: str, args, fingerprint: str = "") -> str:
        try:
            kind = jax.devices()[0].device_kind.replace(" ", "_")
        except Exception:
            kind = "unknown"
        key = f"{name}-{_aval_key(args)}-{kind}-{_code_salt()}-{fingerprint}"
        safe = "".join(c if c.isalnum() or c in "._-" else "_" for c in key)
        return os.path.join(self.dir, safe + ".jaxexport")

    def wrap(self, name: str, fn: Callable, fingerprint: str = "") -> Callable:
        """``fingerprint`` must digest every flag-derived value the traced
        closure bakes in as a constant (guidance scales, step grids, eta,
        dtype/precision) — without it a process launched with different
        flags would deserialize a stale export and silently compute with
        the old constants (ADVICE r4)."""
        jfn = jax.jit(fn)

        def call(*args):
            cache_key = (name, _aval_key(args), fingerprint)
            runner = self._loaded.get(cache_key)
            if runner is None:
                runner = self._load_or_export(name, jfn, args, fingerprint)
                self._loaded[cache_key] = runner
            return runner(*args)

        return call

    def _load_or_export(self, name: str, jfn, args, fingerprint: str = "") -> Callable:
        path = self._path(name, args, fingerprint)
        try:
            if os.path.exists(path):
                with open(path, "rb") as f:
                    exp = jax.export.deserialize(bytearray(f.read()))
                return jax.jit(exp.call)
        except Exception:
            pass  # unreadable/stale export → re-trace below
        try:
            avals = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype
                                               if not hasattr(a, "dtype")
                                               else a.dtype),
                args,
            )
            exp = jax.export.export(jfn)(*avals)
            data = exp.serialize()
            os.makedirs(self.dir, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
            return jax.jit(exp.call)
        except Exception as e:
            # exotic primitive / export version skew: plain jit, no export.
            # Say so once — a silent fallback re-traces this program every
            # process, which reads as "caches don't work" in bench logs.
            import sys

            print(f"[aot] export unavailable for {name}: "
                  f"{type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            return jfn
