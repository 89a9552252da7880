"""Artifact cache for pullback bases (u, s, vT) and result idempotency.

Mirrors the reference's filesystem contract (edit.py:218-246, 285-288):
name-keyed basis files with load-if-exists, and skip-if-result-PNG-exists.
Storage is a single .npz per basis (atomic via temp+rename) instead of three
torch.save files; keys keep the same human-readable naming scheme so runs
remain greppable/resumable the same way.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import numpy as np


def _to_f32(a) -> np.ndarray:
    a = np.asarray(a)
    if a.dtype.kind == "f" and a.dtype != np.float32:
        return a.astype(np.float32)
    if a.dtype.kind not in "fiu":  # e.g. jax bfloat16 viewed as void
        return np.asarray(a, np.float32)
    return a


def _from_npz(a: np.ndarray) -> np.ndarray:
    if a.dtype.kind == "V" and a.dtype.itemsize == 2:
        # legacy cache written before the f32 widening: raw bfloat16 bytes
        import ml_dtypes

        return a.view(ml_dtypes.bfloat16).astype(np.float32)
    return a


def basis_name(
    dataset_name: str,
    sample_idx: int,
    edit_t: float,
    op: str,
    block_idx: int,
    seed: int,
    edit_prompt: Optional[str] = None,
    pca_rank: Optional[int] = None,
) -> str:
    """local_basis-{dataset}_{idx}-{t}T-["{prompt}"-]{op}-block_{i}-seed_{s}
    (reference edit.py:218 / :713). The reference disambiguates ranks via
    its save_dir (`...-pca_rank_{r}`, edit.py:220); here the rank joins the
    name so r=2 edit bases and r=50 analysis bases never shadow each other
    in the flat cache folder."""
    prompt_part = f'-"{edit_prompt}"' if edit_prompt is not None else ""
    rank_part = f"-pca_rank_{pca_rank}" if pca_rank is not None else ""
    return (
        f"local_basis-{dataset_name}_{sample_idx}-{edit_t}T{prompt_part}"
        f"-{op}-block_{block_idx}-seed_{seed}{rank_part}"
    )


def load_basis(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Format-agnostic (u, s, vT) load of a basis file (.dpb or .npz)."""
    if path.endswith(".dpb"):
        from ..utils.native import basis_read

        out = basis_read(path)
        if out is None:
            raise OSError(f"unreadable native basis file: {path}")
        return out
    z = np.load(path)
    return tuple(_from_npz(z[k]) for k in ("u", "s", "vT"))


class BasisCache:
    """Preferred storage is the native mmap format (.dpb — one binary file,
    atomic fsync'd write in C++, zero-copy np.memmap load;
    native/basisstore.cpp); .npz is the pure-Python fallback and stays
    readable for caches written by earlier rounds."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        from ..utils import native

        self._native = native.get_lib() is not None and hasattr(
            native.get_lib(), "dpx_basis_write"
        )

    def path(self, name: str) -> str:
        """The basis file for `name`: whichever format exists AND is
        readable here, else the preferred one for new writes."""
        dpb = os.path.join(self.root, name + ".dpb")
        npz = os.path.join(self.root, name + ".npz")
        if os.path.exists(dpb) and self._native:
            return dpb
        if os.path.exists(npz):
            return npz
        if os.path.exists(dpb):
            return dpb
        return dpb if self._native else npz

    def load(self, name: str) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        # try both formats: a .dpb written on a native-enabled machine must
        # not become a permanent miss (or shadow an .npz) on a host without
        # the native lib
        for ext in (".dpb", ".npz"):
            p = os.path.join(self.root, name + ext)
            if not os.path.exists(p):
                continue
            try:
                if ext == ".dpb":
                    from ..utils.native import basis_read

                    out = basis_read(p)
                    if out is not None:
                        return out
                    continue
                z = np.load(p)
                return tuple(_from_npz(z[k]) for k in ("u", "s", "vT"))
            except Exception:
                continue
        return None

    def save(self, name: str, u, s, vT) -> str:
        # widen to f32: the stores hold bfloat16 poorly (npz as raw void,
        # dpb is f32-only by format)
        u, s, vT = _to_f32(u), _to_f32(s), _to_f32(vT)
        if self._native:
            from ..utils.native import basis_write

            p = os.path.join(self.root, name + ".dpb")
            if basis_write(p, u, s, vT):
                return p
        p = os.path.join(self.root, name + ".npz")
        # a stale .dpb this host cannot read would shadow the fresh .npz in
        # path(); drop it
        dpb = os.path.join(self.root, name + ".dpb")
        if os.path.exists(dpb):
            os.unlink(dpb)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".npz.tmp")
        try:
            # pass the file object: np.savez appends '.npz' to bare paths,
            # which would leave the real tmp file empty
            with os.fdopen(fd, "wb") as f:
                np.savez(f, u=u, s=s, vT=vT)
            os.replace(tmp, p)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return p
