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
) -> str:
    """local_basis-{dataset}_{idx}-{t}T-["{prompt}"-]{op}-block_{i}-seed_{s}
    (reference edit.py:218 / :713)."""
    prompt_part = f'-"{edit_prompt}"' if edit_prompt is not None else ""
    return (
        f"local_basis-{dataset_name}_{sample_idx}-{edit_t}T{prompt_part}"
        f"-{op}-block_{block_idx}-seed_{seed}"
    )


class BasisCache:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name + ".npz")

    def load(self, name: str) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        p = self.path(name)
        if not os.path.exists(p):
            return None
        try:
            z = np.load(p)
            return tuple(_from_npz(z[k]) for k in ("u", "s", "vT"))
        except Exception:
            return None

    def save(self, name: str, u, s, vT) -> str:
        p = self.path(name)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".npz.tmp")
        try:
            # pass the file object: np.savez appends '.npz' to bare paths,
            # which would leave the real tmp file empty
            with os.fdopen(fd, "wb") as f:
                # widen to f32: npz stores bfloat16 as raw void ("|V2"),
                # which neither numpy nor jnp.asarray can interpret back
                np.savez(f, u=_to_f32(u), s=_to_f32(s), vT=_to_f32(vT))
            os.replace(tmp, p)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return p
