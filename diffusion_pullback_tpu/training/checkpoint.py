"""Step-numbered training checkpoints with resume discovery.

Replaces the vendored trainer's torch.save model/EMA/opt snapshots and
resume-step parsing (/root/reference/src/models/guided_diffusion/
train_util.py:258-293) with orbax: atomic directory commits, pytree-native
(params + EMA + optimizer state in one TrainState), and sharding-aware
restore (multi-host futures handled by orbax, not rank-0 broadcast).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .train import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.keep = keep

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, state: TrainState) -> str:
        step = int(state.step)
        path = self._path(step)
        self._ckpt.save(path, state)
        self._ckpt.wait_until_finished()
        self._gc()
        return path

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)", name)
            if m:
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self._ckpt.restore(self._path(step), template)
        return TrainState(*restored)

    def _gc(self):
        steps = sorted(
            int(m.group(1))
            for name in os.listdir(self.directory)
            if (m := re.fullmatch(r"step_(\d+)", name))
        )
        import shutil

        for s in steps[: max(0, len(steps) - self.keep)]:
            shutil.rmtree(self._path(s), ignore_errors=True)
