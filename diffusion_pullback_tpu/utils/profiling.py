"""Profiling: stage timers, compile-vs-run split, optional Perfetto traces.

Replaces the reference's scattered `time.time()` prints around JVP/VJP/SVD
stages (utils.py:755,813-814,934-943) and the unused vendored
`logger.profile_kv` contexts with structured, device-synchronised timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


class StageTimer:
    """Collects named wall-clock stages; always syncs the device first."""

    def __init__(self, logger=None):
        self.times: Dict[str, float] = {}
        self.logger = logger

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            if self.logger is not None:
                self.logger.log("stage", name=name, seconds=round(dt, 4))


def compile_and_run_split(fn: Callable, *args) -> Dict[str, float]:
    """Time first (compile+run) vs second (run) invocation of a jitted fn."""
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    run = time.perf_counter() - t0
    return {"compile_plus_run_s": first, "run_s": run,
            "compile_s": max(first - run, 0.0)}


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (Perfetto/XPlane dump) when a dir is given."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
