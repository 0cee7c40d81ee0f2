"""Tracing / profiling utilities.

The reference's only introspection is the MemSize derive (SURVEY.md
section 5); here the equivalents are FmIndexData.memory_report() plus these
helpers: a phase timer for build/query stages and a jax.profiler trace
context for device timelines (view with TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import sys
import time


class PhaseTimer:
    """Wall-clock per-phase accounting for index builds and query batches."""

    def __init__(self, log=None):
        self.phases: dict[str, float] = {}
        self._log = log if log is not None else (lambda m: print(m, file=sys.stderr))

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self._log(f"[phase] {name}: {dt:.3f}s")

    def report(self) -> dict[str, float]:
        return dict(self.phases)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a block of device work."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
