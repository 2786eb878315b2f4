"""Profiling helpers: jax.profiler traces + per-stage wall timing.

The reference's "tracing" is printf wall-clock at best (SURVEY.md section
5); here `trace()` captures an XProf/Perfetto trace directory around any
code region, and `StageTimer` gives cheap named wall timings (with
`block_until_ready` so device work is attributed to its stage).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with XProf/TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self):
        self.timings: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.timings[name] = self.timings.get(name, 0.0) + time.perf_counter() - t0
