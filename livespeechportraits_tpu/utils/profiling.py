"""Profiling/tracing hooks.

The reference has no profiling at all (SURVEY.md §5: tqdm bars and one
timing print).  Here: a context manager around jax.profiler traces plus a
lightweight stage stopwatch that the pipeline's `stage_ms` dicts feed.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lsp_trace") -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Accumulating named-stage stopwatch."""

    def __init__(self) -> None:
        self.ms: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.ms[name] = self.ms.get(name, 0.0) + (time.perf_counter() - t0) * 1e3

    def report(self) -> str:
        if not self.ms:
            return "no stages recorded"
        total = sum(self.ms.values())
        denom = total or 1.0  # sub-resolution stages must not divide by 0
        lines = [f"{k}: {v:.1f} ms ({100*v/denom:.0f}%)"
                 for k, v in self.ms.items()]
        return " | ".join(lines) + f" | total {total:.1f} ms"
