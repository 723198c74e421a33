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


def link_probe(iters: int = 4) -> Dict[str, float]:
    """Measure the raw device->host link: round-trip latency and MB/s.

    Separates "the link was slow in this window" from "the pipeline
    under-delivers" in benchmark artifacts.  Two hard-won details
    (docs/BENCH_HISTORY.md round 4): (1) each iteration fetches a FRESH
    device-computed array - jax.Array caches its fetched value
    (`_npy_value`), so timing a second np.asarray of the same array
    measures a host memcpy, not the link; (2) the buffer is PRNG bytes,
    not a constant - relay transports compress, and a zeros probe read
    6x the window's real throughput.  Only incompressible bytes measure
    the floor compressed-frame fetches see.

    Returns {"link_rtt_ms": ..., "link_probe_mbps": ...} (medians over
    `iters - 1` fetches; the first iteration is compile warmup).  The
    MB/s figure is latency-corrected via the tiny-fetch RTT.
    """
    import jax.numpy as jnp
    import numpy as np

    def _rand_bytes(s):
        bits = jax.random.bits(jax.random.PRNGKey(s), (1024 * 1024,),
                               jnp.uint32)
        return jax.lax.bitcast_convert_type(bits, jnp.uint8).reshape(-1)

    _mk_probe = jax.jit(_rand_bytes)
    _mk_tiny = jax.jit(lambda s: jnp.full((1,), s, jnp.uint8))
    rtts, bigs = [], []
    for i in range(max(2, iters)):
        t = _mk_tiny(np.uint8(i))
        p = _mk_probe(np.uint8(i))
        # true barriers (block_until_ready unreliable over the tunnel);
        # fetching a 1-element slice does not populate the full cache
        float(jnp.sum(t.astype(jnp.float32)))
        float(jnp.sum(p[:1].astype(jnp.float32)))
        t0 = time.perf_counter()
        np.asarray(t)
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(p)
        big = time.perf_counter() - t0
        if i > 0:
            rtts.append(rtt)
            bigs.append(big)
    rtt_med = float(np.median(rtts))
    return {
        "link_rtt_ms": round(rtt_med * 1e3, 1),
        "link_probe_mbps": round(
            4.0 / max(float(np.median(bigs)) - rtt_med, 1e-6), 2),
    }
