"""Profiling and observability helpers.

The reference's only tracing is wall-clock deltas via ``clock()``
(automix.c:78,131-132,153-154,193-194) plus stdout countdowns.  The engine
keeps the per-stage timers (``timesecs_*`` on RunStats/CondProbStats) and
adds device-level tracing via ``jax.profiler`` — traces open in
TensorBoard or Perfetto and show per-op device time inside the sweep
kernel.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace of the enclosed block.

    Example::

        with profiling.trace("/tmp/automix_trace"):
            am.rjmcmc_samples(10_000)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock segments with a summary, device-synchronized."""

    def __init__(self):
        self.segments = {}

    @contextlib.contextmanager
    def segment(self, name: str, sync=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.segments[name] = self.segments.get(name, 0.0) + (
                time.perf_counter() - t0)

    def summary(self) -> str:
        total = sum(self.segments.values()) or 1.0
        lines = [f"{name}: {secs:.3f}s ({100 * secs / total:.1f}%)"
                 for name, secs in sorted(self.segments.items(),
                                          key=lambda kv: -kv[1])]
        return "\n".join(lines)


def throughput(stats) -> Optional[float]:
    """Aggregate stage-3 chain-sweeps/s of an accumulated RunStats."""
    if stats is None or stats.timesecs_rjmcmc <= 0:
        return None
    return stats.n_chains * stats.nsweeps / stats.timesecs_rjmcmc
