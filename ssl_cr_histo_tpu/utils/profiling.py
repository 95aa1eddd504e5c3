"""Tracing and throughput observability.

The reference's only instrumentation is AverageMeter batch/data timers
printed every --print_freq steps (reference util.py:26-46,
pretrain_BreastPathQ.py:74-87).  The TPU-native equivalents here:

  * ``trace(logdir)``      — jax.profiler trace capture (view in
                             TensorBoard / xprof) around a code region;
  * ``StepTimer``          — host-side wall-clock meter with device sync via
                             a scalar fetch (block_until_ready is not
                             reliable on the axon tunnel platform);
  * ``Throughput``         — running patches/sec/chip counter, the
                             framework's north-star metric.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace capture context."""
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock step timer; call ``sync_value`` with any scalar from the
    step's outputs to force device synchronization before reading time."""

    _start: float = field(default_factory=time.time)

    def reset(self):
        self._start = time.time()

    def elapsed(self, sync_value=None) -> float:
        if sync_value is not None:
            float(sync_value)  # device -> host fetch == hard sync
        return time.time() - self._start


@dataclass
class Throughput:
    """Running items/sec meter over a sliding window."""

    window: int = 50
    _times: list = field(default_factory=list)
    _counts: list = field(default_factory=list)

    def update(self, n_items: int, seconds: float):
        self._times.append(seconds)
        self._counts.append(n_items)
        if len(self._times) > self.window:
            self._times.pop(0)
            self._counts.pop(0)

    @property
    def items_per_sec(self) -> float:
        total_t = sum(self._times)
        return sum(self._counts) / total_t if total_t > 0 else 0.0
