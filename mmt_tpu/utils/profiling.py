"""Profiling hooks (SURVEY section 5: tracing should be first-class).

The reference had no profiler integration (TensorBoard scalars only).
Here: ``jax.profiler`` trace capture around training steps and a simple
step timer, both opt-in.

Usage:
    with trace_if("/tmp/profile", enabled=step in (10, 11)):
        state, metrics = train_step(state, batch, rng)
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace_if(log_dir: str, enabled: bool = True):
    """Captures a jax.profiler trace for the enclosed block when enabled."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def start_server(port: int = 9999):
    """Starts the profiler server for on-demand capture (tensorboard UI)."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Tracks steps/sec and examples/sec over a window."""

    def __init__(self):
        self._t0: Optional[float] = None
        self._steps = 0
        self._examples = 0

    def update(self, batch_size: int) -> None:
        if self._t0 is None:
            self._t0 = time.perf_counter()
        self._steps += 1
        self._examples += batch_size

    def snapshot(self) -> Dict[str, float]:
        if self._t0 is None or self._steps == 0:
            return {}
        dt = time.perf_counter() - self._t0
        out = {
            "steps_per_sec": self._steps / dt,
            "examples_per_sec": self._examples / dt,
        }
        self._t0 = time.perf_counter()
        self._steps = self._examples = 0
        return out
