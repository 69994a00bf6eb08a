"""Timing spans + JAX profiler hooks.

The reference's observability is wall-clock ``time.time()`` spans printed
around epochs/eval/HPO (tone_bias_train.py:384-431, tone_bias_test.py:
643-647). :class:`Timer` keeps that contract; :func:`trace` adds
``jax.profiler`` traces for real TPU profiling (new capability).
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Context-manager stopwatch: ``with Timer('x') as t: ...; t.elapsed``."""

    def __init__(self, name: str = ""):
        self.name = name
        self.elapsed = 0.0

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._start


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named span that shows up in profiler timelines."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
