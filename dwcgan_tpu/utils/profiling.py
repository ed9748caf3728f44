"""Profiling (SURVEY §5.1: the reference has only a wall-clock Timer +
cuda.synchronize; the TPU equivalent is jax.profiler traces + honest
fetch-synchronized step timing).
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labeling regions inside traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
