"""Wall-clock timing (reference `utils.py:257-266` + honest device timing).

`StepTimer` calls `block_until_ready` on a representative array so step
times include device execution, the JAX analogue of the reference's
`torch.cuda.synchronize()` (train.py:108).
"""

from __future__ import annotations

import time
from typing import Optional

import jax


class Timer:
    """Context manager printing elapsed wall-clock time."""

    def __init__(self, msg: str = "Elapsed time: %f"):
        self.msg = msg
        self.elapsed: Optional[float] = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        if self.msg:
            print(self.msg % self.elapsed)


class StepTimer:
    """Rolling steps/sec with device synchronization."""

    def __init__(self):
        self._last = None
        self._count = 0

    def lap(self, sync_array=None) -> float:
        if sync_array is not None:
            # device_get (host fetch), not block_until_ready: through the
            # axon loopback relay the latter can return before device work
            # completes, producing wildly optimistic timings
            jax.device_get(sync_array)
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        self._last = now
        self._count += 1
        return dt
