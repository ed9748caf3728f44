"""Metric logging.

The reference reflects over Solver attributes named loss*/grad*/nwd* and
writes TensorBoard scalars (`/root/reference/utils.py:132-136`).  Here the
jitted step returns an explicit metrics dict; the writer appends JSONL
(always) and TensorBoard events when a backend is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._tb = None
        try:  # torch (CPU) ships a TensorBoard writer in this image
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def write(self, step: int, metrics: Dict[str, float]):
        scalars = {k: float(v) for k, v in metrics.items()}
        self._jsonl.write(json.dumps({"step": int(step), "time": time.time(),
                                      **scalars}) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
