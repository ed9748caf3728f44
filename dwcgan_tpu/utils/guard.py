"""Failure detection (SURVEY §5.3: the reference has none — crash recovery is
manual restart).  Here: a NaN/Inf tripwire over the per-step metrics that
raises, so long unattended runs fail loudly instead of training on garbage.
The corrupted state is deliberately NOT checkpointed — the last healthy
periodic snapshot stays the latest, so --resume 1 restarts cleanly."""

from __future__ import annotations

import math
from typing import Dict


class NonFiniteLossError(RuntimeError):
    pass


class FiniteGuard:
    """Check metric dicts every `every` steps; trip after `patience`
    consecutive non-finite observations (transient inf in GAN losses at low
    batch sizes is survivable; persistent NaN is not)."""

    def __init__(self, every: int = 100, patience: int = 2,
                 keys=("loss_gen_total", "loss_dis_all")):
        self.every = every
        self.patience = patience
        self.keys = keys
        self._strikes = 0

    def check(self, step: int, metrics: Dict[str, float],
              checkpoint=None, state=None) -> bool:
        """Returns True if healthy; raises NonFiniteLossError when tripped.

        The NaN state is never saved (it would become the newest checkpoint
        and poison --resume); the message names the last healthy snapshot.
        """
        if step % self.every != 0:
            return True
        bad = [k for k in self.keys
               if k in metrics and not math.isfinite(float(metrics[k]))]
        if not bad:
            self._strikes = 0
            return True
        self._strikes += 1
        if self._strikes >= self.patience:
            last_good = None
            if checkpoint is not None:
                try:
                    last_good = checkpoint.latest_step()
                except Exception:
                    pass
            raise NonFiniteLossError(
                f"non-finite {bad} at step {step} "
                f"({self._strikes} consecutive checks); resume from the last "
                f"healthy checkpoint (step {last_good})")
        return False
