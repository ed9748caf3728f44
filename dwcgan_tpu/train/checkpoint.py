"""Orbax checkpointing of the single train-state pytree.

Strictly better than the reference's resume path (solver.py:359-413), which
drops optimizer state and rebuilds EMA copies fresh: here the whole
TrainState — params, EMA shadows, both optimizer states, step, rng —
round-trips losslessly, and schedules are pure functions of the restored
step so there is nothing to fast-forward.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from dwcgan_tpu.train.state import TrainState


class CheckpointManager:
    """Thin wrapper around orbax CheckpointManager for the TrainState."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval: int = 1):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval,
                create=True,
            ),
        )

    def save(self, state: TrainState, step: Optional[int] = None,
             wait: bool = False) -> bool:
        step = int(state.step) if step is None else int(step)
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()
        return saved

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure (and shardings) of `template`."""
        step = self.latest_step() if step is None else step
        assert step is not None, "no checkpoint found"
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def warm_start(state: TrainState, pretrain_dir: str,
               skip_substrings=("embedding",)) -> TrainState:
    """Partial warm-start from another run's checkpoint.

    Equivalent capability to the reference's `init_network`
    (solver.py:383-400): copy every matching param from the pretrained
    checkpoint, skipping the text-embedding table (and any shape mismatch),
    keeping fresh optimizer/EMA/step state.
    """
    import jax

    mgr = CheckpointManager(pretrain_dir)
    src = mgr.restore(state)
    mgr.close()

    def merge(path, cur, new):
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if any(s in n for s in skip_substrings for n in names):
            return cur
        if cur.shape != new.shape or cur.dtype != new.dtype:
            return cur
        return new

    return state.replace(
        gen_params=jax.tree_util.tree_map_with_path(
            merge, state.gen_params, src.gen_params),
        dis_params=jax.tree_util.tree_map_with_path(
            merge, state.dis_params, src.dis_params),
    )
