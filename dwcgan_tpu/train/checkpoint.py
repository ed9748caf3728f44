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
    (solver.py:383-400): copy every param whose path exists with a matching
    shape in the pretrained checkpoint, skipping the text-embedding table;
    optimizer/EMA/step state stays fresh.

    The donor is restored WITHOUT a template (raw pytree), so checkpoints
    from runs with a different optimizer chain, vocab size, or TrainState
    layout still warm-start the compatible subset — tolerance the
    template-based `restore` cannot give.
    """
    mgr = ocp.CheckpointManager(os.path.abspath(pretrain_dir))
    step = mgr.latest_step()
    assert step is not None, f"no checkpoint under {pretrain_dir}"
    raw = mgr.restore(step)  # raw nested dicts/arrays, no structure enforced
    mgr.close()
    if hasattr(raw, "get") and "default" in raw:
        raw = raw["default"]

    def lookup(tree, path):
        node = tree
        for p in path:
            key = getattr(p, "key", getattr(p, "name", None))
            key = str(key) if key is not None else str(getattr(p, "idx", p))
            if not hasattr(node, "get") or key not in node:
                return None
            node = node[key]
        return node

    import numpy as np

    def merge_tree(cur_tree, src_tree):
        def merge(path, cur):
            names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
            if any(s in n for s in skip_substrings for n in names):
                return cur
            new = lookup(src_tree, path)
            if new is None or not hasattr(new, "shape") \
                    or tuple(new.shape) != tuple(cur.shape):
                return cur
            return np.asarray(new).astype(cur.dtype)

        return jax.tree_util.tree_map_with_path(merge, cur_tree)

    return state.replace(
        gen_params=merge_tree(state.gen_params, raw.get("gen_params") or {}),
        dis_params=merge_tree(state.dis_params, raw.get("dis_params") or {}),
    )
