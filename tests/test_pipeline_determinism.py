"""Run-to-run determinism of the data pipeline (reference DataLoader parity).

The torch reference's DataLoader preserves index order across its worker
processes and seeds them deterministically, so two same-seed runs of
`train.py` see identical batch streams.  Rounds 1-5 of this build raced
prefetch threads on a shared queue and a shared augmentation RNG, so two
same-seed runs diverged from step 1 (measured: the r5d replica of the r5c
run, and even the two r4 q8k attempts, disagree at step 100 —
tools/compare_replica_trail.py, docs/ROUND5.md).  The fix is counter-based:
batches are re-emitted in index-stream order via a reorder buffer, and
per-item augmentation draws are keyed by (seed, host salt, epoch, index)
(`dataset.item(index, epoch)`, dwcgan_tpu/data/drawkey.py).
"""

import numpy as np
import pytest

from dwcgan_tpu.data.pipeline import DataPipeline
from dwcgan_tpu.data.procedural import ProceduralFaceDataset


def _take(pipe, n):
    it = iter(pipe)
    return [next(it) for _ in range(n)]


def _make(num_workers, seed=7, n=96, batch=8):
    ds = ProceduralFaceDataset(n_samples=n, image_size=32, seed=seed,
                               mode="train", max_text_len=20)
    return DataPipeline(ds, batch, num_workers=num_workers, seed=seed,
                        process_index=0, process_count=1)


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        for xa, xb in zip(ba, bb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_same_seed_runs_identical_with_threads():
    """Two fresh pipelines (4 workers) yield byte-identical batch streams."""
    a = _take(_make(num_workers=4), 30)
    b = _take(_make(num_workers=4), 30)
    _assert_batches_equal(a, b)


def test_worker_count_does_not_change_stream():
    """4-worker stream == 1-worker stream (order AND content)."""
    a = _take(_make(num_workers=4), 24)
    b = _take(_make(num_workers=1), 24)
    _assert_batches_equal(a, b)


def test_epoch_varies_augmentation():
    """Same index in different epochs draws different augmentation (target
    label / text / flip), so keyed RNG does not freeze the data diversity.
    96 rows / batch 8 = 12 batches per epoch; compare epoch 0 vs epoch 1."""
    batches = _take(_make(num_workers=2), 24)
    e0 = np.concatenate([np.asarray(b.trg_label) for b in batches[:12]])
    e1 = np.concatenate([np.asarray(b.trg_label) for b in batches[12:]])
    # source rows are a different permutation each epoch, so compare the
    # aggregate draw, not row-aligned pairs: identical target-label draws
    # across epochs would make the sorted multisets equal with text too
    t0 = np.concatenate([np.asarray(b.txt) for b in batches[:12]])
    t1 = np.concatenate([np.asarray(b.txt) for b in batches[12:]])
    assert not (np.sort(e0.ravel()) == np.sort(e1.ravel())).all() or \
        not (np.sort(t0.ravel()) == np.sort(t1.ravel())).all()


def test_host_salt_decorrelates_keyed_draws():
    """Keyed draws preserve the §5.8 decorrelation contract: the host salt
    set by reseed_augmentation changes a same-(index, epoch) item's
    augmentation.  (Disjointness of the per-process index slices is proven
    by tests/test_multihost.py, which drives the real DataPipeline in two
    processes.)"""
    seed = 11
    ds0 = ProceduralFaceDataset(n_samples=64, image_size=32, seed=seed,
                                mode="train", max_text_len=20)
    ds1 = ProceduralFaceDataset(n_samples=64, image_size=32, seed=seed,
                                mode="train", max_text_len=20)
    ds1.reseed_augmentation(1)
    it0 = ds0.item(5, 0)
    it1 = ds1.item(5, 0)
    same_txt = (np.asarray(it0[3]) == np.asarray(it1[3])).all()
    same_trg = (np.asarray(it0[2]) == np.asarray(it1[2])).all()
    assert not (same_txt and same_trg)


def test_keyed_item_deterministic():
    ds = ProceduralFaceDataset(n_samples=16, image_size=32, seed=3,
                               mode="train", max_text_len=20)
    a = ds.item(4, 2)
    b = ds.item(4, 2)
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_worker_error_propagates():
    """A failing __getitem__/item must surface in the consumer, not hang."""
    class Bad(ProceduralFaceDataset):
        def item(self, index, epoch):
            raise ValueError("boom")
    ds = Bad(n_samples=16, image_size=32, seed=3, mode="train",
             max_text_len=20)
    pipe = DataPipeline(ds, 4, num_workers=2, seed=3,
                        process_index=0, process_count=1)
    with pytest.raises(RuntimeError, match="data pipeline worker failed"):
        _take(pipe, 1)
