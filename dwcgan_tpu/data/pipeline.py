"""Host-side batching / prefetch pipeline feeding the device mesh.

The reference uses a torch DataLoader with worker processes
(`data_loader.py:6-32`).  Here: a thread-pool prefetch pipeline producing
fixed-shape NumPy batches, plus `shard_batch` placing them on a
`jax.sharding.Mesh` (batch sharded over the data axis) via
`jax.make_array_from_process_local_data` — multi-host ready.

`synthetic_batch` fabricates statistically-plausible batches (random images,
*real* synthesized text from random label pairs) for tests and benches that
must run without the CelebA images on disk.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Iterator, NamedTuple, Sequence

import numpy as np

from dwcgan_tpu.data.labels import all_domains
from dwcgan_tpu.text.synthesis import TextSynthesizer
from dwcgan_tpu.text.vocab import Vocab, tokens_to_ids


class Batch(NamedTuple):
    """One training batch; everything fixed-shape.

    image:     [B, H, W, 3] float32 in [-1, 1]
    src_label: [B, num_cls] float32 in {0, 1}
    trg_label: [B, num_cls] float32 in {0, 1}
    txt:       [B, max_len + 2] int32 token ids (BOS ... EOS PAD*)
    txt_len:   [B] int32 (BOS + words + EOS)
    """

    image: np.ndarray
    src_label: np.ndarray
    trg_label: np.ndarray
    txt: np.ndarray
    txt_len: np.ndarray


def synthetic_batch(
    batch_size: int,
    image_size: int = 128,
    num_cls: int = 8,
    max_text_len: int = 80,
    seed: int = 0,
    dataset: str = "CelebA",
) -> Batch:
    """Random images + genuinely synthesized commands from random label pairs."""
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    synth = TextSynthesizer(rng)
    vocab = Vocab(dataset)
    domains = all_domains(num_cls)
    src = domains[nprng.integers(0, len(domains), batch_size)]
    trg = domains[nprng.integers(0, len(domains), batch_size)]
    cmds = [synth.labels2text(s, t).split() for s, t in zip(src, trg)]
    txt, lens = tokens_to_ids(cmds, vocab, max_len=max_text_len)
    image = nprng.uniform(-1.0, 1.0, (batch_size, image_size, image_size, 3)).astype(np.float32)
    return Batch(image, src.astype(np.float32), trg.astype(np.float32), txt, lens)


class DataPipeline:
    """Threaded prefetching loader over a map-style dataset.

    dataset must implement __len__ and __getitem__ returning the 5-tuple
    produced by `CelebADataset.__getitem__`.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        # multi-host data sharding (SURVEY §5.8): each process loads only
        # its own disjoint slice of every epoch.  Defaults resolve from the
        # jax runtime so single-process callers need no change.
        if process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:  # jax absent/uninitialized: host-only usage
                process_index, process_count = 0, 1
        self.process_index = int(process_index or 0)
        self.process_count = int(process_count)
        assert 0 <= self.process_index < self.process_count, (
            self.process_index, self.process_count)
        assert len(dataset) >= batch_size * self.process_count, (
            "dataset smaller than one global batch "
            f"({len(dataset)} rows, {batch_size} x {self.process_count} needed)")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        if self.process_count > 1 and hasattr(dataset, "reseed_augmentation"):
            # decorrelate per-item augmentation RNG (target pairing, flips,
            # text synthesis) across hosts; the dataset's split/label
            # construction stays process-identical by contract
            dataset.reseed_augmentation(self.process_index)

    def _index_stream(self) -> Iterator[tuple]:
        """Per-epoch: every process draws the SAME permutation (seeded by
        `self.seed` alone — deliberately NOT process-salted) and takes a
        disjoint strided slice of it, so the union of all hosts' batches
        covers the epoch with no duplicated rows.  process_count == 1
        reduces exactly to the single-host behavior of rounds 1-4.
        Yields (epoch, idxs); the epoch feeds the per-item draw key."""
        rng = np.random.default_rng(self.seed)
        n = len(self.dataset)
        epoch = 0
        while True:
            order = rng.permutation(n) if self.shuffle else np.arange(n)
            mine = order[self.process_index :: self.process_count]
            m = len(mine)
            stop = m - (m % self.batch_size) if self.drop_last else m
            for i in range(0, stop, self.batch_size):
                yield epoch, mine[i : i + self.batch_size]
            epoch += 1

    def _collate(self, idxs: Sequence[int], epoch: int) -> Batch:
        # datasets exposing item(index, epoch) get deterministic keyed
        # augmentation (content independent of worker scheduling); plain
        # __getitem__ datasets keep their stateful-RNG behavior
        if hasattr(self.dataset, "item"):
            items = [self.dataset.item(int(i), epoch) for i in idxs]
        else:
            items = [self.dataset[int(i)] for i in idxs]
        return Batch(*(np.stack([it[k] for it in items]) for k in range(5)))

    def __iter__(self) -> Iterator[Batch]:
        """Infinite batch iterator with background prefetch.

        Deterministic end to end (reference DataLoader parity): workers
        take numbered batches from the index stream and the consumer
        re-emits them in stream order via a reorder buffer, so the batch
        sequence a training run sees does not depend on thread scheduling.
        The buffer is bounded by prefetch + num_workers in-flight items.
        """
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stream = enumerate(self._index_stream())
        lock = threading.Lock()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    with lock:
                        seq, (epoch, idxs) = next(stream)
                    item = (seq, self._collate(idxs, epoch))
                except BaseException as e:  # surface in the consumer, don't die silently
                    item = (-1, e)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if isinstance(item[1], BaseException):
                    return

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            want = 0
            ahead: dict = {}
            while True:
                while want not in ahead:
                    seq, item = q.get()
                    if isinstance(item, BaseException):
                        # a worker failed (missing image, decode error, ...);
                        # re-raise in the training loop instead of hanging
                        raise RuntimeError("data pipeline worker failed") from item
                    ahead[seq] = item
                yield ahead.pop(want)
                want += 1
        finally:
            stop.set()


def shard_batch(batch: Batch, mesh, data_axis: str = "data"):
    """Place a host batch on the mesh, sharded over the data axis.

    Uses `jax.make_array_from_process_local_data`, which also handles the
    multi-host case (each process contributes its local rows).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        sharding = NamedSharding(mesh, P(data_axis, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x)

    return Batch(*(put(np.asarray(x)) for x in batch))
