"""Batch loader: shuffled fixed-shape batches with background prefetch.

Replaces torch DataLoader(batch_size=3, shuffle=True, drop_last=True,
collate_fn=collate_batch) from main.py:42-48.  Host work (parse, sample,
collate) runs in a worker thread one batch ahead of the consumer so the
accelerator never waits on ingest.

Determinism: every epoch's shuffle order and per-sample RNG derive from
(seed, epoch_index), so a resumed run (`loader.epoch = start_epoch`)
replays exactly the data order the uninterrupted run would have used.
Worker exceptions propagate to the consumer (a corrupt file fails the
epoch loudly instead of silently truncating it).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from wireframe_tpu.data.building3d import Building3DDataset, collate_fixed


class ArrayBatchLoader:
    """In-memory loader over pre-collated fixed-shape batches.

    Presents the same surface `train_model` consumes from `BatchLoader`
    (`__len__`, iteration, `.epoch`, `.batch_size`, `.dataset`,
    `.drop_last`) for synthetic / already-materialized data — used by
    the multichip dryrun and sharding tests so they exercise the real
    production loop instead of a private copy of it.
    """

    def __init__(self, batches):
        self.batches = list(batches)
        self.dataset = self.batches
        self.batch_size = (len(self.batches[0]["point_clouds"])
                           if self.batches else 0)
        self.drop_last = False
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.batches)

    def __iter__(self) -> Iterator[dict]:
        self.epoch += 1
        return iter(self.batches)


class BatchLoader:
    def __init__(self, dataset: Building3DDataset, batch_size: int,
                 max_vertices: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 augment_on_host: Optional[bool] = None,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_vertices = max_vertices
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.augment_on_host = augment_on_host
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0  # next epoch index; set before iterating to resume

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_rng(self, epoch: int) -> np.random.Generator:
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch]))

    def _make_batch(self, indices, rng) -> dict:
        samples = [
            self.dataset.get_sample(
                int(i), rng=rng, augment_on_host=self.augment_on_host)
            for i in indices
        ]
        return collate_fixed(samples, self.max_vertices)

    def __iter__(self) -> Iterator[dict]:
        epoch = self.epoch
        self.epoch += 1
        rng = self._epoch_rng(epoch)
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(indices)
        bs = self.batch_size
        batches = [indices[k:k + bs] for k in range(0, len(indices), bs)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == bs]

        if self.prefetch <= 0:
            for bi in batches:
                yield self._make_batch(bi, rng)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for bi in batches:
                    q.put(self._make_batch(bi, rng))
                q.put(sentinel)
            except BaseException as e:  # propagate to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
