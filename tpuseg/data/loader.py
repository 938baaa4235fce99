"""Background-prefetch batch loader.

The reference overlaps CPU augmentation with GPU compute via DataLoader
worker processes (``train.py:111-116``, --nworkers).  Here a thread pool
runs the AlignCollate augmentation for upcoming batches while the TPU
executes the current step, and a small prefetch queue keeps the device fed.
The native blob gather (``native/records_io.cpp``) accelerates the raw
reads when built.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np

from tpuseg.data.dataset import AlignCollate


class PrefetchLoader:
    """Iterate batches of an indexable dataset with background workers.

    Deterministic given (seed, epoch): the index order and every sample's
    augmentation RNG derive from them, independent of thread timing.
    """

    def __init__(
        self,
        dataset,
        collate: AlignCollate,
        batch_size: int,
        shuffle: bool,
        seed: int,
        n_workers: int = 2,
        prefetch: int = 2,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.collate = collate
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.n_workers = max(1, n_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch]))
        if self.shuffle:
            rng.shuffle(order)
        starts = list(range(0, len(order), self.batch_size))
        if self.drop_last:
            starts = [s for s in starts if s + self.batch_size <= len(order)]

        def build(bi: int):
            idx = order[starts[bi] : starts[bi] + self.batch_size]
            # per-batch deterministic rng, independent of worker scheduling
            brng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, int(bi)])
            )
            samples = [self.dataset[int(i)] for i in idx]
            return self.collate(samples, rng=brng).asdict()

        with ThreadPoolExecutor(max_workers=self.n_workers) as pool:
            futures = {}
            for bi in range(min(self.prefetch, len(starts))):
                futures[bi] = pool.submit(build, bi)
            for bi in range(len(starts)):
                batch = futures.pop(bi).result()
                nxt = bi + self.prefetch
                if nxt < len(starts):
                    futures[nxt] = pool.submit(build, nxt)
                yield batch
