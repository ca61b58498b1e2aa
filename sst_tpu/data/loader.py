"""Threaded prefetching data loader producing device-ready batches.

Replaces the torch DataLoader + DistributedSampler stack (SURVEY §2.15):
under pjit there is one process, so "distributed sampling" reduces to
sharding the global batch across the mesh (train/step.py shard_batch);
sequence-aware samplers for FSD++/CTRL order indices so whole sequences stay
in one global-batch lane."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Sequence

import numpy as np

from sst_tpu.data.datasets import collate_to_batch


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, seed: int = 0, drop_last: bool = True,
                 collate: Callable = collate_to_batch):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.collate = collate
        self.epoch = 0

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        if self.drop_last:
            idx = idx[: (n // self.batch_size) * self.batch_size]
        return idx

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        idx = self._indices()
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        def worker(batch_list):
            for b in batch_list:
                if stop.is_set():
                    return
                samples = [self.dataset[int(i)] for i in b]
                q.put(self.collate(samples))
            q.put(None)

        shards = [batches[i :: self.num_workers] for i in range(self.num_workers)]
        threads = [
            threading.Thread(target=worker, args=(s,), daemon=True)
            for s in shards
        ]
        for t in threads:
            t.start()
        done = 0
        try:
            while done < self.num_workers:
                item = q.get()
                if item is None:
                    done += 1
                    continue
                yield item
        finally:
            stop.set()
        self.epoch += 1
