"""Batched data loader with threaded prefetch and host sharding.

Replaces torch DataLoader/DistributedSampler (reference:
volta/task_utils.py:330-341): per-host shards take disjoint strided slices
of the (optionally shuffled) index space, mirroring the per-rank division;
worker threads decode samples while the accelerator runs the previous step.
"""

from __future__ import annotations

import collections
import concurrent.futures as futures
from typing import Any, Dict, Iterator

import numpy as np


def collate(samples) -> Dict[str, Any]:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        out[key] = np.stack(vals) if hasattr(vals[0], "shape") or \
            not np.isscalar(vals[0]) else np.asarray(vals)
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False,
                 num_workers: int = 4, num_shards: int = 1,
                 shard_index: int = 0, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.shard_index:: self.num_shards]

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self, idx: np.ndarray):
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i: i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idx = self._indices()
        if self.num_workers == 0:
            for chunk in self._batches(idx):
                yield collate([self.dataset[int(j)] for j in chunk])
            return

        def load(chunk):
            return collate([self.dataset[int(j)] for j in chunk])

        with futures.ThreadPoolExecutor(self.num_workers) as pool:
            pending = collections.deque()
            batches = self._batches(idx)
            try:
                for _ in range(self.prefetch):
                    pending.append(pool.submit(load, next(batches)))
            except StopIteration:
                batches = iter(())
            while pending:
                out = pending.popleft().result()
                try:
                    pending.append(pool.submit(load, next(batches)))
                except StopIteration:
                    pass
                yield out
