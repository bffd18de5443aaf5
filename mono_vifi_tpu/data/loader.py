"""Threaded prefetching batch loader.

Replaces the reference's torch DataLoader worker pool: a thread pool decodes
samples ahead of the training loop (PIL/numpy release the GIL for the hot
parts), batches are collated into fixed-shape numpy dicts, and the trainer
overlaps host decode with device compute via double-buffered prefetch.
Supports the stateful samplers' epoch/start_iter resume protocol.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator

import numpy as np


def collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([np.asarray(s[k]) for s in samples], axis=0)
    return out


class DataLoader:
    """Map-style dataset + sampler -> iterator of batched numpy dicts."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler=None,
        num_workers: int = 4,
        drop_last: bool = True,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        if self.sampler is not None:
            return iter(self.sampler)
        return iter(range(len(self.dataset)))

    def __iter__(self) -> Iterator[dict]:
        indices = list(self._indices())
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 1:
            for b in batches:
                yield collate([self.dataset[i] for i in b])
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = collections.deque()

            def submit(batch_idx):
                futures = [pool.submit(self.dataset.__getitem__, i) for i in batches[batch_idx]]
                pending.append(futures)

            next_submit = 0
            for _ in range(min(self.prefetch, len(batches))):
                submit(next_submit)
                next_submit += 1
            while pending:
                futures = pending.popleft()
                samples = [f.result() for f in futures]
                if next_submit < len(batches):
                    submit(next_submit)
                    next_submit += 1
                yield collate(samples)


def device_prefetch(iterator, sharding=None, size: int = 2, put_fn=None):
    """Move batches to device ahead of consumption (double buffering).

    put_fn overrides the transfer (e.g. parallel.shard_host_local_batch for
    multi-host global-batch assembly)."""
    import jax

    q = collections.deque()

    def put(batch):
        if put_fn is not None:
            return put_fn(batch)
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            q.append(put(next(it)))
    except StopIteration:
        pass
    while q:
        batch = q.popleft()
        try:
            q.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
