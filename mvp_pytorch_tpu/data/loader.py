"""Deterministic, resumable input pipeline.

Replaces the reference's DataLoader + DistributedSampler +
IterationBasedBatchSampler stack (reference `oscar_datasets_ml/build.py:84-136`):

- sampling is pure index math keyed by (seed, epoch): resume-at-step is an
  O(1) skip, not a fast-forward loop;
- the sampler state (seed, step) lives in the training checkpoint
  (SURVEY.md §7 hard part 6);
- host-side tensorization runs in a thread pool that prefetches ahead of the
  device (the reference forks worker processes; threads suffice here because
  tokenization/masking is numpy/string work and the hot path is the TPU).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class EpochShuffler:
    """Deterministic per-epoch permutation: index_at(step) is O(1)-ish."""

    def __init__(self, n: int, seed: int = 0, shuffle: bool = True):
        self.n = n
        self.seed = seed
        self.shuffle = shuffle
        self._epoch_cache = (-1, None)

    def _perm(self, epoch: int) -> np.ndarray:
        if self._epoch_cache[0] != epoch:
            if self.shuffle:
                rng = np.random.default_rng((self.seed, epoch))
                p = rng.permutation(self.n)
            else:
                p = np.arange(self.n)
            self._epoch_cache = (epoch, p)
        return self._epoch_cache[1]

    def index(self, global_pos: int) -> int:
        epoch, offset = divmod(global_pos, self.n)
        return int(self._perm(epoch)[offset])


class BatchSampler:
    """Yields (step, epoch, indices) forever from a start step
    (the reference's IterationBasedBatchSampler role)."""

    def __init__(self, n: int, batch_size: int, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = True,
                 rank: int = 0, world_size: int = 1):
        assert batch_size % world_size == 0 or world_size == 1
        self.n = n
        self.global_batch = batch_size
        self.shuffler = EpochShuffler(n, seed, shuffle)
        self.rank = rank
        self.world_size = world_size

    def batch_at(self, step: int) -> np.ndarray:
        base = step * self.global_batch
        idx = [self.shuffler.index(base + i)
               for i in range(self.global_batch)]
        return np.asarray(idx)

    def iter_from(self, start_step: int) -> Iterator:
        step = start_step
        while True:
            yield step, (step * self.global_batch) // self.n, self.batch_at(step)
            step += 1


class PrefetchLoader:
    """Background tensorization + prefetch queue.

    fetch(indices) -> batch dict is user-provided (dataset.collate of
    per-index tensorize). Exceptions propagate to the consumer.
    """

    def __init__(self, fetch: Callable[[np.ndarray], Dict],
                 sampler: BatchSampler, start_step: int = 0,
                 prefetch: int = 4, num_threads: int = 4):
        self.fetch = fetch
        self.sampler = sampler
        self.start_step = start_step
        self.prefetch = prefetch
        self.num_threads = max(1, num_threads)
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = []

    def _producer(self, worker_id: int):
        step = self.start_step + worker_id
        try:
            while not self._stop.is_set():
                idx = self.sampler.batch_at(step)
                batch = self.fetch(idx)
                self._q.put((step, batch))
                step += self.num_threads
        except Exception as e:  # propagate
            self._q.put((None, e))

    def __iter__(self):
        for i in range(self.num_threads):
            t = threading.Thread(target=self._producer, args=(i,),
                                 daemon=True)
            t.start()
            self._threads.append(t)
        pending = {}
        next_step = self.start_step
        try:
            while True:
                while next_step not in pending:
                    step, batch = self._q.get()
                    if step is None:
                        raise batch
                    pending[step] = batch
                yield next_step, pending.pop(next_step)
                next_step += 1
        finally:
            self.close()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
