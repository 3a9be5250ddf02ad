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

Concurrency design: each producer thread owns the steps congruent to its
worker id and its OWN bounded queue, so (a) the consumer reads queues
round-robin and batches arrive in order with no unbounded reassembly
buffer, and (b) a stalled worker back-pressures only itself. The epoch
permutation cache is lock-guarded because producers race across epoch
boundaries.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class EpochShuffler:
    """Deterministic per-epoch permutation: index_at(step) is O(1)-ish.

    Thread-safe: the per-epoch permutation cache is shared by all
    PrefetchLoader producer threads, which straddle epoch boundaries
    (worker steps are num_threads apart), so reads/writes are
    lock-guarded and a few recent epochs stay cached."""

    def __init__(self, n: int, seed: int = 0, shuffle: bool = True):
        self.n = n
        self.seed = seed
        self.shuffle = shuffle
        self._cache: Dict[int, np.ndarray] = {}
        self._lock = threading.Lock()

    def _perm(self, epoch: int) -> np.ndarray:
        with self._lock:
            p = self._cache.get(epoch)
            if p is None:
                if self.shuffle:
                    rng = np.random.default_rng((self.seed, epoch))
                    p = rng.permutation(self.n)
                else:
                    p = np.arange(self.n)
                self._cache[epoch] = p
                if len(self._cache) > 8:   # bound: workers span few epochs
                    for k in sorted(self._cache)[:-8]:
                        del self._cache[k]
            return p


def _epoch_aware(fetch: Callable) -> Callable[[np.ndarray, int], Dict]:
    """Adapt a dataset fetch to the (indices, epoch) calling convention.

    Datasets whose masking rng is epoch-keyed accept fetch(indices, epoch)
    — the loaders must pass the sampler's epoch or every epoch repeats the
    epoch-0 masks (the reference re-masks per epoch via its per-__getitem__
    random state + DistributedSampler.set_epoch)."""
    import inspect
    try:
        takes_epoch = "epoch" in inspect.signature(fetch).parameters
    except (TypeError, ValueError):
        takes_epoch = False
    if takes_epoch:
        return lambda idx, epoch: fetch(idx, epoch)
    return lambda idx, epoch: fetch(idx)


class BatchSampler:
    """Yields (step, epoch, indices) forever from a start step
    (the reference's IterationBasedBatchSampler role).

    `rank`/`world_size`: each rank receives its contiguous
    batch_size/world_size shard of the global batch (the reference's
    DistributedSampler role). `drop_last=True` skips the per-epoch tail
    that cannot fill a global batch (the reference wraps
    BatchSampler(drop_last=True)); batches never mix epochs then. With
    n < batch_size the tail-skip would drop everything, so it falls back
    to wrap-around."""

    def __init__(self, n: int, batch_size: int, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = True,
                 rank: int = 0, world_size: int = 1):
        assert batch_size % max(world_size, 1) == 0
        assert 0 <= rank < max(world_size, 1)
        self.n = n
        self.global_batch = batch_size
        self.local_batch = batch_size // max(world_size, 1)
        self.shuffler = EpochShuffler(n, seed, shuffle)
        self.rank = rank
        self.world_size = world_size
        if drop_last and n >= batch_size:
            self.epoch_len = (n // batch_size) * batch_size
        else:
            self.epoch_len = n

    def _index(self, global_pos: int) -> int:
        epoch, offset = divmod(global_pos, self.epoch_len)
        return int(self.shuffler._perm(epoch)[offset])

    def batch_at(self, step: int) -> np.ndarray:
        base = step * self.global_batch + self.rank * self.local_batch
        return np.asarray([self._index(base + i)
                           for i in range(self.local_batch)])

    def epoch_at(self, step: int) -> int:
        return (step * self.global_batch) // self.epoch_len

    def iter_from(self, start_step: int) -> Iterator:
        step = start_step
        while True:
            yield step, self.epoch_at(step), self.batch_at(step)
            step += 1


class PrefetchLoader:
    """Background tensorization + prefetch queue (single-use).

    fetch(indices) -> batch dict is user-provided (dataset.collate of
    per-index tensorize). Exceptions propagate to the consumer. Worker w
    produces steps start+w, start+w+T, ... into its own bounded queue;
    the consumer round-robins the queues, so output is in step order with
    memory bounded at ~(prefetch + num_threads) batches even if one
    worker stalls.
    """

    def __init__(self, fetch: Callable[[np.ndarray], Dict],
                 sampler: BatchSampler, start_step: int = 0,
                 prefetch: int = 4, num_threads: int = 4):
        self.fetch = _epoch_aware(fetch)
        self.sampler = sampler
        self.start_step = start_step
        self.num_threads = max(1, num_threads)
        per = max(1, prefetch // self.num_threads)
        self._qs = [queue.Queue(maxsize=per)
                    for _ in range(self.num_threads)]
        self._stop = threading.Event()
        self._threads: list = []

    def _put(self, q: "queue.Queue", item) -> bool:
        """put that gives up when close() is called (never blocks forever
        on a full queue nobody will drain)."""
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _producer(self, worker_id: int):
        step = self.start_step + worker_id
        q = self._qs[worker_id]
        try:
            while not self._stop.is_set():
                idx = self.sampler.batch_at(step)
                batch = self.fetch(idx, self.sampler.epoch_at(step))
                if not self._put(q, (step, batch)):
                    return
                step += self.num_threads
        except Exception as e:  # propagate
            self._put(q, (None, e))

    def __iter__(self):
        if self._threads:
            raise RuntimeError(
                "PrefetchLoader is single-use; construct a new loader "
                "(its producers were already started/stopped)")
        for i in range(self.num_threads):
            t = threading.Thread(target=self._producer, args=(i,),
                                 daemon=True)
            t.start()
            self._threads.append(t)
        next_step = self.start_step
        try:
            while True:
                q = self._qs[(next_step - self.start_step)
                             % self.num_threads]
                step, batch = q.get()
                if step is None:
                    raise batch
                assert step == next_step, (step, next_step)
                yield next_step, batch
                next_step += 1
        finally:
            self.close()

    def close(self):
        self._stop.set()
        # drain until producers exit (they may be blocked mid-put; _put
        # re-checks _stop every 200 ms, so one drain pass per wait tick
        # is enough for them to bail out)
        for t in self._threads:
            while t.is_alive():
                for q in self._qs:
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        pass
                t.join(timeout=0.05)


class ProcessPrefetchLoader:
    """Fork-based prefetch over a shared-memory slot ring: the reference's
    multi-process DataLoader workers (`oscar_datasets_ml/build.py`
    num_workers), for the tensorize path the GIL refuses to parallelize.

    Measured on the pretrain fetch (bench data_plane): 8 threads run at
    0.76x the SINGLE-thread rate (GIL), and a naive mp.Queue transport is
    worse still (pickling ~40 MB batches serializes in the consumer). So
    batches travel through preallocated SharedMemory slots — the worker
    memcpys its arrays into a free slot, the queue carries only
    (step, slot); the consumer copies the views out (~4 ms) and releases
    the slot via a semaphore.

    Same contract and step-ownership discipline as PrefetchLoader; batch
    shapes must be static across steps (they are — fixed-shape
    tensorize). Workers inherit the dataset by fork (TSVFile reopens on
    pid change); per-index seeded RNG makes the produced batches
    identical to the thread loader's (tests/test_loader.py).
    """

    def __init__(self, fetch: Callable[[np.ndarray], Dict],
                 sampler: BatchSampler, start_step: int = 0,
                 prefetch: int = 4, num_procs: int = 4):
        import multiprocessing as mp
        import uuid
        self._ctx = mp.get_context("fork")
        self.fetch = _epoch_aware(fetch)
        self.sampler = sampler
        self.start_step = start_step
        self.num_procs = max(1, num_procs)
        self.n_slots = max(2, prefetch // self.num_procs + 1)
        # deterministic segment names (tag + worker + slot): close() can
        # unlink every segment even for a worker whose spec message the
        # consumer never received (worker crashed/killed early) — without
        # this, those segments would outlive the process in /dev/shm
        self._tag = uuid.uuid4().hex[:10]
        self._qs = [self._ctx.Queue() for _ in range(self.num_procs)]
        self._sems = [self._ctx.BoundedSemaphore(self.n_slots)
                      for _ in range(self.num_procs)]
        self._stop = self._ctx.Event()
        self._procs: list = []
        self._shms: list = []          # consumer-side handles
        self._specs: list = []         # per-worker (keys, shapes, dtypes, offsets)

    def _slot_name(self, worker_id: int, slot: int) -> str:
        return f"mvppl_{self._tag}_{worker_id}_{slot}"

    # ---------------- worker side ----------------
    @staticmethod
    def _layout(batch: Dict[str, np.ndarray]):
        keys = sorted(batch)
        offsets, total = {}, 0
        for k in keys:
            a = np.ascontiguousarray(batch[k])
            offsets[k] = total
            total += a.nbytes
        shapes = {k: batch[k].shape for k in keys}
        dtypes = {k: str(batch[k].dtype) for k in keys}
        return keys, shapes, dtypes, offsets, total

    def _producer(self, worker_id: int):
        from multiprocessing import shared_memory
        q = self._qs[worker_id]
        sem = self._sems[worker_id]
        step = self.start_step + worker_id
        shms, views = [], []
        try:
            batch = self.fetch(self.sampler.batch_at(step),
                               self.sampler.epoch_at(step))
            keys, shapes, dtypes, offsets, total = self._layout(batch)
            for s in range(self.n_slots):
                shm = shared_memory.SharedMemory(
                    create=True, size=total,
                    name=self._slot_name(worker_id, s))
                # the CONSUMER owns unlink; unregister from this worker's
                # resource tracker or it warns about the already-unlinked
                # segment at exit
                try:
                    from multiprocessing import resource_tracker
                    resource_tracker.unregister(shm._name, "shared_memory")
                except Exception:  # noqa: BLE001 — cosmetic only
                    pass
                shms.append(shm)
                views.append({
                    k: np.ndarray(shapes[k], dtypes[k], buffer=shm.buf,
                                  offset=offsets[k]) for k in keys})
            q.put(("spec", [s.name for s in shms], keys,
                   {k: tuple(shapes[k]) for k in keys}, dtypes, offsets))
            slot = 0
            while not self._stop.is_set():
                if not sem.acquire(timeout=0.2):
                    continue
                for k in keys:
                    views[slot][k][...] = batch[k]
                q.put((step, slot))
                slot = (slot + 1) % self.n_slots
                step += self.num_procs
                if self._stop.is_set():
                    break
                batch = self.fetch(self.sampler.batch_at(step),
                                   self.sampler.epoch_at(step))
        except Exception as e:  # noqa: BLE001 — propagate to consumer
            try:
                q.put(("error", f"{type(e).__name__}: {e}"))
            except Exception:  # noqa: BLE001
                pass
        finally:
            for shm in shms:
                shm.close()   # consumer owns unlink

    # ---------------- consumer side ----------------
    def _get_msg(self, worker_id: int):
        """Queue get with worker-liveness checks: a hard-killed worker
        (OOM killer — exactly the ~40 MB-batch regime this loader serves)
        never enqueues its ('error', ...) sentinel, and a bare q.get()
        would block training forever."""
        import queue as _q
        q = self._qs[worker_id]
        while True:
            try:
                msg = q.get(timeout=1.0)
            except _q.Empty:
                p = self._procs[worker_id]
                if not p.is_alive():
                    raise RuntimeError(
                        f"loader worker {worker_id} died (exitcode "
                        f"{p.exitcode}) without reporting an error — "
                        "likely killed by the OS (OOM?)")
                continue
            if msg[0] == "error":
                raise RuntimeError(f"loader worker failed: {msg[1]}")
            return msg

    def _open_spec(self, worker_id: int):
        from multiprocessing import shared_memory
        msg = self._get_msg(worker_id)
        assert msg[0] == "spec", msg
        _, names, keys, shapes, dtypes, offsets = msg
        shms = [shared_memory.SharedMemory(name=n) for n in names]
        self._shms.append(shms)
        self._specs.append((keys, shapes, dtypes, offsets, shms))

    def __iter__(self):
        if self._procs:
            raise RuntimeError("ProcessPrefetchLoader is single-use")
        next_step = self.start_step
        # startup is INSIDE the try: a worker dying while producing its
        # first batch (_open_spec raises) must still run close(), or the
        # surviving workers spin forever and their shm segments leak —
        # the deterministic-name cleanup exists for exactly that crash
        try:
            for i in range(self.num_procs):
                p = self._ctx.Process(target=self._producer, args=(i,),
                                      daemon=True)
                p.start()
                self._procs.append(p)
            for i in range(self.num_procs):
                self._open_spec(i)
            while True:
                w = (next_step - self.start_step) % self.num_procs
                msg = self._get_msg(w)
                step, slot = msg
                assert step == next_step, (step, next_step)
                keys, shapes, dtypes, offsets, shms = self._specs[w]
                buf = shms[slot].buf
                batch = {k: np.array(
                    np.ndarray(shapes[k], dtypes[k], buffer=buf,
                               offset=offsets[k]), copy=True)
                    for k in keys}
                self._sems[w].release()
                yield next_step, batch
                next_step += 1
        finally:
            self.close()

    def close(self):
        self._stop.set()
        import queue as _q
        for w, p in enumerate(self._procs):
            deadline = 100
            while p.is_alive() and deadline > 0:
                try:    # unblock a worker waiting on a full ring
                    self._sems[w].release()
                except ValueError:
                    pass
                try:
                    self._qs[w].get_nowait()
                except _q.Empty:
                    pass
                p.join(timeout=0.05)
                deadline -= 1
            if p.is_alive():
                p.terminate()
                p.join(timeout=2)
        for shms in self._shms:
            for shm in shms:
                shm.close()
        self._shms = []
        # unlink by deterministic name — covers segments of workers whose
        # spec the consumer never opened (worker crashed before/while the
        # spec was in flight), which handle-based unlink would leak
        from multiprocessing import shared_memory
        for w in range(self.num_procs):
            for s in range(self.n_slots):
                try:
                    shm = shared_memory.SharedMemory(
                        name=self._slot_name(w, s))
                except FileNotFoundError:
                    continue
                shm.close()
                try:
                    shm.unlink()
                except FileNotFoundError:
                    pass
        for q in self._qs:
            q.close()
            q.cancel_join_thread()
