"""Input pipeline: batching, shuffling, threaded prefetch, device placement.

The reference stacks torch DataLoader + DistributedSampler + per-rank
``batch.to(device)`` copies (reference: train.py:78-117,
utils/common.py:14-38).  Single-controller JAX needs no sampler sharding —
one host assembles the GLOBAL batch and ``jax.device_put`` places each
device's shard directly (parallel/mesh.py).  Decode+augment runs in a
thread pool (cv2/numpy release the GIL) and finished batches are staged in
a small prefetch queue so host work overlaps device steps.

Also provides ``StatefulLoader`` iteration-exact resume: the shuffle order
is a pure function of (seed, epoch), so resuming at iteration N replays
the exact batch sequence — the capability the reference's
StatefulDistributedSampler defines but never wires up
(reference: utils/base.py:22-77, SURVEY.md section 5).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np


class _ProducerError:
    """Wraps an exception raised on a producer thread so the consuming
    iterator re-raises it instead of treating it as end-of-stream."""

    def __init__(self, error: BaseException):
        self.error = error


class _ConsumerGone(Exception):
    """Raised inside a producer's emit() when the consumer has left."""


def _background_batches(produce: Callable, prefetch: int) -> Iterator[Any]:
    """Run ``produce(emit)`` on a daemon thread; yield what it emits.

    The single producer/consumer implementation behind both the
    epoch-bounded ``DataLoader.__iter__`` and the unbounded
    ``infinite_batches`` (previously two drifting copies):

      * bounded queue of ``prefetch`` finished batches;
      * producer exceptions re-raised in the consumer (not end-of-stream);
      * consumer teardown (break / GC) unblocks the producer promptly —
        ``emit`` retries with a timeout and raises ``_ConsumerGone``.

    ``produce`` calls ``emit(batch)`` per batch; returning normally ends
    the stream (``infinite_batches``'s producer never returns).
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
    stop = threading.Event()
    done = object()

    def emit(batch) -> None:
        while not stop.is_set():
            try:
                q.put(batch, timeout=0.5)
                return
            except queue.Full:
                continue
        raise _ConsumerGone

    def runner():
        try:
            produce(emit)
            emit(done)
        except _ConsumerGone:
            pass
        except BaseException as e:
            try:
                emit(_ProducerError(e))
            except _ConsumerGone:
                pass

    thread = threading.Thread(target=runner, daemon=True,
                              name="batch_producer")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is done:
                break
            if isinstance(item, _ProducerError):
                raise item.error
            yield item
    finally:
        stop.set()
        while True:  # drain so the producer can exit a blocking put
            try:
                q.get_nowait()
            except queue.Empty:
                break


class DataLoader:
    """Epoch-based loader over a Dataset with collate_fn."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 seed: int = 0, prefetch: int = 2,
                 device_put_fn: Optional[Callable] = None,
                 background: bool = True,
                 length_group_batches: int = 0,
                 num_shards: Optional[int] = None,
                 shard_index: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        # Multi-host sharding (the reference's DistributedSampler,
        # train.py:78-93): every host computes the SAME global (seed,
        # epoch)-pure batch order, then loads only its contiguous slice of
        # each global batch — parallel.mesh.shard_batch reassembles the
        # global array from the per-process pieces.  Defaults follow
        # jax.process_count()/process_index(); pass explicitly for tests.
        if num_shards is None:
            if shard_index is not None:
                raise ValueError("shard_index was given without num_shards; "
                                 "pass both (silently defaulting num_shards "
                                 "would discard the requested shard)")
            import jax

            num_shards = jax.process_count()
            shard_index = jax.process_index()
        if batch_size % num_shards:
            raise ValueError(f"batch_size {batch_size} must divide across "
                             f"{num_shards} host shards")
        if num_shards > 1 and not drop_last:
            raise ValueError("multi-host loading requires drop_last=True "
                             "(a ragged tail batch cannot split evenly "
                             "across hosts)")
        if shard_index is None:
            if num_shards > 1:
                raise ValueError("num_shards > 1 requires an explicit "
                                 "shard_index (defaulting to 0 would load "
                                 "duplicate data on every host)")
            shard_index = 0
        if not 0 <= shard_index < num_shards:
            raise ValueError(f"shard_index {shard_index} out of range for "
                             f"{num_shards} shards")
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.device_put_fn = device_put_fn
        # Sequence-bucketing companion (DATA.LENGTH_GROUP_BATCHES): shuffle
        # in length-sorted windows of this many batches so collate can trim
        # each batch to a short bucket.  0 = plain uniform shuffle.
        self.length_group_batches = length_group_batches
        self._item_lengths: Optional[np.ndarray] = None
        if length_group_batches and shuffle:
            lengths = getattr(dataset, "caption_max_token_lengths",
                              lambda: None)()
            if lengths is not None:
                self._item_lengths = np.asarray(lengths)
        # background=False loads batches in the calling thread — required on
        # CPU backends, where XLA's in-process collective participants can
        # be starved past their rendezvous timeout by competing host
        # threads (1-core CI hosts); keep True on TPU for overlap.
        self.background = background
        self.epoch = 0
        self._iteration = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def set_iteration(self, iteration: int) -> None:
        self._iteration = iteration
        if hasattr(self.dataset, "set_iteration"):
            self.dataset.set_iteration(iteration)

    def _epoch_order(self) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch]))
        order = rng.permutation(n)
        if self._item_lengths is None:
            return order
        # Length-grouped shuffle: sort each window of G batches by caption
        # length (stable, so the permutation keeps mixing within equal
        # lengths), then shuffle whole batches so short batches don't
        # always lead.  Pure function of (seed, epoch) — resume-exact.
        # With drop_last the ragged tail is excluded from window sorting:
        # sorting it would make the dropped items always the final
        # window's longest captions (a systematic per-epoch bias); left
        # unsorted the drop stays a uniform random sample, like a plain
        # shuffle.
        window = self.batch_size * self.length_group_batches
        n_full = n // self.batch_size
        limit = n_full * self.batch_size if self.drop_last else n
        for start in range(0, limit, window):
            w = order[start:min(start + window, limit)]
            order[start:start + len(w)] = w[np.argsort(
                self._item_lengths[w], kind="stable")]
        full = order[:n_full * self.batch_size].reshape(
            n_full, self.batch_size)
        order[:n_full * self.batch_size] = full[
            rng.permutation(n_full)].reshape(-1)
        return order

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _batches(self, start_batch: int = 0) -> Iterator[np.ndarray]:
        order = self._epoch_order()
        n_full = len(order) // self.batch_size
        end = n_full * self.batch_size if self.drop_last else len(order)
        local = self.batch_size // self.num_shards
        for b in range(start_batch, -(-end // self.batch_size)):
            idxs = order[b * self.batch_size: (b + 1) * self.batch_size]
            if len(idxs) == self.batch_size or not self.drop_last:
                if self.num_shards > 1:
                    idxs = idxs[self.shard_index * local:
                                (self.shard_index + 1) * local]
                yield idxs

    def _load_batch(self, idxs: np.ndarray, pool: ThreadPoolExecutor):
        if getattr(self.dataset, "native_pipeline", False):
            # Batch fast path: the native core parallelizes internally
            # (GIL-free decode threads), no per-item Python map.
            batch = self.dataset.load_batch(idxs)
        else:
            items = list(pool.map(self.dataset.__getitem__, idxs))
            batch = self.dataset.collate_fn(items)
        trim = getattr(self.dataset, "trim_batch", None)
        if trim is not None:
            batch = trim(batch)
        if self.device_put_fn is not None:
            batch = self.device_put_fn(batch)
        return batch

    def __iter__(self):
        if not self.background:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            try:
                for idxs in self._batches():
                    yield self._load_batch(idxs, pool)
            finally:
                pool.shutdown(wait=False)
            return

        def produce(emit):
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            try:
                for idxs in self._batches():
                    emit(self._load_batch(idxs, pool))
            finally:
                pool.shutdown(wait=False)

        yield from _background_batches(produce, self.prefetch)


def infinite_batches(loader: DataLoader,
                     start_iteration: int = 0) -> Iterator[Dict[str, Any]]:
    """Infinite, iteration-exact batch stream.

    Resuming from iteration N replays epoch N // len(loader) from batch
    N % len(loader) — exact mid-epoch resume (upgrade over the reference's
    restart-epoch cycle(), utils/common.py:14-38).

    With ``loader.background`` the stream is produced by a background
    thread into a ``loader.prefetch``-deep queue, so decode/augment for
    batch N+1..N+prefetch overlaps the device step on batch N — the same
    overlap the reference buys with DataLoader worker processes
    (reference: train.py:98-103).  Curriculum state is exact: the producer
    calls ``set_iteration`` for the iteration each batch is FOR, before
    loading it.  ``background=False`` loads in the calling thread (CPU
    meshes: competing host threads starve XLA's in-process collective
    rendezvous; see DataLoader.__init__)."""
    if not loader.background:
        yield from _infinite_batches_sync(loader, start_iteration)
        return

    def produce(emit):
        pool = ThreadPoolExecutor(max_workers=loader.num_workers)
        per_epoch = len(loader)
        iteration = start_iteration
        try:
            while True:
                loader.set_epoch(iteration // per_epoch)
                for idxs in loader._batches(iteration % per_epoch):
                    loader.set_iteration(iteration)
                    emit(loader._load_batch(idxs, pool))
                    iteration += 1
        finally:
            pool.shutdown(wait=False)

    yield from _background_batches(produce, loader.prefetch)


def _infinite_batches_sync(loader: DataLoader,
                           start_iteration: int) -> Iterator[Dict[str, Any]]:
    per_epoch = len(loader)
    iteration = start_iteration
    while True:
        epoch = iteration // per_epoch
        start_batch = iteration % per_epoch
        loader.set_epoch(epoch)
        pool = ThreadPoolExecutor(max_workers=loader.num_workers)
        try:
            for idxs in loader._batches(start_batch):
                loader.set_iteration(iteration)
                yield loader._load_batch(idxs, pool)
                iteration += 1
        finally:
            pool.shutdown(wait=False)
