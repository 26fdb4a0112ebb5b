"""Host-side batch pipeline: sampler thread -> device transfer queue.

Replaces the reference's DataLoader workers + pinned memory (reference src/trainer.py:140-148,
SURVEY.md section 2.9): a background thread assembles numpy batches from the episode store and
stages them with ``jax.device_put`` so the accelerator never waits on the host. Frames cross
the PCIe/host boundary as uint8 (4x less traffic than the reference's float32 pipeline).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

from .batch_sampler import BatchSampler
from .dataset import Dataset
from .segment import Batch, DeviceBatch, collate_segments_to_batch


def sample_batch(dataset: Dataset, sampler: BatchSampler) -> Batch:
    return collate_segments_to_batch([dataset[sid] for sid in sampler.sample()])


def sample_device_batch(dataset: Dataset, sampler: BatchSampler) -> DeviceBatch:
    return DeviceBatch.from_batch(sample_batch(dataset, sampler))


class BatchPrefetcher:
    """Infinite iterator of device-resident batches with a lookahead buffer.

    ``device_put`` of the numpy Batch pytree is issued from the producer thread; JAX transfers
    are async, so compute overlaps the next transfer.
    """

    def __init__(self, dataset: Dataset, sampler: BatchSampler, prefetch: int = 4,
                 to_device: bool = True, sharding=None, workers: int = 2) -> None:
        """``workers`` mirrors the reference's ``training.num_workers_data_loaders``
        (reference src/trainer.py:140-148): 0 = synchronous loading on the consumer
        thread (no lookahead), N>0 = that many producer threads."""
        self.dataset = dataset
        self.sampler = sampler
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._to_device = to_device
        self._sharding = sharding
        self._workers = workers
        self._threads: list = []
        self._lock = threading.Lock()  # sampler RNG is not thread-safe

    def _put_device(self, batch: Batch) -> DeviceBatch:
        db = DeviceBatch.from_batch(batch)
        if self._to_device:
            db = jax.tree_util.tree_map(
                lambda v: jax.device_put(v, self._sharding) if self._sharding is not None
                else jax.device_put(v), db)
        return db

    def _worker(self) -> None:
        while not self._stop.is_set():
            try:
                with self._lock:
                    ids = self.sampler.sample()
                from .segment import collate_segments_to_batch

                batch = self._put_device(
                    collate_segments_to_batch([self.dataset[sid] for sid in ids]))
            except Exception as e:  # surface in the consumer
                self._queue.put(e)
                return
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def start(self) -> "BatchPrefetcher":
        if self._workers > 0 and not any(t.is_alive() for t in self._threads):
            self._stop.clear()
            self._threads = [threading.Thread(target=self._worker, daemon=True)
                             for _ in range(self._workers)]
            for t in self._threads:
                t.start()
        return self

    def stop(self) -> None:
        self._stop.set()

    def __iter__(self) -> Iterator[Batch]:
        if self._workers == 0:  # synchronous mode (num_workers_data_loaders=0)
            while True:
                yield self._put_device(sample_batch(self.dataset, self.sampler))
        self.start()
        while True:
            item = self._queue.get()
            if isinstance(item, Exception):
                raise item
            yield item
