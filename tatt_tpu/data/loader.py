"""Host-side data loading: shuffle, batch, collate, device prefetch.

The reference uses torch DataLoader with 8 worker processes
(``interfaces/base.py:210-215``).  On this stack the host work (LMDB read,
image decode, PIL resize, mask binarization, label encoding) is a pure
function per batch; with ``num_workers > 1`` whole batches are built
concurrently on a thread pool (LMDB reads via ctypes, PIL decode/resize,
and numpy collate all release the GIL) and yielded in order, overlapping
host work with device compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from tatt_tpu.data.collate import Batch, collate


class DataLoader:
    """Indexable dataset (``ds[i] -> (hr, lr, label)``) -> Batch iterator."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 1234,
        collate_kwargs: Optional[dict] = None,
        prefetch: int = 2,
        num_workers: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.collate_kwargs = collate_kwargs or {}
        self.prefetch = prefetch
        self.num_workers = num_workers
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def _build(self, sel: np.ndarray, batch_idx: int, epoch: int) -> Batch:
        samples = [self.dataset[int(i)] for i in sel]
        kwargs = self.collate_kwargs
        if "seed" not in kwargs:
            # deterministic collate-side augmentation (syn blur ensemble)
            # regardless of worker scheduling
            kwargs = dict(
                kwargs,
                seed=(self.seed * 1_000_003 + epoch) * 1_000_003 + batch_idx,
            )
        return collate(samples, **kwargs)

    def __iter__(self) -> Iterator[Batch]:
        idx = self._indices()
        if hasattr(self.dataset, "set_epoch"):
            # per-sample augmentation RNGs are keyed on (seed, epoch, index)
            # so multi-worker runs stay deterministic (the reference's torch
            # DataLoader seeds its workers deterministically)
            self.dataset.set_epoch(self._epoch)
        epoch = self._epoch
        self._epoch += 1
        n_batches = len(self)
        selections = [
            (b, idx[b * self.batch_size : (b + 1) * self.batch_size])
            for b in range(n_batches)
        ]
        selections = [(b, s) for b, s in selections if len(s)]

        if self.num_workers > 1 and self.prefetch > 0:
            # batch-granular thread pool: up to num_workers batches are
            # decoded+collated concurrently, yielded in order, with at most
            # num_workers + prefetch batches in flight.  prefetch <= 0
            # (strictly synchronous, no lookahead) falls through to the
            # single-worker path below — a thread pool necessarily keeps
            # batches in flight, which would violate that contract.
            with ThreadPoolExecutor(self.num_workers) as pool:
                inflight: queue.Queue = queue.Queue()
                depth = self.num_workers + self.prefetch
                for b, sel in selections[:depth]:
                    inflight.put(pool.submit(self._build, sel, b, epoch))
                consumed = min(depth, len(selections))
                while not inflight.empty():
                    fut = inflight.get()
                    if consumed < len(selections):
                        nb, nsel = selections[consumed]
                        inflight.put(pool.submit(self._build, nsel, nb, epoch))
                        consumed += 1
                    yield fut.result()
            return

        def batches():
            for b, sel in selections:
                yield self._build(sel, b, epoch)

        if self.prefetch <= 0:
            yield from batches()
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list[BaseException] = []

        def producer():
            try:
                for item in batches():
                    q.put(item)
            except BaseException as exc:  # surface in the consumer
                error.append(exc)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                break
            yield item
