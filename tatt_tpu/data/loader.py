"""Host-side data loading: shuffle, batch, collate, device prefetch.

The reference uses torch DataLoader with worker processes
(``interfaces/base.py:210-215``).  On this stack the host work (PIL resize,
mask binarization, label encoding) is a pure function per batch; a
background thread pipelines collation with device compute, and
``prefetch_to_device`` overlaps H2D.
"""

from __future__ import annotations

import queue
import threading
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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.collate_kwargs = collate_kwargs or {}
        self.prefetch = prefetch
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

    def __iter__(self) -> Iterator[Batch]:
        idx = self._indices()
        self._epoch += 1
        n_batches = len(self)

        def batches():
            for b in range(n_batches):
                sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                if len(sel) == 0:
                    return
                samples = [self.dataset[int(i)] for i in sel]
                yield collate(samples, **self.collate_kwargs)

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
