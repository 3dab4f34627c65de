"""Threaded, double-buffered batch loader.

Replaces the reference's torch DataLoader worker processes (train.py:99) with
a thread pool decoding/augmenting numpy batches ahead of the device: the next
batch is always being prepared while the current step runs, so the TPU never
waits on PNG decode. Augmentation is cv2/PIL/numpy (GIL-released C loops), so
threads scale well enough at these image sizes; shuffling and per-item RNG are
seeded for reproducibility.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


def collate(items):
    """Stack a list of dict samples into batched numpy arrays."""
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            yield order[i : i + self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        batches = list(self._batch_indices())
        self.epoch += 1
        if not batches:
            return iter(())

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        task_q: "queue.Queue" = queue.Queue()
        for bi, idxs in enumerate(batches):
            task_q.put((bi, idxs))

        results = {}
        results_lock = threading.Lock()
        stop_flag = threading.Event()

        def worker():
            while not stop_flag.is_set():
                try:
                    bi, idxs = task_q.get_nowait()
                except queue.Empty:
                    return
                rng = np.random.default_rng((self.seed, self.epoch, bi))
                try:
                    items = []
                    for j in idxs:
                        try:
                            items.append(self.dataset.__getitem__(int(j), rng=rng))
                        except TypeError:
                            items.append(self.dataset[int(j)])
                    batch = collate(items)
                except Exception as e:  # surface errors to the consumer
                    batch = e
                with results_lock:
                    results[bi] = batch

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        def gen():
            try:
                for bi in range(len(batches)):
                    while True:
                        with results_lock:
                            if bi in results:
                                batch = results.pop(bi)
                                break
                        threading.Event().wait(0.002)
                    if isinstance(batch, Exception):
                        raise batch
                    yield batch
            finally:
                stop_flag.set()

        return gen()
