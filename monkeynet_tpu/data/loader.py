"""Threaded, bounded, double-buffered batch loader.

Replaces the reference's torch DataLoader worker processes (train.py:99) with
a thread pool decoding/augmenting numpy batches ahead of the device: the next
batch is always being prepared while the current step runs, so the TPU never
waits on PNG decode. Augmentation is cv2/PIL/numpy (GIL-released C loops), so
threads scale well enough at these image sizes.

Memory is bounded: at most `prefetch + num_workers - 1` decoded batches exist
at any moment (a semaphore gates workers *before* they claim a task, so the
in-flight set is always the lowest-indexed pending batches — no deadlock, no
unbounded results dict; the extra num_workers-1 lets every worker keep
decoding while `prefetch` finished batches wait). The consumer blocks on a
condition variable, not a poll loop. Every item gets its own seeded RNG, so
augmentation randomness is independent of batch composition and worker
scheduling.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

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


def quantize_feed(batch, keys=("source", "video")):
    """Re-quantize float [0,1] image arrays to uint8 for the device feed
    (4x less host->device traffic; the jitted step rescales on-device).

    Runs inside loader workers (DataLoader postprocess) so the consumer
    thread — whose only job is dispatching device steps — never does
    per-batch numpy passes."""
    out = dict(batch)
    for k in keys:
        if k in out:
            out[k] = (np.clip(out[k], 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return out


def device_prefetch(stream, place, depth: int = 2):
    """Overlap host->device transfer with device compute.

    Wraps a `(epoch, batch)` iterator: a feeder thread pulls batches, calls
    `place(batch)` (typically jax.device_put / sharded placement — an async
    dispatch whose transfer then rides alongside the running step), and
    queues the placed result `depth` ahead of the consumer. The consumer's
    critical path is a queue pop, never an H2D round-trip — the torch
    equivalent is DataLoader pin_memory + non_blocking copies (reference
    train.py:99), which this replaces on the TPU side.

    Exceptions from the stream or from `place` re-raise in the consumer.
    Abandoning the returned generator stops the feeder and closes the
    underlying stream (no leaked threads, bounded in-flight memory).
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    _END = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.25)
                return True
            except queue.Full:
                continue
        return False

    def feeder():
        try:
            try:
                for ep, batch in stream:
                    if not _put((ep, place(batch), None)):
                        return
            finally:
                close = getattr(stream, "close", None)
                if close is not None:
                    close()
        except BaseException as e:  # surface to the consumer
            _put((None, None, e))
            return
        _put(_END)

    thread = threading.Thread(target=feeder, daemon=True)

    def gen():
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                ep, placed, err = item
                if err is not None:
                    raise err
                yield ep, placed
        finally:
            stop.set()

    return gen()


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
        num_shards: int = 1,
        shard_index: int = 0,
        postprocess=None,
    ):
        """batch_size is the LOCAL batch; with num_shards > 1 (multi-host
        data parallelism) every shard walks the same seed-keyed global
        permutation and takes its contiguous slab of each global batch of
        num_shards*batch_size, so the union of the shards' batches is exactly
        the single-process global batch (same seed, same epoch)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self.num_shards = num_shards
        self.shard_index = shard_index
        # Applied to each collated batch INSIDE the worker thread (e.g.
        # quantize_feed): batch-level numpy work belongs with decode/augment,
        # not on the consumer thread that keeps the device queue full.
        self.postprocess = postprocess
        if num_shards > 1 and not drop_last:
            raise ValueError("sharded loading requires drop_last=True")
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        global_bs = self.batch_size * self.num_shards
        return n // global_bs if self.drop_last else -(-n // global_bs)

    def _batch_indices(self, epoch=None):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            ep = self.epoch if epoch is None else epoch
            np.random.default_rng(self.seed + ep).shuffle(order)
        global_bs = self.batch_size * self.num_shards
        stop = (n // global_bs) * global_bs if self.drop_last else n
        for i in range(0, stop, global_bs):
            lo = i + self.shard_index * self.batch_size
            yield order[lo : lo + self.batch_size]

    def _load_batch(self, epoch: int, bi: int, idxs) -> dict:
        items = []
        for pos, j in enumerate(idxs):
            # Per-item RNG: keyed by (seed, epoch, batch, GLOBAL position),
            # so the augmentation stream of one item never depends on its
            # batchmates, on which worker thread decoded it, or on how the
            # global batch is sharded across processes.
            gpos = self.shard_index * self.batch_size + pos
            rng = np.random.default_rng((self.seed, epoch, bi, gpos))
            try:
                items.append(self.dataset.__getitem__(int(j), rng=rng))
            except TypeError:
                items.append(self.dataset[int(j)])
        batch = collate(items)
        if self.postprocess is not None:
            batch = self.postprocess(batch)
        return batch

    def __iter__(self) -> Iterator[dict]:
        """One epoch at self.epoch (then bumps it) — a 1-epoch stream()."""
        return (batch for _, batch in self.stream(1))

    def stream(self, num_epochs: int) -> Iterator[tuple]:
        """Yield (epoch, batch) across `num_epochs` epochs starting at
        self.epoch, with ONE persistent worker pool.

        Workers prefetch straight across epoch boundaries — on recipes with
        few steps per epoch (actions: ONE) a per-epoch pool would pay thread
        startup and a cold pipeline on every epoch, which measured as the
        dominant train-loop overhead once the step itself got fast. Batch
        content is identical to per-epoch iteration: the shuffle is keyed by
        (seed, epoch) and per-item RNG by (seed, epoch, batch, position),
        both independent of pool lifetime."""
        start = self.epoch
        epoch_batches = [
            (ep, list(self._batch_indices(ep)))
            for ep in range(start, start + num_epochs)
        ]
        self.epoch = start + num_epochs
        total = sum(len(b) for _, b in epoch_batches)
        if total == 0:
            return iter(())

        task_q: "queue.Queue" = queue.Queue()
        for ep, batches in epoch_batches:
            for bi, idxs in enumerate(batches):
                task_q.put((ep, bi, idxs))

        results: dict = {}
        cond = threading.Condition()
        stop_flag = threading.Event()
        # Workers acquire a slot BEFORE claiming a task: the slot holders are
        # therefore exactly the lowest-indexed pending batches, so the batch
        # the consumer is waiting on is always among the ones being decoded.
        # Sized so all workers can decode concurrently while `prefetch`
        # finished batches wait; total in-flight memory stays bounded.
        slots = threading.Semaphore(self.prefetch + self.num_workers - 1)

        def worker():
            while not stop_flag.is_set():
                while not slots.acquire(timeout=0.25):
                    if stop_flag.is_set():
                        return
                try:
                    ep, bi, idxs = task_q.get_nowait()
                except queue.Empty:
                    slots.release()
                    return
                try:
                    batch = self._load_batch(ep, bi, idxs)
                except Exception as e:  # surface errors to the consumer
                    batch = e
                with cond:
                    results[(ep, bi)] = batch
                    cond.notify_all()

        num_threads = min(self.num_workers, total)

        def gen():
            # Workers start lazily on first next(): an iterator that is
            # created but never advanced spawns no threads (and therefore
            # leaks none — stop_flag would otherwise never be set).
            for _ in range(num_threads):
                threading.Thread(target=worker, daemon=True).start()
            try:
                for ep, batches in epoch_batches:
                    for bi in range(len(batches)):
                        with cond:
                            while (ep, bi) not in results:
                                cond.wait()
                            batch = results.pop((ep, bi))
                        slots.release()  # consumed: a worker starts the next
                        if isinstance(batch, Exception):
                            raise batch
                        yield ep, batch
            finally:
                stop_flag.set()
                with cond:
                    cond.notify_all()

        return gen()
