"""Training logger: running-mean loss lines, train-vis gifs, checkpoints.

Capability parity with the reference Logger (logger.py:11-88): `log.txt`
lines with a zero-filled iteration counter and named running-mean losses every
`log_freq_iter`, train-vis reconstruction gifs, checkpoint files every
`cpk_freq_epoch` epochs and on exit. Adds per-step wall-clock timing (the
reference had no profiling hooks at all).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np

from monkeynet_tpu.data.io import write_gif
from monkeynet_tpu.utils.async_write import AsyncWriter
from monkeynet_tpu.utils.checkpoint import save_checkpoint
from monkeynet_tpu.utils.visualizer import Visualizer


class Logger:
    def __init__(
        self,
        log_dir: str,
        log_file_name: str = "log.txt",
        log_freq_iter: int = 100,
        cpk_freq_epoch: int = 100,
        zfill_num: int = 8,
        visualizer_params: Optional[dict] = None,
    ):
        self.loss_list: List[np.ndarray] = []
        self.cpk_dir = log_dir
        self.visualizations_dir = os.path.join(log_dir, "train-vis")
        os.makedirs(self.visualizations_dir, exist_ok=True)
        self.log_file = open(os.path.join(log_dir, log_file_name), "a")
        self.log_freq = log_freq_iter
        self.cpk_freq = cpk_freq_epoch
        self.zfill_num = zfill_num
        self.visualizer = Visualizer(**(visualizer_params or {}))
        self.epoch = 0
        self.it = 0
        self.payload = None
        self._t_last = time.time()
        self._steps_since_log = 0
        # Train-vis gifs rasterize+encode on a background thread: the encode
        # is ~0.8 s per boundary on the actions recipe and would otherwise be
        # charged to the dispatch thread's next log window (it is the gap
        # between the device-resident step rate and log.txt's sustained
        # rate). Spawned lazily on the first gif, joined at __exit__ — so
        # gifs are on disk when train returns.
        self._writer = None

    # ---------------------------------------------------------------- scores
    def log_scores(self, loss_names):
        blocks = []
        for entry in self.loss_list:
            if isinstance(entry, tuple):  # (chunk_array, lo, hi) from log_chunk
                arr, lo, hi = entry
                blocks.append(np.asarray(arr)[lo:hi])
            else:
                blocks.append(np.asarray(entry)[None])
        loss_mean = np.concatenate(blocks, axis=0).mean(axis=0)
        elapsed = time.time() - self._t_last
        sps = self._steps_since_log / elapsed if elapsed > 0 else float("nan")
        parts = "; ".join(
            f"{name} - {value:.5f}" for name, value in zip(loss_names, loss_mean)
        )
        line = f"{str(self.it).zfill(self.zfill_num)}) {parts}; steps/s - {sps:.3f}"
        print(line, file=self.log_file)
        self.log_file.flush()
        self.loss_list = []
        self._t_last = time.time()
        self._steps_since_log = 0

    def visualize_rec(self, inp, out):
        path = os.path.join(
            self.visualizations_dir,
            f"{str(self.it).zfill(self.zfill_num)}-rec.gif",
        )

        def job(inp=inp, out=out, path=path):
            write_gif(path, self.visualizer.visualize_reconstruction(inp, out))

        if self._writer is None:
            self._writer = AsyncWriter(name="monkeynet-logger-vis")
        self._writer.submit(job)

    # ----------------------------------------------------------- checkpoints
    def stage_payload(self, payload):
        """Stage the checkpoint payload (dict or zero-arg callable) without
        writing; the next save_cpk / exit checkpoint uses it."""
        self.payload = payload

    def save_cpk(self, is_exit: bool = False):
        if self.payload is None:
            return
        # The payload may be a zero-arg callable (lazy): the train loop passes
        # a closure so the full train state is only materialized device->host
        # on epochs that actually checkpoint — fetching a multi-hundred-MB
        # state every epoch dominates wall-clock on 1-step-per-epoch recipes
        # (actions: 57 videos / batch 32) over the tunneled backend.
        if is_exit:
            try:
                payload = (
                    self.payload() if callable(self.payload) else self.payload
                )
            except Exception as e:  # pragma: no cover - emergency-save path
                # An exit save can race buffer donation (the staged state was
                # handed to an in-flight train step when the exception
                # unwound): losing the emergency checkpoint must not mask
                # the original error. Scheduled epoch checkpoints (is_exit
                # False) get no such net — a persistent serialization failure
                # must raise, not silently disable checkpointing.
                print(
                    f"warning: checkpoint payload unavailable, skipping ({e})"
                )
                return
        else:
            payload = self.payload() if callable(self.payload) else self.payload
        payload = dict(payload)
        payload["epoch"] = self.epoch
        payload["it"] = self.it
        path = os.path.join(
            self.cpk_dir, f"{str(self.epoch).zfill(self.zfill_num)}-checkpoint.msgpack"
        )
        save_checkpoint(path, payload)

    # -------------------------------------------------------------- protocol
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self.payload is not None:
            self.save_cpk(is_exit=True)
        self.log_file.close()
        if self._writer is None:
            return
        if exc_type is not None:
            # Don't mask the loop's exception with a writer failure; still
            # drain so queued gifs land on disk.
            try:
                self._writer.close()
            except Exception as e:
                print(f"warning: train-vis writer failed during unwind ({e})")
        else:
            self._writer.close()

    def log_iter(self, it: int, names, values, inp=None, out=None):
        """`values` may be a device array: it is NOT materialized until the
        next log boundary, so the train loop never blocks on a device->host
        sync between steps (the device pipeline stays full)."""
        self.it = it
        self._steps_since_log += 1
        self.loss_list.append(values)
        if it % self.log_freq == 0:
            self.log_scores(names)
            if inp is not None and out is not None:
                self.visualize_rec(inp, out)

    def log_chunk(self, it0: int, names, values, nsteps: int, vis=None):
        """Per-chunk logging for scan-of-k train steps: `values` is a
        (k, M) per-step metric stack (device array OK — rows materialize only
        at log boundaries), covering iterations it0 .. it0+nsteps-1.

        Produces exactly the lines per-step log_iter would: one line at every
        iteration divisible by log_freq, whose running mean covers precisely
        the rows since the previous line. `vis` is an optional callable
        `vis(j) -> (inp, out)` materializing the visual tensors of the
        chunk's j-th step for the train-vis gif at a boundary.
        """
        end = it0 + nsteps
        cursor = 0
        boundary = -(-it0 // self.log_freq) * self.log_freq  # first >= it0
        while boundary < end:
            j = boundary - it0
            self.loss_list.append((values, cursor, j + 1))
            self._steps_since_log += j + 1 - cursor
            cursor = j + 1
            self.it = boundary
            self.log_scores(names)
            if vis is not None:
                inp, out = vis(j)
                self.visualize_rec(inp, out)
            boundary += self.log_freq
        if cursor < nsteps:
            self.loss_list.append((values, cursor, nsteps))
            self._steps_since_log += nsteps - cursor
        self.it = end - 1

    def log_epoch(self, epoch: int, payload, prev_epoch: Optional[int] = None):
        """payload: checkpoint dict, or a zero-arg callable returning one
        (evaluated only when a checkpoint is actually written).

        With `prev_epoch` set (scan-of-k chunks can finish several epochs in
        one dispatch), a checkpoint is written if ANY epoch in
        (prev_epoch, epoch] hits cpk_freq, so chunking never skips a
        scheduled checkpoint."""
        self.epoch = epoch
        self.payload = payload
        lo = epoch if prev_epoch is None else prev_epoch + 1
        if any(e % self.cpk_freq == 0 for e in range(lo, epoch + 1)):
            self.save_cpk()
