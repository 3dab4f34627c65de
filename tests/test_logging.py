"""Logger + visualizer behavior: running-mean log lines, lazy metric
materialization, checkpoint-on-exit, grid shapes."""

import glob
import os

import numpy as np

import jax.numpy as jnp

from monkeynet_tpu.utils.logger import Logger
from monkeynet_tpu.utils.visualizer import Visualizer


def test_logger_running_mean_and_lazy_values(tmp_path):
    log_dir = str(tmp_path)
    with Logger(log_dir=log_dir, log_freq_iter=2, cpk_freq_epoch=1) as logger:
        # device arrays are accepted and only materialized at the log boundary
        logger.log_iter(0, ["a", "b"], jnp.asarray([1.0, 2.0]))
        logger.log_iter(1, ["a", "b"], jnp.asarray([3.0, 4.0]))
        logger.log_iter(2, ["a", "b"], jnp.asarray([5.0, 6.0]))
        logger.log_epoch(0, {"state": {"x": np.zeros(3)}, "epoch": 0, "it": 2})

    lines = open(os.path.join(log_dir, "log.txt")).read().strip().splitlines()
    # boundary at it=0 flushes [1,2]; boundary at it=2 flushes mean of 2 rows
    assert lines[0].startswith("00000000)")
    assert "a - 1.00000" in lines[0]
    assert "a - 4.00000" in lines[1]  # mean(3, 5)
    assert "b - 5.00000" in lines[1]  # mean(4, 6)
    assert glob.glob(os.path.join(log_dir, "*-checkpoint.msgpack"))


def test_visualizer_grids():
    vis = Visualizer(kp_size=1, draw_border=True)
    B, D, H, W = 2, 3, 16, 16
    video = np.random.RandomState(0).rand(B, D, H, W, 3).astype(np.float32)
    source = video[:, :1]
    kp = (np.random.RandomState(1).rand(B, D, 4, 2) * 2 - 1).astype(np.float32)

    out = {
        "video_prediction": video,
        "video_deformed": video,
        "kp_driving": {"mean": kp},
        "kp_source": {"mean": kp[:, :1]},
    }
    grid = vis.visualize_reconstruction({"source": source, "video": video}, out)
    # 5 columns x (B*H) rows per frame
    assert grid.shape == (D, B * H, 5 * W, 3)
    assert grid.dtype == np.uint8

    out["kp_norm"] = {"mean": kp}
    grid = vis.visualize_transfer(video, source, out)
    assert grid.shape == (D, B * H, 6 * W, 3)


def test_logger_checkpoint_payload_is_lazy(tmp_path):
    """The epoch payload may be a closure; it must be evaluated ONLY on
    checkpointing epochs and at exit — materializing the full train state
    every epoch is a multi-hundred-MB device fetch that dominated wall-clock
    on 1-step-per-epoch recipes (actions)."""
    from monkeynet_tpu.utils.logger import Logger

    calls = []

    def make_payload(epoch):
        def payload():
            calls.append(epoch)
            return {"state": {"w": np.zeros(2)}, "epoch": epoch, "it": epoch}

        return payload

    log_dir = str(tmp_path / "lazy")
    with Logger(log_dir=log_dir, log_freq_iter=1, cpk_freq_epoch=100) as logger:
        for epoch in range(1, 6):  # 1..5: none hit the freq boundary
            logger.log_epoch(epoch, make_payload(epoch))
        assert calls == []  # nothing materialized mid-training
    assert calls == [5]  # exit checkpoint materialized the last payload once
    assert glob.glob(os.path.join(log_dir, "*-checkpoint.msgpack"))


def test_scheduled_checkpoint_failure_raises(tmp_path):
    """A broken payload must RAISE on a scheduled epoch checkpoint — only the
    exit/emergency save (which can race buffer donation) swallows it."""
    import pytest

    def bad_payload():
        raise RuntimeError("deleted buffer")

    log_dir = str(tmp_path / "sched")
    logger = Logger(log_dir=log_dir, log_freq_iter=1, cpk_freq_epoch=1)
    logger.epoch = 1
    logger.stage_payload(bad_payload)
    with pytest.raises(RuntimeError, match="deleted buffer"):
        logger.save_cpk()
    # The exit path keeps the emergency-save net: no raise.
    logger.save_cpk(is_exit=True)
    logger.log_file.close()


def test_log_chunk_lines_match_per_step_log_iter(tmp_path):
    """log_chunk (scan-of-k) must emit exactly the lines per-step log_iter
    does — same boundary iterations, same running means — including when
    log_freq does not divide the chunk size."""
    rng = np.random.RandomState(0)
    names = ["a", "b"]
    values = rng.rand(23, 2).astype(np.float32)  # 23 steps total

    d1 = tmp_path / "per_step"
    d1.mkdir()
    with Logger(log_dir=str(d1), log_freq_iter=5, cpk_freq_epoch=100) as lg:
        for it in range(23):
            lg.log_iter(it, names, values[it])

    d2 = tmp_path / "chunked"
    d2.mkdir()
    with Logger(log_dir=str(d2), log_freq_iter=5, cpk_freq_epoch=100) as lg:
        it = 0
        for size in (4, 4, 4, 4, 4, 3):  # k=4 chunks + ragged tail
            lg.log_chunk(it, names, values[it : it + size], size)
            it += size

    def lines(p):
        out = []
        for line in open(p):
            head, _, _ = line.rpartition("; steps/s")  # timing differs
            out.append(head)
        return out

    assert lines(d1 / "log.txt") == lines(d2 / "log.txt")


def test_log_chunk_device_values_and_vis(tmp_path):
    """Chunk metrics may be device arrays; vis(j) is called only at
    boundaries with the in-chunk row index."""
    calls = []
    with Logger(log_dir=str(tmp_path), log_freq_iter=4, cpk_freq_epoch=100) as lg:
        vals = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)

        def vis(j):
            calls.append(j)
            return None, None

        lg.visualize_rec = lambda inp, out: None
        lg.log_chunk(0, ["x", "y"], vals[:3], 3, vis=vis)   # boundary it=0
        lg.log_chunk(3, ["x", "y"], vals[3:], 3, vis=vis)   # boundary it=4
    assert calls == [0, 1]  # it=0 -> row 0 of chunk 1; it=4 -> row 1 of chunk 2


def test_log_epoch_range_checkpointing(tmp_path):
    """With prev_epoch set, a cpk_freq epoch skipped over inside a chunk
    still checkpoints (labeled with the newest finished epoch)."""
    with Logger(log_dir=str(tmp_path), log_freq_iter=5, cpk_freq_epoch=10) as lg:
        lg.log_epoch(8, {"state": 1}, prev_epoch=5)   # 6..8: no multiple of 10
        assert not glob.glob(str(tmp_path / "*checkpoint*"))
        lg.log_epoch(12, {"state": 2}, prev_epoch=8)  # 9..12 crosses 10
        assert glob.glob(str(tmp_path / "*checkpoint*"))
        lg.payload = None  # don't re-save on exit


def test_async_writer_runs_jobs_in_order_and_joins():
    """AsyncWriter executes jobs FIFO on one worker; close() drains and
    joins the thread (no leak)."""
    import threading

    from monkeynet_tpu.utils.async_write import AsyncWriter

    before = threading.active_count()
    ran = []
    w = AsyncWriter(maxsize=2)
    for i in range(6):
        w.submit(lambda i=i: ran.append(i))
    w.close()
    assert ran == list(range(6))
    assert threading.active_count() == before  # worker joined
    w.close()  # idempotent


def test_async_writer_propagates_job_failure():
    """A job's exception surfaces on the caller thread (next submit or
    close), never silently."""
    import pytest

    from monkeynet_tpu.utils.async_write import AsyncWriter

    w = AsyncWriter()
    w.submit(lambda: (_ for _ in ()).throw(RuntimeError("disk full")))
    with pytest.raises(RuntimeError, match="disk full"):
        w.flush()
    w.close()


def test_logger_gifs_written_by_context_exit(tmp_path):
    """visualize_rec encodes on a background thread (the encode otherwise
    blocks the dispatch thread at every log boundary); the context manager
    joins it, so every boundary's gif is on disk when train() returns."""
    import threading

    B, D, H, W = 1, 2, 8, 8
    video = np.random.RandomState(0).rand(B, D, H, W, 3).astype(np.float32)
    kp = (np.random.RandomState(1).rand(B, D, 2, 2) * 2 - 1).astype(np.float32)
    inp = {"source": video[:, :1], "video": video}
    out = {
        "video_prediction": video,
        "video_deformed": video,
        "kp_driving": {"mean": kp},
        "kp_source": {"mean": kp[:, :1]},
    }

    before = threading.active_count()
    with Logger(log_dir=str(tmp_path), log_freq_iter=1, cpk_freq_epoch=100) as lg:
        for it in range(3):
            lg.log_iter(it, ["a"], np.asarray([1.0]), inp=inp, out=out)
    gifs = sorted(glob.glob(os.path.join(str(tmp_path), "train-vis", "*.gif")))
    assert [os.path.basename(g) for g in gifs] == [
        "00000000-rec.gif", "00000001-rec.gif", "00000002-rec.gif",
    ]
    assert threading.active_count() == before  # writer thread joined
