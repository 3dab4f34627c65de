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
