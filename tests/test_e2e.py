"""End-to-end smoke: synthetic stacked-frame dataset -> train -> checkpoint ->
reconstruction + transfer + prediction on CPU. Hermetic (no reference data)."""

import copy
import glob
import os

import numpy as np
import pytest

from .test_train import TINY_CONFIG


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """Tiny moving-square videos in the stacked-frame PNG format."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("shapes")
    (root / "train").mkdir()
    (root / "test").mkdir()
    rng = np.random.RandomState(0)
    T, H, W = 4, 16, 16
    for split, n in (("train", 6), ("test", 2)):
        for i in range(n):
            video = np.zeros((T, H, W, 3), np.float32)
            x0, y0 = rng.randint(2, 8, size=2)
            color = rng.rand(3) * 0.7 + 0.3
            for t in range(T):
                x, y = x0 + t, y0 + t
                video[t, y : y + 4, x : x + 4] = color
            stacked = np.concatenate(list(video), axis=1)
            imageio.imsave(
                str(root / split / f"{split}{i:02d}.png"),
                (stacked * 255).astype(np.uint8),
            )
    return str(root)


@pytest.fixture(scope="module")
def e2e_config(synth_dataset):
    config = copy.deepcopy(TINY_CONFIG)
    config["dataset_params"] = {
        "root_dir": synth_dataset,
        "image_shape": [16, 16, 3],
        "augmentation_params": {
            "flip_param": {"time_flip": True, "horizontal_flip": True},
            "crop_param": {"size": [16, 16]},
        },
    }
    config["train_params"].update(num_epochs=2, batch_size=2)
    config["train_params"]["log_params"] = {"log_freq_iter": 2, "cpk_freq_epoch": 1}
    config["reconstruction_params"] = {"num_videos": 1, "format": ".gif"}
    config["transfer_params"] = {
        "num_pairs": 2,
        "format": ".gif",
        "normalization_params": {
            "movement_mult": True,
            "move_location": True,
            "adapt_variance": True,
            "clip_mean": True,
        },
    }
    config["prediction_params"] = {
        "rnn_params": {"num_features": 16, "num_layers": 1, "dropout": 0},
        "predict_variance": True,
        "num_epochs": 2,
        "lr": 0.001,
        "batch_size": 4,
        "num_frames": 3,
        "init_frames": 1,
        "train_size": 4,
        "format": ".gif",
    }
    config["visualizer_params"] = {"kp_size": 2, "draw_border": True}
    return config


@pytest.fixture(scope="module")
def trained(e2e_config, synth_dataset, tmp_path_factory):
    from monkeynet_tpu.data.dataset import FramesDataset
    from monkeynet_tpu.tasks.train_loop import train

    log_dir = str(tmp_path_factory.mktemp("log"))
    dataset = FramesDataset(is_train=True, **e2e_config["dataset_params"])
    train(e2e_config, log_dir, dataset, checkpoint=None, num_devices=1)
    cpks = sorted(glob.glob(os.path.join(log_dir, "*-checkpoint.msgpack")))
    assert cpks, "no checkpoint written"
    assert os.path.exists(os.path.join(log_dir, "log.txt"))
    assert glob.glob(os.path.join(log_dir, "train-vis", "*.gif"))
    return log_dir, cpks[-1]


def test_train_writes_logs_and_checkpoints(trained):
    log_dir, cpk = trained
    with open(os.path.join(log_dir, "log.txt")) as f:
        lines = f.read().strip().splitlines()
    assert lines and "gen_gan" in lines[0] and "disc_gan" in lines[0]


def test_reconstruction_mode(trained, e2e_config):
    from monkeynet_tpu.data.dataset import FramesDataset
    from monkeynet_tpu.tasks.reconstruction import reconstruction

    log_dir, cpk = trained
    dataset = FramesDataset(is_train=False, **e2e_config["dataset_params"])
    metrics = reconstruction(e2e_config, log_dir, dataset, cpk)
    assert np.isfinite(metrics["l1"]) and 0 <= metrics["l1"] < 1
    assert np.isfinite(metrics["akd"]) and metrics["akd"] >= 0
    assert np.isfinite(metrics["aed"]) and metrics["aed"] >= 0
    assert glob.glob(os.path.join(log_dir, "reconstruction", "png", "*.png"))
    assert glob.glob(os.path.join(log_dir, "reconstruction", "*.gif"))


def test_transfer_mode(trained, e2e_config):
    from monkeynet_tpu.data.dataset import FramesDataset
    from monkeynet_tpu.tasks.transfer import transfer

    log_dir, cpk = trained
    dataset = FramesDataset(is_train=False, **e2e_config["dataset_params"])
    transfer(e2e_config, log_dir, dataset, cpk)
    assert glob.glob(os.path.join(log_dir, "transfer", "png", "*.png"))
    assert glob.glob(os.path.join(log_dir, "transfer", "*.gif"))


def test_prediction_mode(trained, e2e_config):
    from monkeynet_tpu.tasks.prediction import prediction

    log_dir, cpk = trained
    prediction(e2e_config, log_dir, cpk)
    assert glob.glob(os.path.join(log_dir, "prediction", "png", "*.png"))
    assert glob.glob(os.path.join(log_dir, "prediction", "*.gif"))


def test_cli_reconstruction_num_devices_8(trained, e2e_config, tmp_path_factory):
    """run.py --mode reconstruction --num_devices 8 end-to-end on an 8-device
    virtual CPU mesh with a NON-divisible frame count (4 frames): frames pad
    to a mesh multiple inside the engine and trim after."""
    import re
    import subprocess
    import sys

    import yaml

    log_dir, cpk = trained
    cfg_path = tmp_path_factory.mktemp("cfg") / "e2e.yaml"
    cfg_path.write_text(yaml.safe_dump(e2e_config))
    out_dir = str(tmp_path_factory.mktemp("clilog"))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        env.get("XLA_FLAGS", ""),
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/run.py",
            "--config",
            str(cfg_path),
            "--mode",
            "reconstruction",
            "--checkpoint",
            cpk,
            "--num_devices",
            "8",
            "--platform",
            "cpu",
            "--log_dir",
            out_dir,
        ],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "Reconstruction loss" in proc.stdout
    assert "AKD" in proc.stdout
    # with --checkpoint, outputs land in the checkpoint's directory
    # (reference run.py:39-43 semantics)
    rec_dirs = glob.glob(os.path.join(log_dir, "reconstruction", "png", "*.png"))
    assert rec_dirs, proc.stdout


def test_demo_smoke(trained, e2e_config, synth_dataset, tmp_path_factory):
    """demo.py end-to-end on a trained tiny checkpoint: reads a source image
    + stacked-frame driving video, writes a gif."""
    import sys

    sys.path.insert(0, "/root/repo")
    from demo import run_demo

    log_dir, cpk = trained
    out_dir = tmp_path_factory.mktemp("demo")
    train_dir = os.path.join(synth_dataset, "train")
    driving = os.path.join(train_dir, sorted(os.listdir(train_dir))[0])
    source = os.path.join(train_dir, sorted(os.listdir(train_dir))[1])
    out_file = str(out_dir / "demo.gif")
    run_demo(e2e_config, cpk, driving, source, out_file, image_shape=(16, 16))
    assert os.path.exists(out_file)


def test_demo_fixtures_shipped():
    """The bundled demo pair must exist and decode to the documented shapes
    (reference demo.py:27-28 equivalents)."""
    from monkeynet_tpu.data.io import read_video

    driving = read_video("/root/repo/data/demo/driving.png", (128, 128, 3))
    source = read_video("/root/repo/data/demo/source.png", (128, 128, 3))
    assert driving.shape == (26, 128, 128, 3)
    assert source.shape[1:] == (128, 128, 3)


def test_resume_from_checkpoint(trained, e2e_config, synth_dataset, tmp_path_factory,
                                monkeypatch):
    """Resuming restores epoch/step, continues without error, AND continues
    the data stream: the resumed run consumes the shuffle orders of the
    restored epoch onward, not a replay of epoch 0 (the shuffle and per-item
    augmentation RNG are keyed by seed+epoch — see loader-level
    test_loader_resume_continues_stream for the order equality)."""
    import copy as _copy

    import monkeynet_tpu.tasks.train_loop as tl
    from monkeynet_tpu.data.dataset import FramesDataset

    epochs_drawn = []

    class RecordingLoader(tl.DataLoader):
        def stream(self, num_epochs):
            for ep, batch in super().stream(num_epochs):
                if ep not in epochs_drawn:
                    epochs_drawn.append(ep)
                yield ep, batch

    monkeypatch.setattr(tl, "DataLoader", RecordingLoader)
    log_dir, cpk = trained
    config = _copy.deepcopy(e2e_config)
    config["train_params"]["num_epochs"] = 3  # one more epoch than trained
    dataset = FramesDataset(is_train=True, **config["dataset_params"])
    state = tl.train(config, log_dir, dataset, checkpoint=cpk, num_devices=1)
    assert int(state.step) > 0
    assert epochs_drawn and epochs_drawn[0] > 0, epochs_drawn
    assert epochs_drawn == list(range(epochs_drawn[0], 3))
