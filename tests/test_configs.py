"""All shipped dataset configs must load, validate, and build/init models."""

import glob
import os

import pytest

import jax

from monkeynet_tpu.tasks.build import build_models, init_models
from monkeynet_tpu.utils.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))

# 256^2 vox inits are too slow for CPU CI; constructor-only for those.
INIT_SMALL = {"shapes", "actions", "taichi", "nemo", "bair", "shapes-128"}


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: os.path.basename(p))
def test_config_loads_and_builds(path):
    config = load_config(path)
    name = os.path.basename(path).replace(".yaml", "")
    models = build_models(config)
    assert len(models) == 3

    if name in INIT_SMALL:
        image_shape = tuple(config["dataset_params"].get("image_shape", (64, 64, 3)))
        _, params, batch_stats = init_models(
            config, jax.random.PRNGKey(0), image_shape
        )
        assert set(params) == {"generator", "discriminator", "kp_detector"}
        assert params["generator"] and params["kp_detector"]


def test_shapes128_fixture_reproducible():
    """data/shapes128 is regenerable byte-for-byte from scripts/make_shapes128.py."""
    import sys

    import imageio
    import numpy as np

    root = os.path.join(os.path.dirname(__file__), "..")
    fixture = os.path.join(root, "data", "shapes128", "train", "train00000.png")
    if not os.path.exists(fixture):
        pytest.skip("shapes128 fixture not present")
    sys.path.insert(0, os.path.join(root, "scripts"))
    try:
        from make_shapes128 import render_video
    finally:
        sys.path.pop(0)
    rng = np.random.default_rng(0)
    frames = render_video(rng, 128, 32)
    strip = frames.transpose(1, 0, 2, 3).reshape(128, 32 * 128, 3)
    assert np.array_equal(strip, np.asarray(imageio.imread(fixture))[..., :3])


def test_shapes256_fixture_reproducible():
    """data/shapes256 is regenerable byte-for-byte from
    scripts/make_shapes128.py --size 256 (the committed fixture behind
    configs/shapes-256.yaml's flagship-resolution recipe)."""
    import sys

    import imageio
    import numpy as np

    root = os.path.join(os.path.dirname(__file__), "..")
    fixture = os.path.join(root, "data", "shapes256", "train", "train00000.png")
    if not os.path.exists(fixture):
        pytest.skip("shapes256 fixture not present")
    sys.path.insert(0, os.path.join(root, "scripts"))
    try:
        from make_shapes128 import render_video
    finally:
        sys.path.pop(0)
    rng = np.random.default_rng(0)
    frames = render_video(rng, 256, 32)
    strip = frames.transpose(1, 0, 2, 3).reshape(256, 32 * 256, 3)
    assert np.array_equal(strip, np.asarray(imageio.imread(fixture))[..., :3])


def test_all_eight_datasets_covered():
    names = {os.path.basename(p).replace(".yaml", "") for p in ALL_CONFIGS}
    assert {
        "shapes",
        "actions",
        "taichi",
        "nemo",
        "bair",
        "moving-gif",
        "vox",
        "vox-full",
    } <= names


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=os.path.basename)
def test_device_feed_coverage(path):
    """Every config either enables device_feed (and its augmentation
    pipeline passes the exactness gate) or carries an in-file comment saying
    why the host feed is the right path (ARCHITECTURE.md 'Device-resident
    feed')."""
    from monkeynet_tpu.data.augmentation import AllAugmentationTransform
    from monkeynet_tpu.utils.config import load_config

    config = load_config(path)
    dp = config["dataset_params"]
    h, w, _ = dp.get("image_shape", (64, 64, 3))
    tr = AllAugmentationTransform(**dp.get("augmentation_params", {}))
    if config["train_params"].get("device_feed", False):
        assert tr.supports_device_feed(h, w), path
    else:
        with open(path) as f:
            text = f.read()
        assert "device_feed" in text or "device feed" in text, (
            f"{path}: device_feed disabled without a documented reason"
        )
