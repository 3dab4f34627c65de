"""Native C++ decoder: build, correctness vs the imageio path, fallbacks."""

import numpy as np
import pytest

from monkeynet_tpu.data import native
from monkeynet_tpu.data.io import write_stacked_png


@pytest.fixture(scope="module")
def stacked(tmp_path_factory):
    root = tmp_path_factory.mktemp("nio")
    video = np.random.RandomState(0).rand(5, 12, 16, 3).astype(np.float32)
    path = str(root / "v.png")
    write_stacked_png(path, video)
    return path, video


def test_native_decode_matches(stacked):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path, video = stacked
    out = native.read_stacked(path, 12, 16)
    assert out is not None and out.shape == video.shape
    np.testing.assert_allclose(out, video, atol=1 / 255 + 1e-6)


def test_native_rejects_bad_geometry(stacked):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    path, _ = stacked
    assert native.read_stacked(path, 13, 16) is None  # wrong frame height
    assert native.read_stacked(path, 12, 7) is None  # width not divisible


def test_native_rejects_garbage(tmp_path):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    bad = tmp_path / "garbage.png"
    bad.write_bytes(b"not an image at all")
    assert native.read_stacked(str(bad), 8, 8) is None
    assert not native.read_stacked(str(tmp_path / "missing.png"), 8, 8)


def test_read_video_uses_native_or_falls_back(stacked):
    from monkeynet_tpu.data.io import read_video

    path, video = stacked
    out = read_video(path, image_shape=(12, 16, 3))
    np.testing.assert_allclose(out, video, atol=1 / 255 + 1e-6)
