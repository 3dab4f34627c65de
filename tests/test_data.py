"""Data pipeline tests: video IO round-trip, augmentation shapes/invariants,
loader batching, paired dataset."""

import os

import numpy as np
import pytest

from monkeynet_tpu.data.augmentation import (
    AllAugmentationTransform,
    ColorJitter,
    RandomCrop,
    RandomFlip,
    RandomResize,
    RandomRotation,
    SelectRandomFrames,
    SplitSourceDriving,
    VideoToTensor,
)
from monkeynet_tpu.data.dataset import FramesDataset, PairedDataset
from monkeynet_tpu.data.io import read_video, write_gif, write_stacked_png
from monkeynet_tpu.data.loader import (
    DataLoader,
    collate,
    device_prefetch,
    quantize_feed,
)


def _video(T=5, H=8, W=8, seed=0):
    return np.random.RandomState(seed).rand(T, H, W, 3).astype(np.float32)


def test_stacked_png_roundtrip(tmp_path):
    video = _video()
    path = str(tmp_path / "v.png")
    write_stacked_png(path, video)
    back = read_video(path, image_shape=(8, 8, 3))
    assert back.shape == video.shape
    np.testing.assert_allclose(back, video, atol=1 / 255 + 1e-6)


def test_stacked_png_native_slice_then_resize(tmp_path):
    """A square 128^2-frame file read at 64^2 must slice at the file's own
    frame size and resize — never shear (the demo.py --image_shape path)."""
    video = np.zeros((3, 128, 128, 3), np.float32)
    for t in range(3):  # distinct solid colors per frame survive any resize
        video[t, ..., t] = 1.0
    path = str(tmp_path / "v.png")
    write_stacked_png(path, video)
    back = read_video(path, image_shape=(64, 64, 3))
    assert back.shape == (3, 64, 64, 3)
    for t in range(3):
        expected = np.zeros(3, np.float32)
        expected[t] = 1.0
        np.testing.assert_allclose(
            back[t].reshape(-1, 3),
            np.tile(expected, (64 * 64, 1)),
            atol=1 / 255 + 1e-6,
        )


def test_stacked_png_non_square_frames(tmp_path):
    """Non-square stacked frames use the reference's slice-by-image_shape
    semantics (frames_dataset.py:26-29)."""
    video = _video(T=4, H=12, W=20)
    path = str(tmp_path / "v.png")
    write_stacked_png(path, video)
    back = read_video(path, image_shape=(12, 20, 3))
    assert back.shape == video.shape
    np.testing.assert_allclose(back, video, atol=1 / 255 + 1e-6)
    with pytest.raises(ValueError):
        read_video(path, image_shape=(12, 13, 3))


def test_gif_roundtrip(tmp_path):
    video = (_video() > 0.5).astype(np.float32)  # binary-ish survives palette
    path = str(tmp_path / "v.gif")
    write_gif(path, video)
    back = read_video(path)
    assert back.shape[0] == video.shape[0]
    assert back.shape[1:3] == video.shape[1:3]


def test_select_random_frames():
    rng = np.random.default_rng(0)
    video = _video(T=10)
    out = SelectRandomFrames()(video, rng=rng)
    assert out.shape[0] == 2
    out = SelectRandomFrames(consequent=True, number_of_frames=4)(video, rng=rng)
    assert out.shape[0] == 4


def test_flip_rotation_resize_crop_jitter_shapes():
    rng = np.random.default_rng(0)
    video = _video(T=3, H=12, W=12)
    assert RandomFlip(True, True)(video, rng=rng).shape == video.shape
    assert RandomRotation((-10, 10))(video, rng=rng).shape == video.shape
    out = RandomResize((0.5, 0.5))(video, rng=rng)
    assert out.shape == (3, 6, 6, 3)
    out = RandomCrop((8, 8))(out, rng=rng)  # pads 6->8 then crops
    assert out.shape == (3, 8, 8, 3)
    out = ColorJitter(brightness=0.2, contrast=0.2, saturation=0.2, hue=0.3)(
        video, rng=rng
    )
    assert out.shape == video.shape
    assert out.min() >= 0 and out.max() <= 1


def test_full_pipeline_split():
    rng = np.random.default_rng(0)
    pipeline = AllAugmentationTransform(
        flip_param={"time_flip": True, "horizontal_flip": True},
        crop_param={"size": [8, 8]},
    )
    out = pipeline(_video(T=6), rng=rng)
    assert out["source"].shape == (1, 8, 8, 3)
    assert out["video"].shape == (1, 8, 8, 3)
    assert out["source"].dtype == np.float32


def _make_dataset(tmp_path, n_train=5, n_test=3, T=4):
    for split, n in (("train", n_train), ("test", n_test)):
        os.makedirs(tmp_path / split, exist_ok=True)
        for i in range(n):
            write_stacked_png(
                str(tmp_path / split / f"{i:03d}.png"), _video(T=T, seed=i)
            )
    return str(tmp_path)


def test_frames_dataset_and_loader(tmp_path):
    root = _make_dataset(tmp_path)
    ds = FramesDataset(
        root_dir=root,
        image_shape=(8, 8, 3),
        is_train=True,
        augmentation_params={"flip_param": {"time_flip": True, "horizontal_flip": True}},
    )
    assert len(ds) == 5
    item = ds[0]
    assert item["source"].shape == (1, 8, 8, 3)
    assert "name" in item

    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["source"].shape == (2, 1, 8, 8, 3)
    assert isinstance(batches[0]["name"], list)


def test_paired_dataset_random_and_csv(tmp_path):
    root = _make_dataset(tmp_path)
    ds = FramesDataset(root_dir=root, image_shape=(8, 8, 3), is_train=False)
    pairs = PairedDataset(ds, number_of_pairs=4)
    assert len(pairs) == 4
    item = pairs[0]
    assert "driving_video" in item and "source_video" in item

    # CSV pairs list
    csv = tmp_path / "pairs.csv"
    csv.write_text("source,driving\n000.png,001.png\n001.png,002.png\n")
    ds2 = FramesDataset(
        root_dir=root, image_shape=(8, 8, 3), is_train=False, pairs_list=str(csv)
    )
    pairs2 = PairedDataset(ds2, number_of_pairs=10)
    assert len(pairs2) == 2
    item = pairs2[0]
    assert item["driving_name"] == "001.png"
    assert item["source_name"] == "000.png"


def test_paired_dataset_csv_filters_missing_videos(tmp_path):
    """Pairs whose source or driving video is absent from the dataset are
    dropped (reference frames_dataset.py:112), keeping CSV order."""
    root = _make_dataset(tmp_path)
    csv = tmp_path / "pairs.csv"
    csv.write_text(
        "source,driving\n"
        "000.png,gone.png\n"  # driving missing -> dropped
        "001.png,000.png\n"
        "missing.png,001.png\n"  # source missing -> dropped
        "002.png,001.png\n"
    )
    ds = FramesDataset(
        root_dir=root, image_shape=(8, 8, 3), is_train=False, pairs_list=str(csv)
    )
    pairs = PairedDataset(ds, number_of_pairs=10)
    assert len(pairs) == 2
    assert pairs[0]["source_name"] == "001.png"
    assert pairs[0]["driving_name"] == "000.png"
    assert pairs[1]["source_name"] == "002.png"
    assert pairs[1]["driving_name"] == "001.png"


def test_preprocess_vox_partitions_by_identity_lists(tmp_path):
    """The vox flow writes one stacked image per video part into the
    partition given by the bundled identity lists (reference
    data/preprocess_vox.py)."""
    import imageio.v2 as imageio
    from monkeynet_tpu.data.tools import preprocess_vox

    lists = tmp_path / "lists"
    lists.mkdir()
    (lists / "train_vox1.txt").write_text("Celeb_A\nAbsent_Celeb\n")
    (lists / "test_vox1.txt").write_text("Celeb_B\n")
    raw = tmp_path / "unzipped"
    for celeb, video, part in (
        ("Celeb_A", "vid1", "p1"),
        ("Celeb_A", "vid1", "p2"),
        ("Celeb_B", "vid9", "p1"),
    ):
        d = raw / celeb / "1.6" / video / part
        d.mkdir(parents=True)
        for i in range(4):
            imageio.imsave(
                str(d / f"{i:03d}.png"), np.full((10, 12, 3), i * 30, np.uint8)
            )
    out = tmp_path / "vox"
    preprocess_vox(str(raw), str(out), lists_dir=str(lists), size=8, fmt="png")
    assert sorted(os.listdir(out / "train")) == [
        "Celeb_A-vid1-p1.png",
        "Celeb_A-vid1-p2.png",
    ]
    assert os.listdir(out / "test") == ["Celeb_B-vid9-p1.png"]
    img = imageio.imread(str(out / "train" / "Celeb_A-vid1-p1.png"))
    assert img.shape == (8, 32, 3)  # 4 frames of 8^2 stacked along width


def test_bundled_vox_lists_present():
    """The reference's VoxCeleb identity lists ship with the repo
    (reference data/train_vox1.txt, data/test_vox1.txt)."""
    from monkeynet_tpu.data.tools import _REPO_DATA

    train = os.path.join(_REPO_DATA, "train_vox1.txt")
    test = os.path.join(_REPO_DATA, "test_vox1.txt")
    assert os.path.exists(train) and os.path.exists(test)
    with open(train) as f:
        names = f.read().splitlines()
    assert len(names) == 939 and names[0] == "A.J._Buckley"


def test_loader_deterministic_with_seed(tmp_path):
    root = _make_dataset(tmp_path)
    ds = FramesDataset(
        root_dir=root, image_shape=(8, 8, 3), is_train=True,
        augmentation_params={"flip_param": {"time_flip": True, "horizontal_flip": True}},
    )
    a = next(iter(DataLoader(ds, batch_size=2, seed=7)))
    b = next(iter(DataLoader(ds, batch_size=2, seed=7)))
    np.testing.assert_array_equal(a["video"], b["video"])


def test_loader_bounds_in_flight_batches():
    """A slow consumer must not let workers decode the whole epoch ahead:
    decodes-started can exceed batches-consumed only by the slot bound
    (prefetch + num_workers - 1), plus the one batch mid-yield."""
    import time

    started = []

    class Counting:
        def __len__(self):
            return 16

        def __getitem__(self, idx, rng=None):
            started.append(idx)
            return {"x": np.zeros(4, np.float32)}

    loader = DataLoader(
        Counting(), batch_size=1, shuffle=False, num_workers=2, prefetch=1
    )
    consumed = 0
    for _ in loader:
        consumed += 1
        time.sleep(0.02)  # give workers time to run ahead if unbounded
        assert len(started) <= consumed + 3
    assert consumed == 16


def test_loader_item_rng_independent_of_batch_composition(tmp_path):
    """The same (epoch, batch, position) slot gets the same RNG stream, so
    augmentation randomness doesn't depend on worker scheduling."""
    seen = {}

    class Probe:
        def __len__(self):
            return 8

        def __getitem__(self, idx, rng=None):
            return {"x": rng.random(3).astype(np.float32)}

    for workers in (1, 3):
        loader = DataLoader(
            Probe(), batch_size=2, shuffle=False, num_workers=workers, seed=5
        )
        loader.epoch = 0
        seen[workers] = np.concatenate([b["x"] for b in loader])
    np.testing.assert_array_equal(seen[1], seen[3])


def test_loader_propagates_worker_errors(tmp_path):
    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, idx, rng=None):
            raise RuntimeError("decode exploded")

    loader = DataLoader(Broken(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(iter(loader))


def test_loader_unconsumed_iterator_spawns_no_threads(tmp_path):
    """Creating an iterator without advancing it must not start worker
    threads (they would poll the slot semaphore for the process lifetime)."""
    import threading

    root = _make_dataset(tmp_path)
    ds = FramesDataset(root_dir=root, image_shape=(8, 8, 3), is_train=False)
    loader = DataLoader(ds, batch_size=2, num_workers=4)
    before = threading.active_count()
    it = iter(loader)
    assert threading.active_count() == before  # lazy: nothing spawned yet
    batch = next(it)  # first advance starts the workers and yields normally
    assert batch["video"].shape[0] == 2
    it.close()


def test_loader_sharded_union_equals_global_batch(tmp_path):
    """Multi-host sharding: every shard takes its contiguous slab of the
    seed-keyed global permutation, so the union of the shards' batches is
    exactly the single-process global batch (order included)."""
    root = _make_dataset(tmp_path)
    ds = FramesDataset(root_dir=root, image_shape=(8, 8, 3), is_train=False)
    full = DataLoader(ds, batch_size=4, shuffle=True, seed=3, num_workers=1)
    shards = [
        DataLoader(
            ds, batch_size=2, shuffle=True, seed=3, num_workers=1,
            num_shards=2, shard_index=i,
        )
        for i in range(2)
    ]
    assert len(full) == len(shards[0]) == len(shards[1])
    for bf, b0, b1 in zip(full, shards[0], shards[1]):
        assert bf["name"] == b0["name"] + b1["name"]
        np.testing.assert_array_equal(
            bf["video"], np.concatenate([b0["video"], b1["video"]])
        )


def test_loader_stream_matches_per_epoch_iteration(tmp_path):
    """stream(N) (one persistent worker pool) must yield exactly the batches
    of N sequential per-epoch iterations — same epochs, same order, same
    augmented pixels — and leave loader.epoch where N epochs would."""
    root = _make_dataset(tmp_path)
    aug = {"flip_param": {"time_flip": True, "horizontal_flip": True}}
    ds = FramesDataset(
        root_dir=root, image_shape=(8, 8, 3), is_train=True,
        augmentation_params=aug,
    )
    a = DataLoader(ds, batch_size=2, seed=7)
    per_epoch = []
    for _ in range(3):
        ep = a.epoch
        per_epoch.extend((ep, b) for b in a)
    b = DataLoader(ds, batch_size=2, seed=7)
    streamed = list(b.stream(3))
    assert b.epoch == a.epoch == 3
    assert [e for e, _ in streamed] == [e for e, _ in per_epoch]
    for (_, x), (_, y) in zip(streamed, per_epoch):
        assert x["name"] == y["name"]
        np.testing.assert_array_equal(x["video"], y["video"])


# ---------------------------------------------------------------------------
# Augmentation value parity vs the reference pipeline (reference
# augmentation.py). skimage/torchvision are not installed here, so the
# oracles reimplement the exact algorithms those libraries run: scipy.ndimage
# for skimage.transform (skimage wraps ndi with mode='grid-constant'), and
# PIL ImageEnhance / uint8-HSV for torchvision.transforms.functional's PIL
# backend.
# ---------------------------------------------------------------------------


class _FixedRng:
    """Stub rng: pins the single uniform draw a transform makes."""

    def __init__(self, value):
        self.value = value

    def uniform(self, a, b):
        return self.value

    def permutation(self, n):
        return np.arange(n)


@pytest.mark.parametrize("angle", [-37.3, -10.0, 0.7, 5.5, 23.4])
def test_rotation_matches_reference_bilinear(angle):
    """Our cv2 rotation == the reference's skimage.transform.rotate
    (reference augmentation.py:207): bilinear, keep shape, constant-0 fill,
    center ((w-1)/2, (h-1)/2). Oracle: scipy.ndimage.rotate with
    mode='grid-constant' — the exact ndi call skimage's warp makes. Bound
    1e-5: cv2 interpolates with fixed-point weights (measured max 4e-6 on
    random noise)."""
    from scipy import ndimage as ndi

    from monkeynet_tpu.data.augmentation import RandomRotation

    rng = np.random.RandomState(3)
    clip = rng.rand(2, 27, 41, 3).astype(np.float32)
    ours = RandomRotation((angle, angle))(clip, rng=_FixedRng(angle))
    for t in range(len(clip)):
        ref = ndi.rotate(
            clip[t], angle, axes=(1, 0), reshape=False, order=1,
            mode="grid-constant", cval=0.0,
        )
        np.testing.assert_allclose(ours[t], ref, atol=1e-5)


@pytest.mark.parametrize("scale", [0.9, 0.97, 1.0, 1.06, 1.1])
def test_resize_nearest_matches_reference(scale):
    """Our nearest resize == the reference's skimage resize(order=0,
    anti_aliasing=True, mode='constant') (reference augmentation.py:57-59):
    Gaussian prefilter with sigma=(factor-1)/2 on downscaled axes, then
    ndi.zoom(grid_mode=True) nearest sampling. Exact (pure indexing on the
    same filtered array)."""
    from scipy import ndimage as ndi

    from monkeynet_tpu.data.augmentation import RandomResize

    rng = np.random.RandomState(4)
    h, w = 40, 56
    clip = rng.rand(3, h, w, 3).astype(np.float32)
    ours = RandomResize(ratio=(scale, scale))(clip, rng=_FixedRng(scale))
    nh, nw = int(h * scale), int(w * scale)
    assert ours.shape == (3, nh, nw, 3)
    fy, fx = h / nh, w / nw
    filt = clip
    sy, sx = max(0.0, (fy - 1) / 2), max(0.0, (fx - 1) / 2)
    if sy > 0 or sx > 0:
        filt = ndi.gaussian_filter(
            clip, (0, sy, sx, 0), mode="grid-constant", cval=0.0
        )
    for t in range(3):
        for c in range(3):
            ref = ndi.zoom(
                filt[t, :, :, c], (nh / h, nw / w), order=0,
                mode="grid-constant", cval=0.0, grid_mode=True,
            )
            np.testing.assert_allclose(ours[t, :, :, c], ref, atol=1e-6)


def _pil_jitter_op(img, op, factor):
    """The reference ColorJitter's ndarray path for ONE op (reference
    augmentation.py:262-293): img_as_ubyte -> PIL -> torchvision functional
    (PIL backend, reimplemented: Brightness/Color/Contrast enhancers; hue =
    uint8 HSV channel roll) -> np.array -> img_as_float."""
    from PIL import Image, ImageEnhance

    u8 = np.rint(np.clip(img, 0, 1) * 255).astype(np.uint8)
    pil = Image.fromarray(u8)
    if op == "brightness":
        out = ImageEnhance.Brightness(pil).enhance(factor)
    elif op == "saturation":
        out = ImageEnhance.Color(pil).enhance(factor)
    elif op == "contrast":
        out = ImageEnhance.Contrast(pil).enhance(factor)
    elif op == "hue":
        hch, s, v = pil.convert("HSV").split()
        np_h = np.array(hch, np.uint8)
        with np.errstate(over="ignore"):
            np_h += np.uint8(np.int64(factor * 255) & 0xFF)
        out = Image.merge("HSV", (Image.fromarray(np_h), s, v)).convert("RGB")
    return np.array(out).astype(np.float64) / 255.0


@pytest.mark.parametrize(
    "op,kwargs,factor,mean_tol,max_tol",
    [
        ("brightness", {"brightness": 1.0}, 0.6, 1 / 255, 3 / 255),
        ("brightness", {"brightness": 1.0}, 1.3, 1 / 255, 3 / 255),
        ("saturation", {"saturation": 1.0}, 0.5, 1 / 255, 3 / 255),
        ("saturation", {"saturation": 1.0}, 1.4, 1 / 255, 3 / 255),
        ("contrast", {"contrast": 1.0}, 0.6, 1 / 255, 3 / 255),
        ("contrast", {"contrast": 1.0}, 1.35, 1 / 255, 3 / 255),
        # The reference's hue path rotates a uint8 hue channel (256 levels)
        # through PIL's integer HSV conversion; our float path is its
        # continuous limit. Deltas are the reference's own quantization
        # error (measured: mean <=0.008, max <=0.064 across factors).
        ("hue", {"hue": 0.5}, -0.5, 0.015, 0.1),
        ("hue", {"hue": 0.5}, 0.1, 0.015, 0.1),
        ("hue", {"hue": 0.5}, 0.45, 0.015, 0.1),
    ],
)
def test_color_jitter_matches_reference_op(op, kwargs, factor, mean_tol, max_tol):
    """Each jitter op == the reference's per-frame PIL path (reference
    augmentation.py:262-293) within the uint8 quantization the reference
    itself introduces. Factors pinned via the rng stub; single op => order
    shuffle is a no-op."""
    from monkeynet_tpu.data.augmentation import ColorJitter

    rng = np.random.RandomState(7)
    clip = rng.rand(4, 32, 32, 3).astype(np.float32)
    ours = ColorJitter(**kwargs)(clip, rng=_FixedRng(factor))
    ref = np.stack([_pil_jitter_op(f, op, factor) for f in clip])
    d = np.abs(ours - ref)
    assert d.mean() <= mean_tol, (op, factor, d.mean())
    assert d.max() <= max_tol, (op, factor, d.max())


def test_loader_postprocess_runs_in_workers(tmp_path):
    """postprocess (e.g. quantize_feed) applies to every collated batch on
    the worker thread; the consumer sees only transformed batches."""
    import threading

    consumer = threading.current_thread().name
    seen_threads = []

    def post(batch):
        seen_threads.append(threading.current_thread().name)
        return quantize_feed(batch, keys=("x",))

    class Probe:
        def __len__(self):
            return 4

        def __getitem__(self, idx, rng=None):
            return {"x": np.full((2, 2), 0.5, np.float32)}

    loader = DataLoader(
        Probe(), batch_size=2, shuffle=False, num_workers=2, postprocess=post
    )
    for batch in loader:
        assert batch["x"].dtype == np.uint8
        np.testing.assert_array_equal(batch["x"], 128)
    assert len(seen_threads) == 2
    assert all(t != consumer for t in seen_threads)


def test_quantize_feed_round_trips_8bit_media():
    """uint8 -> float [0,1] -> quantize_feed is the identity on 8-bit
    sources (the feed loses nothing on un-augmented pixels)."""
    raw = np.arange(256, dtype=np.uint8).reshape(16, 16)
    batch = {"source": raw.astype(np.float32) / 255.0, "name": ["a"]}
    out = quantize_feed(batch)
    np.testing.assert_array_equal(out["source"], raw)
    assert out["name"] == ["a"]  # non-feed keys pass through untouched


def test_device_prefetch_order_placement_and_errors():
    """device_prefetch yields (epoch, place(batch)) in stream order, runs
    place() on the feeder thread, and re-raises stream errors."""
    import threading

    consumer = threading.current_thread().name
    placed_on = []

    def stream():
        for i in range(5):
            yield i, {"v": np.full(3, i, np.float32)}

    def place(batch):
        placed_on.append(threading.current_thread().name)
        return batch["v"] * 2

    got = list(device_prefetch(stream(), place, depth=2))
    assert [ep for ep, _ in got] == list(range(5))
    for ep, v in got:
        np.testing.assert_array_equal(v, 2.0 * ep)
    assert all(t != consumer for t in placed_on)

    def broken():
        yield 0, {"v": np.zeros(1)}
        raise RuntimeError("stream exploded")

    it = device_prefetch(broken(), place)
    next(it)
    with pytest.raises(RuntimeError, match="stream exploded"):
        next(it)


def test_device_prefetch_abandonment_stops_feeder_and_closes_stream():
    """Dropping the consumer mid-stream must stop the feeder thread and
    close the wrapped stream (the loader's own cleanup depends on it)."""
    import threading
    import time

    closed = threading.Event()

    def stream():
        try:
            for i in range(1000):
                yield i, i
        finally:
            closed.set()

    before = threading.active_count()
    it = device_prefetch(stream(), lambda b: b, depth=1)
    assert next(it) == (0, 0)
    it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.01)
    assert closed.wait(timeout=5.0)
    assert threading.active_count() == before


def test_loader_resume_continues_stream(tmp_path):
    """Setting loader.epoch to the resume epoch continues the shuffle stream:
    a loader resumed at epoch 2 must draw the same orders as epochs 2+ of an
    uninterrupted run (the reference replays epoch 0 — knowingly fixed)."""
    root = _make_dataset(tmp_path)
    ds = FramesDataset(root_dir=root, image_shape=(8, 8, 3), is_train=False)

    def orders(loader, epochs):
        return [[n for b in loader for n in b["name"]] for _ in range(epochs)]

    uninterrupted = orders(
        DataLoader(ds, batch_size=2, shuffle=True, seed=5, num_workers=1), 3
    )
    resumed = DataLoader(ds, batch_size=2, shuffle=True, seed=5, num_workers=1)
    resumed.epoch = 2  # what train_loop does on resume
    assert orders(resumed, 1) == uninterrupted[2:]
    assert uninterrupted[0] != uninterrupted[1]  # epochs genuinely reshuffle
