"""Device-feed parity: on-device augmentation plans must reproduce the host
pipeline — exactly for the integer-gather ops (select / flip / resize /
crop), and within float tolerance for rotation (bilinear vs cv2 fixed-point)
and color jitter (HSV math). Plus: plan_stream mirrors DataLoader batches,
and the device-fed train loop matches the host-fed one.
"""

import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monkeynet_tpu.data.augmentation import AllAugmentationTransform
from monkeynet_tpu.data.device_feed import (
    build_video_cache,
    collate_plans,
    make_device_augment,
    plan_stream,
)

from .test_train import TINY_CONFIG

H = W = 32
N, T = 4, 10


@pytest.fixture(scope="module")
def videos():
    rng = np.random.default_rng(7)
    return (rng.random((N, T, H, W, 3)) * 255).astype(np.uint8)


def _compare(videos, aug_params, tol):
    tr = AllAugmentationTransform(**aug_params)
    assert tr.supports_device_feed(H, W)
    aug = jax.jit(make_device_augment(tr, (H, W, 3)))
    worst = 0.0
    for b in range(12):
        j = b % N
        host = tr(videos[j], rng=np.random.default_rng((0, 0, 0, b)))
        plan = collate_plans(
            [j], [tr.plan(T, H, W, np.random.default_rng((0, 0, 0, b)))]
        )
        dev = aug(jnp.asarray(videos), jax.tree.map(jnp.asarray, plan))
        worst = max(
            worst,
            float(np.abs(np.asarray(dev["source"])[0] - host["source"]).max()),
            float(np.abs(np.asarray(dev["video"])[0] - host["video"]).max()),
        )
    assert worst <= tol, worst


@pytest.mark.parametrize(
    "aug_params,tol",
    [
        ({}, 1.2e-7),  # gather is exact; XLA's /255 differs by 1 ulp
        ({"flip_param": {"time_flip": True, "horizontal_flip": True}}, 1.2e-7),
        (
            {
                "resize_param": {"ratio": (0.9, 1.1)},
                "crop_param": {"size": (H, W)},
            },
            1.2e-7,  # nearest resize + edge-pad crop: exact gather (+1 ulp /255)
        ),
        ({"rotation_param": {"degrees": (-10, 10)}}, 5e-5),
        (
            {
                "jitter_param": {
                    "hue": 0.5,
                    "brightness": 0.3,
                    "contrast": 0.2,
                    "saturation": 0.4,
                }
            },
            1e-5,
        ),
    ],
    ids=["select", "flip", "resize_crop", "rotation", "jitter"],
)
def test_single_op_parity(videos, aug_params, tol):
    _compare(videos, aug_params, tol)


def test_full_pipeline_parity(videos):
    _compare(
        videos,
        dict(
            flip_param={"time_flip": True, "horizontal_flip": True},
            rotation_param={"degrees": (-10, 10)},
            resize_param={"ratio": (0.9, 1.1)},
            crop_param={"size": (H, W)},
            jitter_param={"hue": 0.5},
        ),
        5e-5,
    )


def test_supports_device_feed_gates():
    strong = AllAugmentationTransform(resize_param={"ratio": (0.5, 0.7)})
    assert not strong.supports_device_feed(H, W)  # prefilter radius > 0
    bilinear = AllAugmentationTransform(
        resize_param={"ratio": (0.9, 1.1), "interpolation": "bilinear"}
    )
    assert not bilinear.supports_device_feed(H, W)
    mild = AllAugmentationTransform(resize_param={"ratio": (0.9, 1.1)})
    assert mild.supports_device_feed(H, W)


def test_plan_stream_matches_loader(tmp_path, videos):
    """plan_stream + device apply reproduces the DataLoader's float batches
    bit-exactly for a gather-only pipeline (same shuffle, same rng keys)."""
    import imageio.v2 as imageio

    from monkeynet_tpu.data.dataset import FramesDataset
    from monkeynet_tpu.data.loader import DataLoader

    root = tmp_path / "ds"
    (root / "train").mkdir(parents=True)
    (root / "test").mkdir()
    for i in range(N):
        strip = videos[i].transpose(1, 0, 2, 3).reshape(H, T * W, 3)
        imageio.imsave(str(root / "train" / f"v{i:02d}.png"), strip)
        if i < 2:
            imageio.imsave(str(root / "test" / f"v{i:02d}.png"), strip)

    params = dict(
        root_dir=str(root),
        image_shape=(H, W, 3),
        augmentation_params={
            "flip_param": {"time_flip": True, "horizontal_flip": True},
            "crop_param": {"size": (H, W)},
        },
        cache_videos=True,
    )
    ds = FramesDataset(is_train=True, **params)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                        num_workers=1, seed=3)
    host_batches = [(ep, b) for ep, b in loader.stream(2)]

    cache, lengths = build_video_cache(ds)
    aug = jax.jit(make_device_augment(ds.transform, (H, W, 3)))
    dev_stream = plan_stream(ds, ds.transform, lengths, 2, 3, 0, 2)
    for (ep_h, host), (ep_d, plan) in zip(host_batches, dev_stream):
        assert ep_h == ep_d
        dev = aug(jnp.asarray(cache), jax.tree.map(jnp.asarray, plan))
        np.testing.assert_allclose(np.asarray(dev["source"]),
                                   host["source"], atol=1.2e-7)
        np.testing.assert_allclose(np.asarray(dev["video"]),
                                   host["video"], atol=1.2e-7)


def test_train_device_feed_matches_host(tmp_path, videos):
    """The device-fed train loop sees the same batches as the host-fed one:
    the first log line's metrics match to float tolerance (the gather-only
    pipeline differs only by XLA's 1-ulp /255), training completes, and the
    visuals/checkpoint machinery works. Final params are NOT compared
    tightly: Adam's rsqrt of ~0 second moments amplifies 1-ulp input
    differences to lr-scale deltas within a few steps (same reason
    test_multi_step_matches_k_single_steps compares params under SGD)."""
    import imageio.v2 as imageio

    from monkeynet_tpu.tasks.train_loop import train

    root = tmp_path / "ds"
    (root / "train").mkdir(parents=True)
    (root / "test").mkdir()
    for i in range(N):
        strip = videos[i].transpose(1, 0, 2, 3).reshape(H, T * W, 3)
        imageio.imsave(str(root / "train" / f"v{i:02d}.png"), strip)
        if i < 2:
            imageio.imsave(str(root / "test" / f"v{i:02d}.png"), strip)

    config = copy.deepcopy(TINY_CONFIG)
    config["dataset_params"] = {
        "root_dir": str(root),
        "image_shape": [H, W, 3],
        "augmentation_params": {
            "flip_param": {"time_flip": True, "horizontal_flip": True},
            "crop_param": {"size": [H, W]},
        },
        "cache_videos": True,
    }
    config["train_params"].update(num_epochs=2, batch_size=2,
                                  steps_per_dispatch=2)
    config["train_params"]["log_params"] = {
        "log_freq_iter": 1, "cpk_freq_epoch": 10,
    }

    from monkeynet_tpu.data.dataset import FramesDataset

    states, first_line = {}, {}
    for mode in ("host", "device"):
        cfg = copy.deepcopy(config)
        cfg["train_params"]["device_feed"] = mode == "device"
        ds = FramesDataset(is_train=True, **cfg["dataset_params"])
        out_dir = tmp_path / f"log_{mode}"
        out_dir.mkdir()
        states[mode] = train(cfg, str(out_dir), ds, seed=0)
        with open(out_dir / "log.txt") as f:
            lines = f.read().strip().splitlines()
        assert len(lines) >= 4  # log_freq 1, 4 steps
        first_line[mode] = [
            float(part.split(" - ")[1])
            for part in lines[0].split(") ")[1].split("; ")
            if "steps/s" not in part
        ]

    # Step 0 consumed (up to 1 ulp of /255) identical batches from identical
    # initial params -> metrics match to float tolerance.
    np.testing.assert_allclose(
        np.asarray(first_line["device"]), np.asarray(first_line["host"]),
        rtol=1e-3, atol=1e-5,
    )
    for leaves in zip(
        jax.tree.leaves(states["host"].params),
        jax.tree.leaves(states["device"].params),
    ):
        for leaf in leaves:
            assert np.all(np.isfinite(np.asarray(leaf)))


def test_sharded_device_feed_matches_single_device(videos):
    """Sharded scan-of-k with on-device augmentation == single-device."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")

    import optax

    from monkeynet_tpu.parallel.mesh import make_sharded_multi_train_step
    from monkeynet_tpu.tasks.build import init_models
    from monkeynet_tpu.tasks.train import (
        create_train_state,
        make_multi_train_step,
    )

    tr = AllAugmentationTransform(
        flip_param={"time_flip": True, "horizontal_flip": True},
        crop_param={"size": (16, 16)},
    )
    videos16 = videos[:, :, :16, :16]
    aug = make_device_augment(tr, (16, 16, 3))

    K, B = 2, 8
    plans = []
    for s in range(K):
        step_plans = [
            tr.plan(T, 16, 16, np.random.default_rng((0, s, 0, g)))
            for g in range(B)
        ]
        plans.append(collate_plans(list(range(B))[:B], step_plans))
    stacked = {
        key: jnp.asarray(np.stack([p[key] for p in plans]))
        for key in plans[0]
    }
    batches = {"videos": jnp.asarray(videos16), "plans": stacked}

    tp = TINY_CONFIG["train_params"]
    optimizer = optax.sgd(1e-3)

    models, params, stats = init_models(
        TINY_CONFIG, jax.random.PRNGKey(0), (16, 16, 3)
    )
    state = create_train_state(params, stats, optimizer)
    single = jax.jit(make_multi_train_step(models, tp, optimizer, augment=aug))
    ref_state, ref_out = single(state, batches)

    models_s, params_s, stats_s = init_models(
        TINY_CONFIG, jax.random.PRNGKey(0), (16, 16, 3), axis_name="data"
    )
    state_s = create_train_state(params_s, stats_s, optimizer)
    sharded = make_sharded_multi_train_step(
        models_s, tp, optimizer, num_devices=8, augment=aug
    )
    new_state, out = sharded(state_s, batches)

    np.testing.assert_allclose(
        np.asarray(out["metrics"]), np.asarray(ref_out["metrics"]),
        rtol=1e-4, atol=1e-5,
    )
    for pa, pb in zip(
        jax.tree.leaves(new_state.params["generator"]),
        jax.tree.leaves(ref_state.params["generator"]),
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-3, atol=1e-5)


# ------------------------------------------------------------- HBM budget


def _write_strip_dataset(root, videos):
    import imageio.v2 as imageio

    (root / "train").mkdir(parents=True)
    (root / "test").mkdir()
    for i in range(len(videos)):
        strip = videos[i].transpose(1, 0, 2, 3).reshape(H, T * W, 3)
        imageio.imsave(str(root / "train" / f"v{i:02d}.png"), strip)
        if i < 2:
            imageio.imsave(str(root / "test" / f"v{i:02d}.png"), strip)


def test_padding_overhead_math():
    from monkeynet_tpu.data.device_feed import padding_overhead

    padded, real = padding_overhead([10, 4, 1], (8, 8, 3))
    frame = 8 * 8 * 3
    assert padded == 3 * 10 * frame
    assert real == 15 * frame


def test_cache_budget_bytes_explicit_and_default():
    from monkeynet_tpu.data.device_feed import cache_budget_bytes

    assert cache_budget_bytes({"device_feed_hbm_gb": 2}) == 2 << 30
    assert cache_budget_bytes({"device_feed_hbm_gb": 0.5}) == 1 << 29

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 16 << 30}

    assert cache_budget_bytes({}, device=FakeDev()) == 8 << 30

    class NoStats:
        def memory_stats(self):
            return None

    assert cache_budget_bytes({}, device=NoStats()) == 8 << 30


def test_build_video_cache_over_budget_raises_early(tmp_path, videos):
    from monkeynet_tpu.data.dataset import FramesDataset
    from monkeynet_tpu.data.device_feed import CacheOverBudget

    root = tmp_path / "ds"
    _write_strip_dataset(root, videos)
    ds = FramesDataset(
        is_train=True, root_dir=str(root), image_shape=(H, W, 3),
        augmentation_params={"crop_param": {"size": (H, W)}},
        cache_videos=True,
    )
    with pytest.raises(CacheOverBudget) as e:
        build_video_cache(ds, budget_bytes=1024)
    assert e.value.budget_bytes == 1024
    assert e.value.estimated_bytes > 1024
    # a generous budget still builds fine
    cache, lengths = build_video_cache(ds, budget_bytes=1 << 30)
    assert cache.shape == (N, T, H, W, 3)


def test_train_falls_back_to_host_feed_over_budget(tmp_path, videos, capsys):
    """device_feed over the HBM budget degrades to the host feed with a
    warning instead of an allocator error, and the run still trains."""
    from monkeynet_tpu.data.dataset import FramesDataset
    from monkeynet_tpu.tasks.train_loop import train

    root = tmp_path / "ds"
    _write_strip_dataset(root, videos)

    config = copy.deepcopy(TINY_CONFIG)
    config["dataset_params"] = {
        "root_dir": str(root),
        "image_shape": [H, W, 3],
        "augmentation_params": {
            "flip_param": {"time_flip": True, "horizontal_flip": True},
            "crop_param": {"size": [H, W]},
        },
        "cache_videos": True,
    }
    config["train_params"].update(
        num_epochs=1, batch_size=2, steps_per_dispatch=2,
        device_feed=True, device_feed_hbm_gb=1e-6,
    )
    config["train_params"]["log_params"] = {
        "log_freq_iter": 1, "cpk_freq_epoch": 10,
    }
    ds = FramesDataset(is_train=True, **config["dataset_params"])
    out_dir = tmp_path / "log_fallback"
    out_dir.mkdir()
    state = train(config, str(out_dir), ds, seed=0)
    captured = capsys.readouterr()
    assert "device_feed disabled" in captured.out
    for leaf in jax.tree.leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
    with open(out_dir / "log.txt") as f:
        assert f.read().strip()
