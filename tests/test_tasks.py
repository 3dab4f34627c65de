"""Task-layer parity + unit tests: losses vs reference, transfer keypoint
normalization vs reference, data tools, sobel gradient."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from monkeynet_tpu.tasks.losses import (
    discriminator_loss,
    generator_loss,
    generator_loss_names,
)
from monkeynet_tpu.tasks.transfer import normalize_kp

from .reference_shim import load_reference

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch reference unavailable")


def _maps(levels=4, B=2, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(B, 3, 1, 8, 8).astype(np.float32) for _ in range(levels)] + [
        rng.randn(B, 1, 1, 2, 2).astype(np.float32)
    ]


@needs_ref
def test_losses_match_reference():
    import torch
    from modules import losses as ref_losses

    weights = {
        "reconstruction": [10, 0, 5, 0, 1][:5],
        "reconstruction_deformed": 3,
        "generator_gan": 1,
        "discriminator_gan": 2,
    }
    gen_maps = _maps(seed=1)
    real_maps = _maps(seed=2)
    deformed = np.random.RandomState(3).randn(2, 3, 1, 8, 8).astype(np.float32)

    t = lambda x: torch.from_numpy(x)
    ref_gen = ref_losses.generator_loss(
        [t(m) for m in gen_maps], [t(m) for m in real_maps], t(deformed), weights
    )
    ref_disc = ref_losses.discriminator_loss(
        [t(m) for m in gen_maps], [t(m) for m in real_maps], weights
    )

    j = lambda x: jnp.asarray(x)
    ours_gen = generator_loss(
        [j(m) for m in gen_maps], [j(m) for m in real_maps], j(deformed), weights
    )
    ours_disc = discriminator_loss(
        [j(m) for m in gen_maps], [j(m) for m in real_maps], weights
    )

    assert len(ours_gen) == len(ref_gen)
    for a, b in zip(ours_gen, ref_gen):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours_disc[0]), ref_disc[0].numpy(), atol=1e-5
    )
    names = generator_loss_names(weights)
    assert names == ref_losses.generator_loss_names(weights)


@needs_ref
@pytest.mark.parametrize(
    "opts",
    [
        dict(move_location=True),
        dict(move_location=True, movement_mult=True),
        dict(move_location=True, clip_mean=True),
        dict(move_location=True, adapt_variance=True),
    ],
)
def test_normalize_kp_matches_reference(opts):
    import torch
    from transfer import normalize_kp as ref_normalize_kp

    rng = np.random.RandomState(4)
    D, K = 6, 5
    kp_video = {
        "mean": (rng.rand(1, D, K, 2).astype(np.float32) * 2 - 1) * 0.9,
    }
    kp_app = {"mean": (rng.rand(1, 1, K, 2).astype(np.float32) * 2 - 1) * 0.7}
    a = rng.randn(1, D, K, 2, 2).astype(np.float32) * 0.05
    kp_video["var"] = np.matmul(a.transpose(0, 1, 2, 4, 3), a) + 0.02 * np.eye(
        2, dtype=np.float32
    )
    b = rng.randn(1, 1, K, 2, 2).astype(np.float32) * 0.05
    kp_app["var"] = np.matmul(b.transpose(0, 1, 2, 4, 3), b) + 0.02 * np.eye(
        2, dtype=np.float32
    )

    ref = ref_normalize_kp(
        {k: torch.from_numpy(v) for k, v in kp_video.items()},
        {k: torch.from_numpy(v) for k, v in kp_app.items()},
        **opts,
    )
    ours = normalize_kp(kp_video, kp_app, **opts)

    np.testing.assert_allclose(ours["mean"], ref["mean"].numpy(), atol=1e-5)
    np.testing.assert_allclose(ours["var"], ref["var"].numpy(), atol=1e-4)


def test_split_and_preprocess_tools(tmp_path):
    from monkeynet_tpu.data.tools import preprocess_frames_dir, split_train_test
    import imageio.v2 as imageio

    # preprocess: two videos of raw frames -> stacked images
    raw = tmp_path / "raw"
    for v in ("a", "b"):
        (raw / v).mkdir(parents=True)
        for i in range(3):
            imageio.imsave(
                str(raw / v / f"{i}.png"),
                np.full((10, 12, 3), i * 40, np.uint8),
            )
    out = tmp_path / "out"
    preprocess_frames_dir(str(raw), str(out), size=8, fmt="png")
    img = imageio.imread(str(out / "a.png"))
    assert img.shape == (8, 24, 3)

    # split: flat dir -> train/test
    flat = tmp_path / "flat"
    flat.mkdir()
    for i in range(10):
        (flat / f"{i}.png").write_bytes(b"x")
    split_train_test(str(flat), test_size=0.2)
    assert len(os.listdir(flat / "train")) == 8
    assert len(os.listdir(flat / "test")) == 2


def test_akd_synthetic_known_displacement():
    """A uniform kp shift of (dx, dy) in normalized coords must give exactly
    the corresponding pixel distance on the (H-1, W-1) mapping."""
    from monkeynet_tpu.tasks.metrics import akd, kp_to_pixels

    B, D, K = 1, 3, 4
    rng = np.random.RandomState(0)
    mean_gt = (rng.rand(B, D, K, 2).astype(np.float32) * 2 - 1) * 0.5
    H = W = 65  # (S-1)/2 = 32 px per normalized unit
    dx, dy = 2.0 / (W - 1), 2.0 / (H - 1)  # exactly 1 px in each axis
    mean_pred = mean_gt + np.array([dx, dy], np.float32)
    got = akd({"mean": mean_gt}, {"mean": mean_pred}, (H, W, 3))
    np.testing.assert_allclose(got, np.sqrt(2.0), rtol=1e-5)

    px = kp_to_pixels(np.array([[-1.0, 1.0]]), (H, W, 3))
    np.testing.assert_allclose(px, [[0.0, H - 1]])


def test_aed_synthetic():
    from monkeynet_tpu.tasks.metrics import aed

    emb = np.random.RandomState(1).rand(1, 5, 8).astype(np.float32)
    assert aed(emb, emb) == 0.0
    shifted = emb + np.float32(3.0) / np.sqrt(np.float32(8.0))
    np.testing.assert_allclose(aed(emb, shifted), 3.0, rtol=1e-5)


@needs_ref
def test_sobel_gradient_matches_reference():
    import torch
    from modules.util import compute_image_gradient

    from monkeynet_tpu.ops.grid import sobel_image_gradient

    img = np.random.RandomState(5).rand(2, 3, 9, 11).astype(np.float32)
    ref = compute_image_gradient(torch.from_numpy(img)).numpy()  # (B, 2C, H', W')
    ours = sobel_image_gradient(jnp.asarray(img.transpose(0, 2, 3, 1)))
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_aed_frozen_embedder_is_checkpoint_independent():
    """The default AED embedder has seed-fixed weights: embeddings must not
    depend on the evaluated checkpoint, and two extractors built for the same
    config must agree exactly (cross-run comparability)."""
    import jax

    from monkeynet_tpu.tasks.build import init_models
    from monkeynet_tpu.tasks.metrics import EmbeddingExtractor
    from .test_train import TINY_CONFIG

    config = dict(TINY_CONFIG)
    config["dataset_params"] = {"image_shape": [16, 16, 3]}
    video = np.random.RandomState(0).rand(1, 3, 16, 16, 3).astype(np.float32)

    frozen_a = EmbeddingExtractor(config, gen_vars=None)
    frozen_b = EmbeddingExtractor(config, gen_vars=None)
    np.testing.assert_array_equal(frozen_a(video), frozen_b(video))

    # The appearance variant DOES move with the checkpoint (and is opt-in).
    _, params, stats = init_models(config, jax.random.PRNGKey(1), (16, 16, 3))
    gen_vars = {
        "params": params["generator"], "batch_stats": stats["generator"]
    }
    appearance = EmbeddingExtractor(config, gen_vars, embedder="appearance")
    assert not np.array_equal(frozen_a(video), appearance(video))
    with pytest.raises(ValueError):
        EmbeddingExtractor(config, gen_vars=None, embedder="appearance")
