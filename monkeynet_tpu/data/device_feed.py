"""Device-resident training feed: the dataset lives in HBM, augmentation
runs on-TPU, and the host ships only per-item augmentation PLANS.

Why this exists: the reference (and our default host path) augments on the
CPU and ships the augmented pixels to the accelerator every step — the torch
DataLoader's pinned-memory copies (reference train.py:99) make that cheap on
PCIe, but on a single-core host feeding a tunneled TPU the measured H2D path
(~50 ms fixed + ~60 MB/s) and the GIL-bound worker pool cap training at
~2/3 of the chip's step rate (scripts/chunk_probe.py). TPU-first inversion:

  * the uint8 video cache is device_put ONCE (shapes, the largest bundled
    dataset, is 2.5 GB — comfortably HBM-resident),
  * each step's augmentation is expressed as a tiny PLAN on the host —
    the rng draws plus precomputed gather indices (augmentation.plan_*) —
    a few hundred bytes per item instead of ~25 KB of pixels,
  * the plan executes inside the jitted train program: frame gather, flips
    and resize+crop are integer gathers (bit-exact vs the host pipeline),
    rotation is one bilinear grid_sample (the reference's skimage/cv2
    rotation is bilinear too; parity ~1e-6 in f32), color jitter is
    elementwise HSV math. None of it is differentiated (it feeds data), so
    the XLA gathers stay forward-only and cheap.

Randomness parity: plans consume the SAME per-item np.random.Generator
streams, keyed (seed, epoch, batch, global position) exactly like
data/loader.DataLoader, so a device-fed run sees the same frame selections,
flips, angles, crops and jitter draws as the host-fed run — resume and
multi-host sharding semantics carry over unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from monkeynet_tpu.data.augmentation import (
    JITTER_BRIGHT,
    JITTER_CONTRAST,
    JITTER_HUE,
    JITTER_SAT,
)
from monkeynet_tpu.data.io import read_video


class CacheOverBudget(Exception):
    """The padded device cache would exceed the HBM budget.

    Carries (estimated_bytes, budget_bytes); estimated_bytes is a LOWER
    bound when raised mid-decode (N × longest-video-so-far × frame)."""

    def __init__(self, estimated_bytes: int, budget_bytes: int):
        self.estimated_bytes = int(estimated_bytes)
        self.budget_bytes = int(budget_bytes)
        super().__init__(
            f"device-feed cache needs >= {estimated_bytes / 2**30:.2f} GiB "
            f"padded, budget is {budget_bytes / 2**30:.2f} GiB"
        )


def build_video_cache(dataset, budget_bytes: Optional[int] = None):
    """Decode every video of `dataset` once -> (videos, lengths) numpy.

    videos: (N, Tmax, H, W, C) uint8, zero-padded past each video's length
    (plans only ever index real frames). Reuses the dataset's uint8 cache
    when present. With `budget_bytes`, raises CacheOverBudget as soon as the
    running lower bound N × Tmax-so-far × frame_bytes exceeds it — before
    wasting a full decode of a dataset that can never fit.
    """
    h, w, c = dataset.image_shape
    n = len(dataset)
    frame_bytes = h * w * c
    clips = []
    tmax = 0
    for i in range(n):
        cached = dataset._cache.get(i) if dataset.cache_videos else None
        if cached is None:
            path = os.path.join(dataset.root_dir, dataset.images[i])
            video = read_video(path, image_shape=dataset.image_shape)
            cached = (video * 255.0 + 0.5).astype(np.uint8)
            if dataset.cache_videos:
                dataset._cache[i] = cached
        clips.append(cached)
        tmax = max(tmax, len(cached))
        if budget_bytes is not None and n * tmax * frame_bytes > budget_bytes:
            raise CacheOverBudget(n * tmax * frame_bytes, budget_bytes)
    lengths = np.asarray([len(v) for v in clips], np.int32)
    videos = np.zeros((len(clips), tmax, h, w, c), np.uint8)
    for i, v in enumerate(clips):
        videos[i, : len(v)] = v
    return videos, lengths


def cache_budget_bytes(train_params, device=None):
    """HBM byte budget for the device-resident video cache.

    `train_params.device_feed_hbm_gb` pins it explicitly; otherwise it is
    half the device's allocator limit (jax memory_stats) so the cache can
    never crowd out model state + activations, falling back to 8 GB when the
    backend doesn't report a limit (e.g. the CPU mesh used in tests). The
    reference never assumes the dataset fits in device memory — it streams
    from disk (reference frames_dataset.py:14-40) — so an over-budget
    dataset must degrade to the host feed, not die in the allocator.
    """
    explicit = (train_params or {}).get("device_feed_hbm_gb")
    if explicit is not None:
        return int(float(explicit) * (1 << 30))
    limit = None
    if device is None:
        import jax

        device = jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
        limit = stats.get("bytes_limit")
    except Exception:
        limit = None
    if limit:
        return int(limit) // 2
    return 8 << 30


def padding_overhead(lengths, image_shape):
    """(padded_bytes, real_bytes) of the (N, Tmax, H, W, C) uint8 cache.

    Ragged datasets pay Tmax padding multiplicatively; the train loop logs
    the ratio so an eviction decision is explainable.
    """
    h, w, c = image_shape
    lengths = np.asarray(lengths, np.int64)
    n = int(lengths.shape[0])
    tmax = int(lengths.max()) if n else 0
    frame = h * w * c  # uint8: 1 byte/elem
    return n * tmax * frame, int(lengths.sum()) * frame


def collate_plans(video_idx, plans):
    """Stack per-item plan dicts into batched arrays (+ the video indices)."""
    out = {"video_idx": np.asarray(video_idx, np.int32)}
    for key in plans[0]:
        out[key] = np.stack([p[key] for p in plans])
    return out


def plan_stream(
    dataset,
    transform,
    lengths,
    batch_size: int,
    seed: int,
    start_epoch: int,
    num_epochs: int,
    num_shards: int = 1,
    shard_index: int = 0,
    shuffle: bool = True,
):
    """Yield (epoch, plan_batch) mirroring data/loader.DataLoader's shuffle
    and rng keying exactly (same (seed+epoch) permutation, same per-item
    (seed, epoch, batch, global position) generator seeds)."""
    h, w, _ = dataset.image_shape
    n = len(dataset)
    global_bs = batch_size * num_shards
    for ep in range(start_epoch, start_epoch + num_epochs):
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed + ep).shuffle(order)
        stop = (n // global_bs) * global_bs
        for bi, i in enumerate(range(0, stop, global_bs)):
            lo = i + shard_index * batch_size
            idxs = order[lo : lo + batch_size]
            plans = []
            for pos, j in enumerate(idxs):
                gpos = shard_index * batch_size + pos
                rng = np.random.default_rng((seed, ep, bi, gpos))
                plans.append(transform.plan(int(lengths[j]), h, w, rng))
            yield ep, collate_plans(idxs, plans)


# ---------------------------------------------------------------- device ops


def _gray(x):
    """ITU-R 601-2 luma, matching ColorJitter._gray."""
    import jax.numpy as jnp

    return (
        0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
    )


def _shift_hue(x, amount):
    """RGB -> HSV hue rotation -> RGB on [0,1] floats (cv2 float formulas)."""
    import jax.numpy as jnp

    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    hh = jnp.where(
        v == r,
        (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    hue = jnp.where(c > 0, hh * 60.0, 0.0)
    hue = jnp.where(hue < 0, hue + 360.0, hue)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)

    hue = (hue + amount * 360.0) % 360.0

    h6 = jnp.clip(hue / 60.0, 0.0, 6.0) % 6.0
    i = jnp.floor(h6).astype(jnp.int32)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    conds = [i == 0, i == 1, i == 2, i == 3, i == 4]
    rr = jnp.select(conds, [v, q, p, p, t], v)
    gg = jnp.select(conds, [t, v, v, q, p], p)
    bb = jnp.select(conds, [p, p, t, v, v], q)
    return jnp.stack([rr, gg, bb], axis=-1)


def _apply_jitter_slots(x, op_ids, factors):
    """Apply the 4 jitter slots in order; op 0 is the identity. Mirrors
    ColorJitter.__call__: input clipped to [0,1], clip after every op."""
    import jax.numpy as jnp

    x = jnp.clip(x, 0.0, 1.0)
    for s in range(4):
        op = op_ids[s]
        f = factors[s]
        bright = x * f
        sat = _gray(x) * (1.0 - f) + x * f
        hue = _shift_hue(x, f)
        contrast = _gray(x).mean(axis=(1, 2, 3), keepdims=True) * (1.0 - f) + x * f
        y = jnp.where(
            op == JITTER_BRIGHT,
            bright,
            jnp.where(
                op == JITTER_SAT,
                sat,
                jnp.where(
                    op == JITTER_HUE,
                    hue,
                    jnp.where(op == JITTER_CONTRAST, contrast, x),
                ),
            ),
        )
        x = jnp.clip(y, 0.0, 1.0)
    return x


def _rotate_clip(x, angle_deg):
    """Bilinear rotation of (F, H, W, C) by one angle about the pixel center
    ((w-1)/2, (h-1)/2), zeros outside — the reference's
    skimage.transform.rotate(order=1, resize=False) / host cv2.warpAffine
    semantics (data/augmentation.RandomRotation).

    MXU formulation, not a gather: bilinear sampling factorizes into an
    x-lerp followed by a y-lerp, and along every output row the source x
    positions form an arithmetic sequence — so the x-pass is a one-hot-lerp
    contraction R[i,j,xs] applied to every source row, and the y-pass a
    one-hot-lerp weighted reduction W[i,ys,j] across rows. Identical
    arithmetic to lerp-of-lerp bilinear; out-of-range taps get zero weight
    because the iota equality simply never fires (zeros padding for free).
    The per-pixel XLA gather this replaces measured 15x slower at 64^2
    (450 ms vs ~30 ms per 30-step scan chunk, B=32): 3-channel gather rows
    waste the vector lanes, while these contractions ride the MXU.
    """
    import jax.numpy as jnp

    F, H, W, C = x.shape
    dtype = x.dtype
    theta = angle_deg * (jnp.pi / 180.0)  # inverse map: dst -> src
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ii = jnp.arange(H, dtype=dtype)[:, None] - cy  # output rows   (H, 1)
    jj = jnp.arange(W, dtype=dtype)[None, :] - cx  # output cols   (1, W)
    sx = cos * jj - sin * ii + cx  # (H, W) source x per output pixel
    sy = sin * jj + cos * ii + cy  # (H, W) source y per output pixel

    xs = jnp.arange(W, dtype=jnp.int32)
    x0 = jnp.floor(sx)
    fx = (sx - x0).astype(dtype)
    x0 = x0.astype(jnp.int32)[..., None]  # (H, W, 1)
    R = (xs == x0) * (1.0 - fx[..., None]) + (xs == x0 + 1) * fx[..., None]

    ys = jnp.arange(H, dtype=jnp.int32)
    y0 = jnp.floor(sy)
    fy = (sy - y0).astype(dtype)
    y0 = y0.astype(jnp.int32)[:, None, :]  # (H, 1, W)
    Wt = (ys[None, :, None] == y0) * (1.0 - fy[:, None, :]) + (
        ys[None, :, None] == y0 + 1
    ) * fy[:, None, :]

    img = x.transpose(1, 2, 0, 3).reshape(H, W, F * C)
    v = jnp.einsum("ijx,yxc->iyjc", R.astype(dtype), img)  # x-lerp per row
    out = jnp.einsum("iyj,iyjc->ijc", Wt.astype(dtype), v)  # y-lerp
    return out.reshape(H, W, F, C).transpose(2, 0, 1, 3)


def make_device_augment(transform, image_shape):
    """Build the jittable plan executor.

    Returns augment(videos, plan_batch) -> {'source': (B,1,h,w,C),
    'video': (B,F-1,h,w,C)} float32 in [0,1], where plan_batch holds the
    stacked per-item plans of ONE step (collate_plans). The transform's
    static structure (which ops are configured) specializes the traced
    program — absent ops cost nothing.
    """
    import jax
    import jax.numpy as jnp

    has_rotation = transform.rotation is not None
    has_hflip = transform.flip is not None and transform.flip.horizontal_flip
    has_jitter = transform.jitter is not None
    h, w, _ = image_shape

    def one(videos, vid, frame_idx, hflip, angle, rows, cols, ops, factors):
        video = videos[vid]  # (Tmax, H, W, C) uint8
        x = video[frame_idx].astype(jnp.float32) / 255.0  # (F, H, W, C)
        if has_hflip:
            x = jnp.where(hflip > 0, x[:, :, ::-1, :], x)
        if has_rotation:
            x = _rotate_clip(x, angle)
        x = jnp.take(x, rows, axis=1)
        x = jnp.take(x, cols, axis=2)
        if has_jitter:
            x = _apply_jitter_slots(x, ops, factors)
        return x

    v_one = jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0))

    def augment(videos, plan):
        clip = v_one(
            videos,
            plan["video_idx"],
            plan["frame_idx"],
            plan["hflip"],
            plan["angle"],
            plan["rows"],
            plan["cols"],
            plan["jitter_ops"],
            plan["jitter_factors"],
        )
        return {"source": clip[:, :1], "video": clip[:, 1:]}

    return augment
