"""Generate the synthetic shapes-128 dataset (stacked-frame PNG videos).

A 128x128 analog of the reference's bundled 64x64 `data/shapes` fixture
(single flat-colored shape translating over a black background, stored as a
horizontally-stacked frame strip readable by `read_video` — see reference
frames_dataset.py:14-29 for the stacked-frame convention). Deterministic for
a given --seed, so the committed fixture is reproducible from this script.

Usage:
    python scripts/make_shapes128.py [--out data/shapes128] [--seed 0]
        [--num_train 512] [--num_test 64] [--frames 32] [--size 128]
"""

import argparse
import os

import imageio
import numpy as np

SUPER = 4  # supersampling factor for cheap antialiasing


def _downsample(img, factor):
    h, w, c = img.shape
    return img.reshape(h // factor, factor, w // factor, factor, c).mean((1, 3))


def _patch_grid(canvas, cx, cy, r):
    """Local bounding-box view + its pixel coordinate grids (fast path:
    rasterize only around the shape instead of the full supersampled canvas)."""
    h, w, _ = canvas.shape
    y0, y1 = max(0, int(cy - r) - 1), min(h, int(cy + r) + 2)
    x0, x1 = max(0, int(cx - r) - 1), min(w, int(cx + r) + 2)
    yy, xx = np.mgrid[y0:y1, x0:x1]
    return canvas[y0:y1, x0:x1], yy, xx


def _draw_disk(canvas, cx, cy, r, color):
    patch, yy, xx = _patch_grid(canvas, cx, cy, r)
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r**2
    patch[mask] = color


def _draw_polygon(canvas, verts, color):
    """Fill a convex polygon given (N, 2) xy vertices via half-plane tests."""
    cx, cy = verts.mean(0)
    r = np.max(np.hypot(verts[:, 0] - cx, verts[:, 1] - cy))
    patch, yy, xx = _patch_grid(canvas, cx, cy, r)
    mask = np.ones(patch.shape[:2], dtype=bool)
    n = len(verts)
    for i in range(n):
        x0, y0 = verts[i]
        x1, y1 = verts[(i + 1) % n]
        # inside = left of every edge (vertices are CCW)
        mask &= (x1 - x0) * (yy - y0) - (y1 - y0) * (xx - x0) >= 0
    patch[mask] = color


def _regular_polygon(cx, cy, r, n_sides, angle):
    thetas = angle + np.arange(n_sides) * (2 * np.pi / n_sides)
    return np.stack([cx + r * np.cos(thetas), cy + r * np.sin(thetas)], axis=1)


def render_video(rng, size, num_frames):
    """One video: a single shape with bouncing linear motion (+ spin)."""
    shape_kind = rng.choice(["circle", "square", "triangle"])
    color = rng.uniform(70, 255, size=3)
    radius = rng.uniform(0.09, 0.16) * size
    margin = radius + 2
    pos = rng.uniform(margin, size - margin, size=2)  # (x, y)
    speed = rng.uniform(1.5, 3.5) * size / 64.0
    theta = rng.uniform(0, 2 * np.pi)
    vel = speed * np.array([np.cos(theta), np.sin(theta)])
    angle = rng.uniform(0, 2 * np.pi)
    spin = rng.uniform(-0.12, 0.12)

    frames = np.zeros((num_frames, size, size, 3), dtype=np.uint8)
    for t in range(num_frames):
        hi = np.zeros((size * SUPER, size * SUPER, 3), dtype=np.float32)
        cx, cy, r = pos[0] * SUPER, pos[1] * SUPER, radius * SUPER
        if shape_kind == "circle":
            _draw_disk(hi, cx, cy, r, color)
        else:
            n_sides = 4 if shape_kind == "square" else 3
            _draw_polygon(hi, _regular_polygon(cx, cy, r, n_sides, angle), color)
        frames[t] = np.clip(_downsample(hi, SUPER), 0, 255).astype(np.uint8)

        pos += vel
        for axis in range(2):
            if pos[axis] < margin:
                pos[axis] = 2 * margin - pos[axis]
                vel[axis] = -vel[axis]
            elif pos[axis] > size - margin:
                pos[axis] = 2 * (size - margin) - pos[axis]
                vel[axis] = -vel[axis]
        angle += spin
    return frames


def write_stacked(path, frames):
    t, h, w, c = frames.shape
    strip = frames.transpose(1, 0, 2, 3).reshape(h, t * w, c)
    imageio.imwrite(path, strip)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/shapes128")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num_train", type=int, default=512)
    ap.add_argument("--num_test", type=int, default=64)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    for split, count in (("train", args.num_train), ("test", args.num_test)):
        out_dir = os.path.join(args.out, split)
        os.makedirs(out_dir, exist_ok=True)
        for i in range(count):
            frames = render_video(rng, args.size, args.frames)
            write_stacked(os.path.join(out_dir, f"{split}{i:05d}.png"), frames)
        print(f"{split}: {count} videos -> {out_dir}")


if __name__ == "__main__":
    main()
