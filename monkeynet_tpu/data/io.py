"""Video decode: stacked-frame images and gif/mp4/mov containers.

Format parity with the reference reader (frames_dataset.py:14-40): a "video"
is either (a) a single PNG/JPG whose width is T x frame-width — frames stacked
horizontally — or (b) a gif/mp4/mov decoded via imageio. Grayscale is expanded
to RGB, alpha dropped, output float32 in [0, 1], shape (T, H, W, C).
"""

from __future__ import annotations

import numpy as np


def _to_float32(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32)


def _ensure_rgb(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    return img


def read_video(name: str, image_shape=(64, 64, 3)) -> np.ndarray:
    """Decode a video file to (T, H, W, 3) float32 in [0, 1].

    Stacked-frame PNG/JPG goes through the native C++ decoder
    (native/monkeynet_io.cpp) when built — libpng/libjpeg straight to float32
    with no Python imaging stack in the training hot path — and falls back to
    imageio otherwise.
    """
    import imageio.v2 as imageio

    lower = name.lower()
    if lower.endswith((".png", ".jpg", ".jpeg")):
        from monkeynet_tpu.data import native

        decoded = native.read_stacked(name, image_shape[0], image_shape[1])
        if decoded is not None:
            return decoded
        image = _ensure_rgb(np.asarray(imageio.imread(name)))
        image = _to_float32(image)
        h, w = image_shape[0], image_shape[1]
        file_h = image.shape[0]
        total_w = image.shape[1]
        if h == w and total_w % file_h == 0:
            # Square request on a square-stacked file: frame boundaries are
            # the file's OWN frame size (width = T x height, reference
            # frames_dataset.py:14-29) — slicing a 128^2-frame file at the
            # requested 64 would shear frames together. Slice natively, then
            # resize when the caller asks for a different size (e.g. demo.py
            # --image_shape on the bundled 128^2 pair).
            native_size = file_h
            num_frames = total_w // native_size
            video = image.reshape(
                native_size, num_frames, native_size, image.shape[-1]
            )
            video = np.ascontiguousarray(np.transpose(video, (1, 0, 2, 3)))
            if native_size != h:
                import cv2

                video = np.stack(
                    [
                        cv2.resize(f, (w, h), interpolation=cv2.INTER_AREA)
                        for f in video
                    ]
                )
            return video
        # Non-square frames (or a file whose width doesn't tile by its
        # height): the reference's slice-by-image_shape semantics
        # (frames_dataset.py:26-29) — frame t = image[:, t*w:(t+1)*w].
        if file_h != h or total_w % w != 0:
            raise ValueError(
                f"stacked-frame image {image.shape[:2]} does not tile into "
                f"{(h, w)} frames ({name})"
            )
        num_frames = total_w // w
        video = image.reshape(h, num_frames, w, image.shape[-1])
        return np.ascontiguousarray(np.transpose(video, (1, 0, 2, 3)))
    elif lower.endswith((".gif", ".mp4", ".mov")):
        frames = imageio.mimread(name, memtest=False)
        video = np.stack([_ensure_rgb(np.asarray(f)) for f in frames])
        return _to_float32(video)
    raise ValueError(f"unknown video extension: {name}")


def write_stacked_png(path: str, video: np.ndarray) -> None:
    """Inverse of the stacked-frame format: (T, H, W, C) float [0,1] -> PNG."""
    import imageio.v2 as imageio

    stacked = np.concatenate(list(video), axis=1)
    imageio.imsave(path, (255 * np.clip(stacked, 0, 1)).astype(np.uint8))


def write_gif(path: str, frames: np.ndarray) -> None:
    """frames: (T, H, W, C) float [0,1] or uint8."""
    import imageio.v2 as imageio

    if frames.dtype != np.uint8:
        frames = (255 * np.clip(frames, 0, 1)).astype(np.uint8)
    imageio.mimsave(path, list(frames))
