"""Coordinate grids and closed-form 2x2 matrix math.

Behavior parity targets (semantics, not code) in the reference repo:
  - make_coordinate_grid: modules/util.py:26-42 ([-1,1]^2 meshgrid, xy-last order)
  - mat2_inverse / mat2_det / mat2_trace / mat2_smallest_singular:
    modules/util.py:206-255 (closed-form 2x2 helpers; the reference's
    torch.gesv branch is mathematically identical to the closed form for 2x2).

All functions are pure jnp, shape-polymorphic over leading batch dims, and
trace cleanly under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_coordinate_grid(spatial_size, dtype=jnp.float32):
    """Return an (h, w, 2) grid of xy coordinates spanning [-1, 1]^2.

    Last-dim order is (x, y): out[i, j] = (x_j, y_i), matching the keypoint
    coordinate convention used across the framework (x = width axis).
    """
    h, w = spatial_size
    x = 2.0 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1.0
    y = 2.0 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1.0
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)


def _unpack2x2(m):
    a = m[..., 0, 0]
    b = m[..., 0, 1]
    c = m[..., 1, 0]
    d = m[..., 1, 1]
    return a, b, c, d


def mat2_det(m):
    """Determinant of a batch of 2x2 matrices; returns shape m.shape[:-2]."""
    a, b, c, d = _unpack2x2(m)
    return a * d - b * c


def mat2_trace(m):
    """Trace of a batch of 2x2 matrices; returns shape m.shape[:-2]."""
    return m[..., 0, 0] + m[..., 1, 1]


def mat2_inverse(m, eps: float = 0.0):
    """Closed-form inverse of a batch of 2x2 matrices.

    When eps > 0 the determinant is clamped from below by eps (mirrors the
    reference's guarded branch); with eps == 0 this is the exact inverse.
    """
    a, b, c, d = _unpack2x2(m)
    det = a * d - b * c
    if eps:
        det = jnp.maximum(det, jnp.asarray(eps, det.dtype))
    inv_det = 1.0 / det
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]


def sobel_image_gradient(image, padding="VALID"):
    """Sobel x/y gradients of (B, H, W, C) images, channels stacked on the
    channel axis: out (B, H', W', 2C) = [grad_x | grad_y].

    Capability parity with the reference's compute_image_gradient
    (modules/util.py:10-23) in channels-last layout; expressed as one
    depthwise conv so XLA keeps it fused.
    """
    import jax

    B, H, W, C = image.shape
    sobel_x = jnp.array(
        [[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], image.dtype
    )
    sobel_y = sobel_x.T
    # depthwise kernel (3, 3, 1, 2C): each input-channel group -> (gx, gy)
    kernel = jnp.stack([sobel_x, sobel_y], axis=-1)[:, :, None, :]
    kernel = jnp.tile(kernel, (1, 1, 1, C))  # feature_group_count = C
    out = jax.lax.conv_general_dilated(
        image,
        kernel,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    # interleaved (gx_c0, gy_c0, gx_c1, ...) -> [all gx | all gy]
    out = out.reshape(B, out.shape[1], out.shape[2], C, 2)
    return jnp.concatenate([out[..., 0], out[..., 1]], axis=-1)


def mat2_smallest_singular(m):
    """Smallest singular value of a batch of 2x2 matrices, closed form.

    Returns shape m.shape[:-2] + (1,) (keepdim on the last axis, matching how
    the value is broadcast against the (..., 2, 2) covariance it clips).
    """
    a, b, c, d = _unpack2x2(m)
    s1 = a**2 + b**2 + c**2 + d**2
    s2 = jnp.sqrt((a**2 + b**2 - c**2 - d**2) ** 2 + 4.0 * (a * c + b * d) ** 2)
    return jnp.sqrt((s1 - s2) / 2.0)[..., None]
