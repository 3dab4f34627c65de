"""Core numeric ops: coordinate grids, 2x2 matrix math, sampling, gaussians.

These are the TPU-native replacements for the reference's ATen/cuDNN primitives
(`F.grid_sample`, `F.interpolate`, `F.softmax` soft-argmax, closed-form 2x2
matrix helpers). Pure-jnp reference implementations live here; fused Pallas
kernels live in `monkeynet_tpu.ops.pallas` and are swapped in behind a flag.
"""

from monkeynet_tpu.ops.grid import (
    make_coordinate_grid,
    mat2_det,
    mat2_inverse,
    mat2_smallest_singular,
    mat2_trace,
)
from monkeynet_tpu.ops.sampling import (
    grid_sample,
    resize_bilinear,
    resize_nearest,
    resize_trilinear_video,
)
from monkeynet_tpu.ops.gaussian import gaussian2kp, kp2gaussian

__all__ = [
    "make_coordinate_grid",
    "mat2_inverse",
    "mat2_det",
    "mat2_trace",
    "mat2_smallest_singular",
    "grid_sample",
    "resize_nearest",
    "resize_bilinear",
    "resize_trilinear_video",
    "kp2gaussian",
    "gaussian2kp",
]
