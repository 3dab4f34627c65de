"""Motion transfer: animate a source identity with a driving video's motion.

Capability parity with the reference driver (transfer.py:31-123): keypoint
normalization (relative movement, convex-hull scale adaptation, mean clipping,
covariance adaptation with eigendecomposition symmetrization), paired dataset
sweep, stacked PNG + comparison-grid gif outputs.

The normalization runs on host numpy — it is a per-video O(K) computation
that would serialize the device (the reference also drops to CPU numpy for
ConvexHull/eig, transfer.py:17-36); the animation itself is frame-batched XLA.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax.numpy as jnp

from monkeynet_tpu.data.dataset import PairedDataset
from monkeynet_tpu.data.io import write_gif, write_stacked_png
from monkeynet_tpu.utils.async_write import AsyncWriter
from monkeynet_tpu.tasks.animate import Animator, KPExtractor, TransferEngine
from monkeynet_tpu.tasks.reconstruction import load_eval_models
from monkeynet_tpu.utils.visualizer import Visualizer


def make_symmetric_psd(mats: np.ndarray) -> np.ndarray:
    """Symmetrize and clamp eigenvalues to > 0 (reference transfer.py:17-28)."""
    sym = (mats + np.swapaxes(mats, -1, -2)) / 2
    d, u = np.linalg.eig(sym)
    d = np.where(d <= 0, 1e-6, d)
    d_matrix = np.zeros_like(mats)
    d_matrix[..., 0, 0] = d[..., 0]
    d_matrix[..., 1, 1] = d[..., 1]
    return (u @ d_matrix @ np.swapaxes(u, -1, -2)).astype(mats.dtype)


def normalize_kp(
    kp_video: Dict[str, np.ndarray],
    kp_appearance: Dict[str, np.ndarray],
    movement_mult: bool = False,
    move_location: bool = False,
    adapt_variance: bool = False,
    clip_mean: bool = False,
) -> Dict[str, np.ndarray]:
    """Adapt driving keypoints to the source identity (reference
    transfer.py:31-62). All inputs/outputs numpy; kp mean (1, D, K, 2)."""
    if movement_mult:
        from scipy.spatial import ConvexHull

        appearance_area = ConvexHull(kp_appearance["mean"][0, 0]).volume
        video_area = ConvexHull(kp_video["mean"][0, 0]).volume
        mult = np.sqrt(appearance_area) / np.sqrt(video_area)
    else:
        mult = 1.0

    kp_video = {k: np.array(v) for k, v in kp_video.items()}

    if move_location:
        diff = (kp_video["mean"] - kp_video["mean"][:, 0:1]) * mult
        kp_video["mean"] = diff + kp_appearance["mean"]

    if clip_mean:
        kp_video["mean"] = np.clip(kp_video["mean"], -1.0, 1.0)

    if "var" in kp_video and adapt_variance:
        # var_t <- var_t * var_0^{-1} * var_appearance, then re-symmetrized PSD
        inv_first = np.linalg.inv(kp_video["var"][:, 0:1])
        var = kp_video["var"] @ inv_first @ kp_appearance["var"]
        kp_video["var"] = make_symmetric_psd(var)

    return kp_video


def transfer_one(animate, extract_kp, source_image, driving_video, transfer_params):
    """source_image (1,1,H,W,C), driving_video (1,D,H,W,C) numpy."""
    kp_driving = extract_kp(driving_video)
    kp_source = extract_kp(source_image)
    kp_norm = normalize_kp(
        kp_driving, kp_source, **transfer_params["normalization_params"]
    )
    out = animate(
        jnp.asarray(source_image),
        {k: jnp.asarray(v) for k, v in kp_norm.items()},
        {k: jnp.asarray(v) for k, v in kp_source.items()},
    )
    out["kp_driving"] = kp_driving
    out["kp_source"] = kp_source
    out["kp_norm"] = kp_norm
    return out


def transfer(config, log_dir, dataset, checkpoint, num_devices: int = 1):
    if checkpoint is None:
        raise ValueError("checkpoint is required for transfer mode")
    log_dir = os.path.join(log_dir, "transfer")
    png_dir = os.path.join(log_dir, "png")
    os.makedirs(png_dir, exist_ok=True)

    transfer_params = config["transfer_params"]
    pairs = PairedDataset(dataset, transfer_params["num_pairs"])

    image_shape = tuple(config["dataset_params"].get("image_shape", (64, 64, 3)))
    models, gen_vars, kp_vars = load_eval_models(config, checkpoint, image_shape)
    mesh = None
    if num_devices > 1:
        # Frame-axis sharding over a data mesh — the DataParallel-eval
        # equivalent (reference transfer.py:101-102); frames are padded to a
        # mesh multiple inside the engines and trimmed after.
        from monkeynet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(num_devices)
    visualizer = Visualizer(**(config.get("visualizer_params") or {}))
    fmt = transfer_params.get("format", ".gif")

    # Fast path: when the normalization recipe is pure tensor math
    # (move_location / clip_mean), the whole pipeline runs as one fused
    # program per chunk. Convex-hull / eigendecomposition recipes need host
    # numpy between kp detection and generation.
    norm = dict(transfer_params["normalization_params"])
    device_norm_ok = not norm.get("movement_mult", False) and not norm.get(
        "adapt_variance", False
    )
    if device_norm_ok:
        engine = TransferEngine(
            models["generator"],
            models["kp_detector"],
            gen_vars,
            kp_vars,
            move_location=norm.get("move_location", False),
            clip_mean=norm.get("clip_mean", False),
            mesh=mesh,
        )
    else:
        animate = Animator(models["generator"], gen_vars, mesh=mesh)
        extract_kp = KPExtractor(models["kp_detector"], kp_vars, mesh=mesh)

    # Encode artifacts on a background writer so gif/png encoding overlaps
    # the next pair's device compute (see tasks/reconstruction.py).
    with AsyncWriter(name="monkeynet-transfer-vis") as writer:
        for it in range(len(pairs)):
            x = pairs[it]
            driving_video = x["driving_video"][None]
            source_image = x["source_video"][None, :1]
            if device_norm_ok:
                out = engine(source_image, driving_video)
                out = {
                    k: np.asarray(v)
                    if not isinstance(v, dict)
                    else {kk: np.asarray(vv) for kk, vv in v.items()}
                    for k, v in out.items()
                }
            else:
                out = transfer_one(
                    animate, extract_kp, source_image, driving_video,
                    transfer_params,
                )
            name = "-".join([x["driving_name"], x["source_name"]])

            def job(name=name, out=out, driving_video=driving_video,
                    source_image=source_image):
                write_stacked_png(
                    os.path.join(png_dir, name + ".png"),
                    out["video_prediction"][0],
                )
                grid = visualizer.visualize_transfer(
                    driving_video, source_image, out
                )
                write_gif(os.path.join(log_dir, name + fmt), grid)

            writer.submit(job)
