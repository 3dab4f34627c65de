"""Reconstruction quality metrics: L1, AKD, AED.

The Monkey-Net paper (arXiv:1812.08861, cited at /root/reference/README.md:3)
evaluates reconstruction with L1, AKD (average keypoint distance) and AED
(average euclidean distance in an identity-embedding space). The reference
repo itself prints only L1 (/root/reference/reconstruction.py:74-77); AKD/AED
were computed with external detectors/embedders that are not distributable
here. This module implements:

- **AKD** with the framework's own keypoint detector as the landmark model:
  keypoints detected on ground-truth frames vs on generated frames, distance
  in pixels. Self-consistent across runs of this framework and the exact
  keypoint geometry the model is trained on.
- **AED** with a FROZEN, seed-fixed embedding network by default: the same
  Encoder architecture with PRNGKey(0) weights, never trained — random
  projections preserve relative distances, and because the embedder never
  changes, AED is comparable across checkpoints and training runs of the
  same config. The trained generator's own appearance encoder remains
  available as an opt-in variant (`embedder="appearance"`,
  config `reconstruction_params.aed_embedder: appearance`) but is
  self-referential: it moves with the model it evaluates, so it is a
  per-run regression signal, not a cross-run quality claim. Both are
  documented proxies for the paper's external identity embedders (FaceNet
  etc.), which cannot be fetched offline.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from monkeynet_tpu.models.blocks import Encoder


def kp_to_pixels(mean: np.ndarray, image_shape) -> np.ndarray:
    """Map kp means from [-1, 1] (xy order, as produced by gaussian2kp) to
    pixel coordinates using the coordinate-grid convention the kp were
    produced under: (kp + 1) / 2 * (size - 1), the exact inverse of
    make_coordinate_grid (ops/grid.py), so a kp sitting on pixel p maps back
    to exactly p. (The reference visualizer's (kp + 1) / 2 * size,
    logger.py:97-106, is off by half a pixel at the edges — fine for drawing
    dots, but AKD uses the exact inverse.)"""
    h, w = image_shape[0], image_shape[1]
    mean = np.asarray(mean)
    out = np.empty_like(mean)
    out[..., 0] = (mean[..., 0] + 1.0) / 2.0 * (w - 1)
    out[..., 1] = (mean[..., 1] + 1.0) / 2.0 * (h - 1)
    return out


def akd(kp_gt: Dict, kp_pred: Dict, image_shape) -> float:
    """Average keypoint distance in pixels: mean over frames and keypoints of
    the euclidean distance between ground-truth-frame and generated-frame
    keypoints."""
    gt = kp_to_pixels(kp_gt["mean"], image_shape)
    pred = kp_to_pixels(kp_pred["mean"], image_shape)
    return float(np.linalg.norm(gt - pred, axis=-1).mean())


class EmbeddingExtractor:
    """Frame embeddings: the deepest Encoder feature map global-average-pooled
    to one vector per frame.

    embedder="frozen" (default): seed-fixed PRNGKey(0) weights, never
    trained — checkpoint-independent, so AED values compare across runs.
    embedder="appearance": the trained generator's appearance encoder
    (requires gen_vars) — self-referential, per-run signal only.
    """

    def __init__(self, config, gen_vars=None, chunk: int = 128,
                 embedder: str = "frozen"):
        gp = config["model_params"]["generator_params"]
        encoder = Encoder(
            gp["block_expansion"],
            num_blocks=gp["num_blocks"],
            max_features=gp["max_features"],
        )
        if embedder == "appearance":
            if gen_vars is None:
                raise ValueError("appearance embedder requires gen_vars")
            variables = {
                "params": gen_vars["params"]["appearance_encoder"],
                "batch_stats": gen_vars["batch_stats"]["appearance_encoder"],
            }
        elif embedder == "frozen":
            H, W, C = tuple(
                config["dataset_params"].get("image_shape", (64, 64, 3))
            )
            dummy = jnp.zeros((1, 1, H, W, C), jnp.float32)
            variables = jax.jit(
                lambda r: encoder.init(r, dummy, False)
            )(jax.random.PRNGKey(0))
        else:
            raise ValueError(f"unknown AED embedder: {embedder!r}")
        self.embedder = embedder
        self.chunk = chunk
        self._run = jax.jit(
            lambda frames: encoder.apply(variables, frames, False)[-1].mean(
                axis=(2, 3)
            )
        )

    def __call__(self, video) -> np.ndarray:
        """video (B, D, H, W, C) -> embeddings (B, D, F)."""
        video = jnp.asarray(video)
        outs = [
            self._run(video[:, s : s + self.chunk])
            for s in range(0, video.shape[1], self.chunk)
        ]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
        return np.asarray(out)


def aed(emb_gt: np.ndarray, emb_pred: np.ndarray) -> float:
    """Average euclidean distance between per-frame embeddings."""
    return float(np.linalg.norm(emb_gt - emb_pred, axis=-1).mean())
