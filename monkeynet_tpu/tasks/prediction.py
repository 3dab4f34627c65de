"""Image-to-video prediction: learn keypoint dynamics, render the future.

Capability parity with the reference driver (prediction.py:35-145), three
phases:
  1. sweep the train set extracting per-frame keypoints (frame-batched here);
  2. train the GRU keypoint predictor on fixed-length windows — inputs zeroed
     after `init_frames`, L1 on every kp field, Adam + reduce-on-plateau;
  3. roll out on the test set and render with the generator.

The GRU consumes the zeroed window in ONE forward (the reference's scheme —
it is not autoregressive), so training and rollout are single compiled
programs over (batch, frames).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp
import optax

from monkeynet_tpu.data.augmentation import VideoToTensor
from monkeynet_tpu.data.dataset import FramesDataset
from monkeynet_tpu.data.io import write_gif, write_stacked_png
from monkeynet_tpu.utils.async_write import AsyncWriter
from monkeynet_tpu.data.loader import DataLoader
from monkeynet_tpu.models.prediction import KeypointPredictor
from monkeynet_tpu.tasks.animate import Animator, KPExtractor
from monkeynet_tpu.tasks.reconstruction import load_eval_models
from monkeynet_tpu.utils.visualizer import Visualizer


class KPSequenceDataset:
    """Consecutive fixed-length keypoint windows from per-video kp arrays
    (reference KPDataset, prediction.py:18-32)."""

    def __init__(self, keypoints: List[Dict[str, np.ndarray]], num_frames: int):
        self.keypoints = keypoints
        self.num_frames = num_frames

    def __len__(self):
        return len(self.keypoints)

    def __getitem__(self, idx, rng=None):
        rng = rng if rng is not None else np.random.default_rng()
        kp = self.keypoints[idx]
        total = kp["mean"].shape[0]
        k = self.num_frames
        first = int(rng.integers(0, max(1, total - k + 1)))
        out = {key: v[first : first + k] for key, v in kp.items()}
        # pad short videos by repeating the last frame
        cur = out["mean"].shape[0]
        if cur < k:
            out = {
                key: np.concatenate([v] + [v[-1:]] * (k - cur), axis=0)
                for key, v in out.items()
            }
        return out


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics: factor 0.1, rel threshold)."""

    def __init__(self, lr: float, patience: int = 50, factor: float = 0.1,
                 threshold: float = 1e-4):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, loss: float) -> float:
        if loss < self.best * (1.0 - self.threshold):
            self.best = loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr


def train_predictor(predictor, kp_windows: KPSequenceDataset, prediction_params,
                    seed: int = 0):
    """Phase 2: fit the GRU on zeroed-suffix windows."""
    num_epochs = prediction_params["num_epochs"]
    bs = prediction_params["batch_size"]
    init_frames = prediction_params["init_frames"]

    sample = kp_windows[0]
    init_batch = {k: jnp.asarray(v[None]) for k, v in sample.items()}
    params = predictor.init(jax.random.PRNGKey(seed), init_batch)["params"]

    tx = optax.chain(optax.scale_by_adam(), optax.scale(-1.0))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, lr, batch):
        def loss_fn(p):
            x = {k: v.at[:, init_frames:].set(0.0) for k, v in batch.items()}
            pred = predictor.apply({"params": p}, x)
            return sum(
                jnp.abs(batch[k][:, init_frames:] - pred[k][:, init_frames:]).mean()
                for k in batch
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        return optax.apply_updates(params, updates), opt_state, loss

    loader = DataLoader(
        kp_windows, batch_size=min(bs, len(kp_windows)), shuffle=False,
        drop_last=False, num_workers=2, seed=seed,
    )
    plateau = ReduceLROnPlateau(prediction_params["lr"])
    lr = plateau.lr
    for epoch in range(num_epochs):
        losses = []
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "name"}
            params, opt_state, loss = step(params, opt_state, lr, batch)
            losses.append(float(loss))
        lr = plateau.step(float(np.mean(losses)))
    return params


def prediction(config, log_dir, checkpoint, num_devices: int = 1):
    if checkpoint is None:
        raise ValueError("checkpoint is required for prediction mode")
    log_dir = os.path.join(log_dir, "prediction")
    png_dir = os.path.join(log_dir, "png")
    os.makedirs(png_dir, exist_ok=True)

    prediction_params = config["prediction_params"]
    num_frames = prediction_params["num_frames"]
    init_frames = prediction_params["init_frames"]
    train_size = prediction_params["train_size"]

    image_shape = tuple(config["dataset_params"].get("image_shape", (64, 64, 3)))
    models, gen_vars, kp_vars = load_eval_models(config, checkpoint, image_shape)
    mesh = None
    if num_devices > 1:
        # DataParallel-eval equivalent (reference prediction.py:46-47).
        from monkeynet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(num_devices)
    animate = Animator(models["generator"], gen_vars, mesh=mesh)
    extract_kp = KPExtractor(models["kp_detector"], kp_vars, mesh=mesh)
    visualizer = Visualizer(**(config.get("visualizer_params") or {}))

    # ---- phase 1: keypoints over the train set
    print("Extracting keypoints...")
    train_set = FramesDataset(
        is_train=True, transform=VideoToTensor(), **config["dataset_params"]
    )
    keypoints = []
    for it in range(len(train_set)):
        if train_size is not None and it > train_size:
            break
        video = train_set[it]["video"][None]
        kp = extract_kp(video)
        keypoints.append({k: v[0] for k, v in kp.items()})

    # ---- phase 2: GRU on kp windows
    print("Training prediction...")
    predictor = KeypointPredictor(
        num_kp=config["model_params"]["common_params"]["num_kp"],
        kp_variance=config["model_params"]["common_params"]["kp_variance"],
        **prediction_params["rnn_params"],
    )
    windows = KPSequenceDataset(keypoints, num_frames=num_frames)
    pred_params = train_predictor(predictor, windows, prediction_params)

    # ---- phase 3: rollout + render on the test set
    print("Make predictions...")
    test_set = FramesDataset(
        is_train=False, transform=VideoToTensor(), **config["dataset_params"]
    )
    fmt = prediction_params.get("format", ".gif")
    # Encode artifacts on a background writer so gif/png encoding overlaps
    # the next video's device compute (see tasks/reconstruction.py).
    with AsyncWriter(name="monkeynet-prediction-vis") as writer:
        for it in range(len(test_set)):
            x = test_set[it]
            video = x["video"][None, :num_frames]
            kp_init = extract_kp(video)
            kp_init = {k: np.array(v) for k, v in kp_init.items()}
            for k in kp_init:
                kp_init[k][:, init_frames:] = 0
            kp_source = {
                k: v[:, :1] for k, v in extract_kp(video[:, :1]).items()
            }

            kp_video = predictor.apply(
                {"params": pred_params},
                {k: jnp.asarray(v) for k, v in kp_init.items()},
            )
            kp_video = {k: np.array(v) for k, v in kp_video.items()}
            for k in kp_video:
                kp_video[k][:, :init_frames] = kp_init[k][:, :init_frames]
            if "var" in kp_video and prediction_params["predict_variance"]:
                kp_video["var"] = np.repeat(
                    kp_init["var"][:, init_frames - 1 : init_frames],
                    kp_video["var"].shape[1],
                    axis=1,
                )

            out = animate(
                jnp.asarray(video[:, :1]),
                {k: jnp.asarray(v) for k, v in kp_video.items()},
                {k: jnp.asarray(v) for k, v in kp_source.items()},
            )
            out = {
                k: np.asarray(v)
                if not isinstance(v, dict)
                else {kk: np.asarray(vv) for kk, vv in v.items()}
                for k, v in out.items()
            }
            out["kp_driving"] = kp_video
            out["kp_source"] = kp_source

            def job(name=x["name"], video=video, out=out):
                write_stacked_png(
                    os.path.join(png_dir, name + ".png"),
                    out["video_prediction"][0],
                )
                grid = visualizer.visualize_reconstruction(
                    {"source": video[:, :1], "video": video}, out
                )
                write_gif(os.path.join(log_dir, name + fmt), grid)

            writer.submit(job)
