"""Reconstruction (self-reenactment) evaluation.

Capability parity with the reference driver (reconstruction.py:28-77): frame 0
of each test video is the appearance source, per-frame keypoints drive the
generator, outputs are saved as lossless stacked PNG + gif grids, and the mean
per-frame L1 against ground truth is printed (the quality north-star metric).

TPU-first: keypoints for all frames and the full animation run as chunked
batched XLA programs (tasks/animate.py) instead of per-frame Python loops.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from monkeynet_tpu.data.io import write_gif, write_stacked_png
from monkeynet_tpu.tasks.animate import Animator, KPExtractor, TransferEngine
from monkeynet_tpu.tasks.build import init_models
from monkeynet_tpu.tasks.metrics import EmbeddingExtractor, aed, akd
from monkeynet_tpu.utils.async_write import AsyncWriter
from monkeynet_tpu.utils.checkpoint import load_any
from monkeynet_tpu.utils.visualizer import Visualizer


def load_eval_models(config, checkpoint, image_shape):
    """Build models and restore generator/kp_detector weights from either a
    monkeynet msgpack checkpoint or a reference torch .pth.tar."""
    import jax

    models, params, batch_stats = init_models(
        config, jax.random.PRNGKey(0), image_shape
    )
    templates = {
        "generator": {"params": params["generator"],
                      "batch_stats": batch_stats["generator"]},
        "kp_detector": {"params": params["kp_detector"],
                        "batch_stats": batch_stats["kp_detector"]},
    }
    loaded = load_any(checkpoint, templates)
    if "state" in loaded:  # our full train checkpoint
        st = loaded["state"]
        gen_vars = {
            "params": st["params"]["generator"],
            "batch_stats": st["batch_stats"]["generator"],
        }
        kp_vars = {
            "params": st["params"]["kp_detector"],
            "batch_stats": st["batch_stats"]["kp_detector"],
        }
    else:
        gen_vars = loaded["generator"]
        kp_vars = loaded["kp_detector"]
    gen_vars = jax.tree.map(jnp.asarray, gen_vars)
    kp_vars = jax.tree.map(jnp.asarray, kp_vars)
    return models, gen_vars, kp_vars


def reconstruction(config, log_dir, dataset, checkpoint, num_devices: int = 1):
    if checkpoint is None:
        raise ValueError("checkpoint is required for reconstruction mode")
    log_dir = os.path.join(log_dir, "reconstruction")
    png_dir = os.path.join(log_dir, "png")
    os.makedirs(png_dir, exist_ok=True)

    image_shape = tuple(config["dataset_params"].get("image_shape", (64, 64, 3)))
    models, gen_vars, kp_vars = load_eval_models(config, checkpoint, image_shape)
    mesh = None
    if num_devices > 1:
        # Frame-axis sharding over a data mesh — the DataParallel-eval
        # equivalent (reference reconstruction.py:45-46); ragged videos are
        # padded to a mesh multiple inside the engine and trimmed after.
        from monkeynet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(num_devices)
    # Self-reenactment is transfer with identity normalization: frame 0 is the
    # source, per-frame kp drive unchanged — so the fused engine applies
    # (kp detect + generate in one program per chunk).
    engine = TransferEngine(
        models["generator"], models["kp_detector"], gen_vars, kp_vars,
        move_location=False, mesh=mesh,
    )
    visualizer = Visualizer(**(config.get("visualizer_params") or {}))
    # Paper metrics (arXiv:1812.08861): AKD via our own kp detector on
    # gt-vs-generated frames, AED via a frozen seed-fixed embedder by default
    # (checkpoint-independent; set reconstruction_params.aed_embedder:
    # appearance for the generator's own encoder — see tasks/metrics.py).
    kp_extractor = KPExtractor(models["kp_detector"], kp_vars, mesh=mesh)
    embedder = EmbeddingExtractor(
        config, gen_vars,
        embedder=config["reconstruction_params"].get("aed_embedder", "frozen"),
    )

    num_videos = config["reconstruction_params"]["num_videos"]
    fmt = config["reconstruction_params"].get("format", ".gif")

    loss_list, akd_list, aed_list = [], [], []
    # Artifact encoding (stacked PNG + imageio gif palette quantization)
    # dominates eval wall-clock at 256^2; run it on a background writer so
    # it overlaps the NEXT video's device compute instead of serializing
    # with it. close() below flushes before metrics are reported.
    with AsyncWriter(name="monkeynet-recon-vis") as writer:
        for it in range(len(dataset)):
            # reference stops AFTER processing index == num_videos
            if num_videos is not None and it > num_videos:
                break
            x = dataset[it]
            video = x["video"][None]  # (1, D, H, W, C)
            source = video[:, :1]

            dev_out = engine(jnp.asarray(source), jnp.asarray(video))
            out = {
                "video_prediction": np.asarray(dev_out["video_prediction"]),
                "video_deformed": np.asarray(dev_out["video_deformed"]),
                "kp_driving": {
                    k: np.asarray(v) for k, v in dev_out["kp_driving"].items()
                },
                "kp_source": {
                    k: np.asarray(v) for k, v in dev_out["kp_source"].items()
                },
            }

            def job(name=x["name"], source=source, video=video, out=out):
                write_stacked_png(
                    os.path.join(png_dir, name + ".png"),
                    out["video_prediction"][0],
                )
                grid = visualizer.visualize_reconstruction(
                    {"source": source, "video": video}, out
                )
                write_gif(os.path.join(log_dir, name + fmt), grid)

            writer.submit(job)

            loss_list.append(
                float(np.abs(out["video_prediction"] - video).mean())
            )
            # kp_driving IS kp(gt frames) in self-reenactment; compare against
            # kp detected on the generated frames.
            kp_pred = kp_extractor(dev_out["video_prediction"])
            akd_list.append(akd(out["kp_driving"], kp_pred, image_shape))
            aed_list.append(
                aed(embedder(video), embedder(dev_out["video_prediction"]))
            )

    metrics = {
        "l1": float(np.mean(loss_list)),
        "akd": float(np.mean(akd_list)),
        "aed": float(np.mean(aed_list)),
    }
    print("Reconstruction loss: %s" % metrics["l1"])
    print("AKD (self-detector, px): %s" % metrics["akd"])
    print(
        "AED (%s-embedder proxy): %s" % (embedder.embedder, metrics["aed"])
    )
    return metrics
