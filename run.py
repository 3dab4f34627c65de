#!/usr/bin/env python
"""monkeynet_tpu CLI — train / reconstruction / transfer / prediction.

Capability parity with the reference entry point (run.py:22-81):

    python run.py --config configs/shapes.yaml --mode train
    python run.py --config configs/shapes.yaml --mode reconstruction \
        --checkpoint <ckpt>
    python run.py --config configs/taichi.yaml --mode transfer --checkpoint ...
    python run.py --config configs/vox.yaml --mode prediction --checkpoint ...

Extra flags vs the reference: --num_devices N shards training data-parallel
over a jax.sharding.Mesh (replaces --device_ids), --platform forces a jax
backend (e.g. cpu for smoke runs).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="path to config yaml")
    parser.add_argument(
        "--mode",
        default="train",
        choices=["train", "reconstruction", "transfer", "prediction"],
    )
    parser.add_argument("--log_dir", default="log", help="root log directory")
    parser.add_argument("--checkpoint", default=None, help="checkpoint to restore")
    parser.add_argument(
        "--num_devices",
        type=int,
        default=1,
        help="data-parallel mesh size: batch-sharded training, "
        "frame-sharded eval (1 = single chip)",
    )
    parser.add_argument(
        "--platform", default=None, help="force a jax platform (cpu/tpu)"
    )
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="join the JAX multi-host runtime (jax.distributed.initialize; "
        "configure via JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
        "JAX_PROCESS_ID or cloud-TPU auto-detection)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of train steps 10-20 into DIR",
    )
    parser.add_argument("--verbose", action="store_true", help="print models")
    opt = parser.parse_args()

    if opt.distributed:
        # Must run before any backend initialization (see
        # parallel/distributed.py for the multi-host posture).
        from monkeynet_tpu.parallel.distributed import (
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed()

    from monkeynet_tpu.utils.jax_setup import setup_jax

    setup_jax(opt.platform)

    from monkeynet_tpu.data.dataset import FramesDataset
    from monkeynet_tpu.utils.config import load_config, prepare_log_dir

    config = load_config(opt.config)
    log_dir = prepare_log_dir(opt.config, opt.log_dir, opt.checkpoint)

    if opt.verbose:
        from monkeynet_tpu.tasks.build import build_models

        for m in build_models(config):
            print(m)

    dataset = FramesDataset(
        is_train=(opt.mode == "train"), **config["dataset_params"]
    )

    if opt.mode == "train":
        print("Training...")
        from monkeynet_tpu.tasks.train_loop import train

        train(
            config,
            log_dir,
            dataset,
            checkpoint=opt.checkpoint,
            seed=opt.seed,
            num_devices=opt.num_devices,
            profile_dir=opt.profile,
        )
    elif opt.mode == "reconstruction":
        print("Reconstruction...")
        from monkeynet_tpu.tasks.reconstruction import reconstruction

        reconstruction(
            config, log_dir, dataset, opt.checkpoint,
            num_devices=opt.num_devices,
        )
    elif opt.mode == "transfer":
        print("Transfer...")
        from monkeynet_tpu.tasks.transfer import transfer

        transfer(
            config, log_dir, dataset, opt.checkpoint,
            num_devices=opt.num_devices,
        )
    elif opt.mode == "prediction":
        print("Prediction...")
        from monkeynet_tpu.tasks.prediction import prediction

        prediction(
            config, log_dir, opt.checkpoint, num_devices=opt.num_devices
        )


if __name__ == "__main__":
    main()
