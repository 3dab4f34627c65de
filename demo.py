#!/usr/bin/env python
"""Single-pair motion-transfer demo (reference: demo.py:23-71).

    python demo.py --config configs/moving-gif.yaml --checkpoint <ckpt>

Defaults to the bundled demo pair (data/demo/driving.png, data/demo/source.png
— the reference's sup-mat demo inputs, shipped so the demo runs out of the box
like the reference's demo.py:27-28). Reads a driving "video" (stacked-frame
PNG or gif/mp4) and a source image, runs relative-keypoint transfer, writes an
animated gif.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

_HERE = os.path.dirname(os.path.abspath(__file__))


def run_demo(config, checkpoint, driving_video, source_image, out_file,
             image_shape=(128, 128)):
    """Programmatic demo entry (also used by the smoke test)."""
    from monkeynet_tpu.data.io import read_video, write_gif
    from monkeynet_tpu.tasks.animate import Animator, KPExtractor
    from monkeynet_tpu.tasks.reconstruction import load_eval_models
    from monkeynet_tpu.tasks.transfer import transfer_one
    from monkeynet_tpu.utils.config import load_config

    if isinstance(config, str):
        config = load_config(config)
    shape = tuple(image_shape) + (3,)

    driving = read_video(driving_video, shape)[None]  # (1, D, H, W, C)
    source = read_video(source_image, shape)[None, :1]

    models, gen_vars, kp_vars = load_eval_models(config, checkpoint, shape)
    animate = Animator(models["generator"], gen_vars)
    extract_kp = KPExtractor(models["kp_detector"], kp_vars)

    out = transfer_one(
        animate, extract_kp, source, driving, config["transfer_params"]
    )
    write_gif(out_file, out["video_prediction"][0])
    print(f"wrote {out_file}")
    return out


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out_file", default="demo.gif")
    parser.add_argument(
        "--driving_video", default=os.path.join(_HERE, "data/demo/driving.png")
    )
    parser.add_argument(
        "--source_image", default=os.path.join(_HERE, "data/demo/source.png")
    )
    parser.add_argument(
        "--image_shape",
        default=(128, 128),
        type=lambda x: tuple(int(a) for a in x.split(",")),
    )
    parser.add_argument("--platform", default=None)
    opt = parser.parse_args()

    from monkeynet_tpu.utils.jax_setup import setup_jax

    setup_jax(opt.platform)

    run_demo(
        opt.config,
        opt.checkpoint,
        opt.driving_video,
        opt.source_image,
        opt.out_file,
        opt.image_shape,
    )


if __name__ == "__main__":
    main()
