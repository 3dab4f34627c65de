"""Construct the three networks from a config dict (reference: run.py:50-66)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from monkeynet_tpu.models import Discriminator, KPDetector, MotionTransferGenerator


def build_models(config: dict, axis_name: Optional[str] = None):
    mp = config["model_params"]
    common = mp["common_params"]
    generator = MotionTransferGenerator(
        axis_name=axis_name, **mp["generator_params"], **common
    )
    discriminator = Discriminator(**mp["discriminator_params"], **common)
    kp_detector = KPDetector(
        axis_name=axis_name, **mp["kp_detector_params"], **common
    )
    return generator, discriminator, kp_detector


def init_models(config: dict, rng: jax.Array, image_shape, axis_name=None):
    """Initialize all three models' variables on dummy data.

    image_shape: (H, W, C). Returns (models, params, batch_stats) where params
    and batch_stats are dicts keyed by 'generator'/'discriminator'/'kp_detector'.
    """
    generator, discriminator, kp_detector = build_models(config, axis_name)
    H, W, C = image_shape
    K = config["model_params"]["common_params"]["num_kp"]
    kp_variance = config["model_params"]["common_params"]["kp_variance"]

    source = jnp.zeros((1, 1, H, W, C), jnp.float32)
    video = jnp.zeros((1, 1, H, W, C), jnp.float32)
    kp = {"mean": jnp.zeros((1, 1, K, 2), jnp.float32)}
    if kp_variance == "matrix":
        kp["var"] = jnp.tile(jnp.eye(2) * 0.1, (1, 1, K, 1, 1))
    elif kp_variance == "single":
        kp["var"] = jnp.full((1, 1, K, 1, 1), 0.1, jnp.float32)

    # Init in eval mode: identical variable structure, and the cross-replica
    # psum in train-mode BN must not trace outside the mesh. The inits are
    # jitted — eager init dispatches thousands of tiny ops, which is painfully
    # slow through a remote-device tunnel.
    rng_g, rng_d, rng_k = jax.random.split(rng, 3)
    kp_vars = jax.jit(lambda r, v: kp_detector.init(r, v, False))(rng_k, video)
    gen_vars = jax.jit(lambda r, s, k: generator.init(r, s, k, k, False))(
        rng_g, source, kp
    )
    disc_vars = jax.jit(lambda r, v, k: discriminator.init(r, v, k, k))(
        rng_d, video, kp
    )

    params = {
        "generator": gen_vars["params"],
        "discriminator": disc_vars["params"],
        "kp_detector": kp_vars["params"],
    }
    batch_stats = {
        "generator": gen_vars.get("batch_stats", {}),
        "kp_detector": kp_vars.get("batch_stats", {}),
    }
    models = {
        "generator": generator,
        "discriminator": discriminator,
        "kp_detector": kp_detector,
    }
    return models, params, batch_stats
