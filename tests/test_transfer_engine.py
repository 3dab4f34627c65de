"""TransferEngine (fused kp+normalize+generate) must match the unfused path."""

import numpy as np

import jax
import jax.numpy as jnp

from monkeynet_tpu.tasks.animate import Animator, KPExtractor, TransferEngine
from monkeynet_tpu.tasks.build import init_models
from monkeynet_tpu.tasks.transfer import normalize_kp

from .test_train import TINY_CONFIG


def test_transfer_engine_matches_unfused():
    models, params, bs = init_models(TINY_CONFIG, jax.random.PRNGKey(0), (16, 16, 3))
    gen_vars = {"params": params["generator"], "batch_stats": bs["generator"]}
    kp_vars = {"params": params["kp_detector"], "batch_stats": bs["kp_detector"]}

    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.rand(1, 1, 16, 16, 3).astype(np.float32))
    driving = jnp.asarray(rng.rand(1, 7, 16, 16, 3).astype(np.float32))

    # unfused: extract -> host normalize -> animate (chunk smaller than video)
    extract = KPExtractor(models["kp_detector"], kp_vars, chunk=4)
    animate = Animator(models["generator"], gen_vars, chunk=4)
    kp_driving = extract(driving)
    kp_source = extract(source)
    kp_norm = normalize_kp(kp_driving, kp_source, move_location=True)
    ref = animate(source, kp_norm, kp_source)

    engine = TransferEngine(
        models["generator"], models["kp_detector"], gen_vars, kp_vars,
        chunk=4, move_location=True,
    )
    out = engine(source, driving)

    np.testing.assert_allclose(
        np.asarray(out["video_prediction"]), ref["video_prediction"], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["video_deformed"]), ref["video_deformed"], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["kp_norm"]["mean"]), kp_norm["mean"], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["kp_driving"]["mean"]), kp_driving["mean"], atol=1e-5
    )


def test_length_bucketing_trims_correctly():
    """Ragged video lengths map to 16-frame buckets; outputs are trimmed to
    the true length and unaffected by the padding frames."""
    models, params, bs = init_models(TINY_CONFIG, jax.random.PRNGKey(0), (16, 16, 3))
    gen_vars = {"params": params["generator"], "batch_stats": bs["generator"]}
    kp_vars = {"params": params["kp_detector"], "batch_stats": bs["kp_detector"]}
    engine = TransferEngine(
        models["generator"], models["kp_detector"], gen_vars, kp_vars,
        chunk=32, move_location=True,
    )

    rng = np.random.RandomState(3)
    source = jnp.asarray(rng.rand(1, 1, 16, 16, 3).astype(np.float32))
    video = jnp.asarray(rng.rand(1, 13, 16, 16, 3).astype(np.float32))

    out13 = engine(source, video)
    assert out13["video_prediction"].shape[1] == 13
    # a 5-frame prefix must produce the same frames (same bucket, trimmed)
    out5 = engine(source, video[:, :5])
    assert out5["video_prediction"].shape[1] == 5
    np.testing.assert_allclose(
        np.asarray(out5["video_prediction"]),
        np.asarray(out13["video_prediction"][:, :5]),
        atol=1e-5,
    )
