"""Train-step tests: the fused GAN step runs, losses are finite, and the
8-device sharded step produces the SAME parameter update as single-device on
the same global batch (grads pmean + BN psum invariant)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monkeynet_tpu.parallel.mesh import make_sharded_train_step
from monkeynet_tpu.tasks.build import init_models
from monkeynet_tpu.tasks.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    metric_names,
    multistep_lr,
)

TINY_CONFIG = {
    "model_params": {
        "common_params": {"num_kp": 3, "kp_variance": "matrix", "num_channels": 3},
        "kp_detector_params": {
            "temperature": 0.1,
            "block_expansion": 4,
            "max_features": 32,
            "num_blocks": 2,
        },
        "generator_params": {
            "block_expansion": 4,
            "max_features": 32,
            "num_blocks": 2,
            "num_refinement_blocks": 1,
            "dense_motion_params": {
                "block_expansion": 4,
                "max_features": 32,
                "num_blocks": 2,
                "use_mask": True,
                "use_correction": True,
                "mask_embedding_params": {
                    "use_heatmap": True,
                    "use_deformed_source_image": True,
                    "heatmap_type": "difference",
                    "norm_const": 10,
                },
            },
            "kp_embedding_params": {
                "use_heatmap": True,
                "norm_const": 10,
                "heatmap_type": "difference",
            },
        },
        "discriminator_params": {
            "kp_embedding_params": {"norm_const": 10},
            "block_expansion": 4,
            "max_features": 32,
            "num_blocks": 2,
        },
    },
    "train_params": {
        "detach_kp_generator": False,
        "detach_kp_discriminator": True,
        "num_epochs": 1,
        "epoch_milestones": [1],
        "lr": 2.0e-4,
        "batch_size": 8,
        "loss_weights": {
            "reconstruction": [10, 10, 1],
            "reconstruction_deformed": 0,
            "generator_gan": 1,
            "discriminator_gan": 1,
        },
    },
    "dataset_params": {"image_shape": [16, 16, 3]},
}


def _batch(B=8, H=16, W=16):
    rng = np.random.RandomState(0)
    return {
        "source": jnp.asarray(rng.rand(B, 1, H, W, 3).astype(np.float32)),
        "video": jnp.asarray(rng.rand(B, 1, H, W, 3).astype(np.float32)),
    }


def _setup(axis_name=None, sgd=False):
    models, params, stats = init_models(
        TINY_CONFIG, jax.random.PRNGKey(0), (16, 16, 3), axis_name=axis_name
    )
    tp = TINY_CONFIG["train_params"]
    if sgd:
        # Plain SGD makes the post-step param delta equal the gradient, so the
        # sharded-vs-single comparison tests the psum/pmean math directly
        # (Adam's sign(g) behavior amplifies reduction-order noise on ~0 grads).
        import optax

        optimizer = optax.sgd(1.0)
    else:
        optimizer = make_optimizer(multistep_lr(tp["lr"], tp["epoch_milestones"], 10))
    state = create_train_state(params, stats, optimizer)
    return models, optimizer, state, tp


def test_single_device_step_runs():
    models, optimizer, state, tp = _setup()
    step = jax.jit(make_train_step(models, tp, optimizer))
    batch = _batch()
    state1, out = step(state, batch)
    metrics = np.asarray(out["metrics"])
    assert metrics.shape == (len(metric_names(tp)),)
    assert np.all(np.isfinite(metrics))
    assert int(state1.step) == 1
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            state.params["generator"],
            state1.params["generator"],
        ),
    )
    assert delta > 0


def test_uint8_feed_matches_float_feed():
    """feed_dtype=uint8 ships batches at 1/4 the bytes; the step rescales
    on-device. A uint8 batch must produce the same update as feeding the
    equivalent float batch. SGD fixture so the post-step delta IS the
    gradient; the two feeds compile to different programs (different input
    dtypes -> different fusions), so allow fusion-level float drift —
    Adam's sqrt-normalized first step would amplify it into noise."""
    models, optimizer, state, tp = _setup(sgd=True)
    step = jax.jit(make_train_step(models, tp, optimizer))
    rng = np.random.RandomState(3)
    u8 = {
        "source": rng.randint(0, 256, (8, 1, 16, 16, 3), dtype=np.uint8),
        "video": rng.randint(0, 256, (8, 1, 16, 16, 3), dtype=np.uint8),
    }
    f32 = {k: (v.astype(np.float32) / 255.0) for k, v in u8.items()}
    s_u8, out_u8 = step(state, {k: jnp.asarray(v) for k, v in u8.items()})
    s_f, out_f = step(state, {k: jnp.asarray(v) for k, v in f32.items()})
    np.testing.assert_allclose(
        np.asarray(out_u8["metrics"]), np.asarray(out_f["metrics"]),
        rtol=1e-6, atol=1e-6,
    )
    leaves_u8 = jax.tree.leaves(s_u8.params)
    leaves_f = jax.tree.leaves(s_f.params)
    for a, b in zip(leaves_u8, leaves_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_step_matches_single_device():
    batch = _batch()

    models, optimizer, state, tp = _setup(axis_name=None, sgd=True)
    step = jax.jit(make_train_step(models, tp, optimizer))
    ref_state, ref_out = step(state, batch)

    models_s, optimizer_s, state_s, _ = _setup(axis_name="data", sgd=True)
    sharded = make_sharded_train_step(models_s, tp, optimizer_s, num_devices=8)
    new_state, out = sharded(state_s, batch)

    np.testing.assert_allclose(
        np.asarray(out["metrics"]), np.asarray(ref_out["metrics"]), atol=1e-4
    )
    flat_ref = jax.tree.leaves(ref_state.params)
    flat_new = jax.tree.leaves(new_state.params)
    for a, b in zip(flat_ref, flat_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    # BN running stats identical too
    for a, b in zip(
        jax.tree.leaves(ref_state.batch_stats), jax.tree.leaves(new_state.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_remat_matches_standard_step():
    """remat recomputes forwards in the backward pass; gradients must match."""
    import copy
    import optax

    batch = _batch()
    models, params, stats = init_models(
        TINY_CONFIG, jax.random.PRNGKey(0), (16, 16, 3)
    )
    opt = optax.sgd(1.0)

    tp = TINY_CONFIG["train_params"]
    state = create_train_state(params, stats, opt)
    ref_state, ref_out = jax.jit(make_train_step(models, tp, opt))(state, batch)

    tp2 = copy.deepcopy(tp)
    tp2["remat"] = True
    state2 = create_train_state(params, stats, opt)
    new_state, out = jax.jit(make_train_step(models, tp2, opt))(state2, batch)

    np.testing.assert_allclose(
        np.asarray(out["metrics"]), np.asarray(ref_out["metrics"]), atol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(new_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# ---------------------------------------------------------------- scan-of-k


def test_largest_divisor_leq():
    from monkeynet_tpu.tasks.train import largest_divisor_leq

    assert largest_divisor_leq(4500, 8) == 6
    assert largest_divisor_leq(3200, 8) == 8
    assert largest_divisor_leq(997, 8) == 1  # prime -> single-step
    assert largest_divisor_leq(5, 100) == 5  # k clamped to n
    assert largest_divisor_leq(1, 8) == 1


def test_multi_step_matches_k_single_steps():
    """ONE scan-of-k dispatch must produce exactly the same state and
    per-step metrics as k sequential single-step dispatches on the same
    batch sequence."""
    from monkeynet_tpu.tasks.train import make_multi_train_step

    models, optimizer, state, tp = _setup()
    step = jax.jit(make_train_step(models, tp, optimizer))
    multi = jax.jit(make_multi_train_step(models, tp, optimizer))

    K = 3
    rng = np.random.RandomState(1)
    batches = [
        {
            "source": jnp.asarray(rng.rand(4, 1, 16, 16, 3).astype(np.float32)),
            "video": jnp.asarray(rng.rand(4, 1, 16, 16, 3).astype(np.float32)),
        }
        for _ in range(K)
    ]

    ref_state = state
    ref_metrics, ref_vp = [], []
    for b in batches:
        ref_state, out = step(ref_state, b)
        ref_metrics.append(np.asarray(out["metrics"]))
        ref_vp.append(np.asarray(out["video_prediction"]))

    stacked = {
        key: jnp.stack([b[key] for b in batches]) for key in ("source", "video")
    }
    multi_state, multi_out = multi(state, stacked)

    assert int(multi_state.step) == K
    # Per-step metrics matching pins every step's forward — step k's metrics
    # depend on the updates of steps < k, so this verifies the whole chain.
    np.testing.assert_allclose(
        np.asarray(multi_out["metrics"]), np.stack(ref_metrics),
        rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(multi_out["video_prediction"]), np.stack(ref_vp),
        rtol=1e-4, atol=1e-5,
    )
    # Param equality under SGD (Adam's rsqrt of ~0 second moments amplifies
    # program-order float noise into lr-scale deltas; SGD deltas ARE the
    # gradient sums, so this compares the update math directly).
    import optax

    models_g, _, _, _ = _setup()
    sgd = optax.sgd(1e-3)
    state_g = create_train_state(
        jax.tree.map(lambda a: a, state.params), state.batch_stats, sgd
    )
    step_g = jax.jit(make_train_step(models_g, tp, sgd))
    multi_g = jax.jit(make_multi_train_step(models_g, tp, sgd))
    ref_g = state_g
    for b in batches:
        ref_g, _ = step_g(ref_g, b)
    multi_gs, _ = multi_g(state_g, stacked)
    for name in ("generator", "discriminator", "kp_detector"):
        for pa, pb in zip(
            jax.tree.leaves(multi_gs.params[name]),
            jax.tree.leaves(ref_g.params[name]),
        ):
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), rtol=1e-4, atol=1e-5
            )


def test_sharded_multi_step_matches_single_device():
    """scan-of-k over the 8-device mesh == scan-of-k single-device on the
    same global batches (grads pmean + BN psum invariant, chunked)."""
    from monkeynet_tpu.parallel.mesh import make_sharded_multi_train_step
    from monkeynet_tpu.tasks.train import make_multi_train_step

    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")

    import optax

    # Small-lr SGD: the K=2 trajectory stays close enough that psum/pmean
    # reduction-order noise doesn't amplify through the nonlinear model
    # (sgd=1.0 is fine for the existing ONE-step test, but diverges by
    # ~1e-3 on step 2's params).
    models, _, state, tp = _setup()
    models_s, _, state_s, _ = _setup(axis_name="data")
    optimizer = optimizer_s = optax.sgd(1e-3)
    state = create_train_state(state.params, state.batch_stats, optimizer)
    state_s = create_train_state(state_s.params, state_s.batch_stats, optimizer)

    K = 2
    rng = np.random.RandomState(2)
    stacked = {
        "source": jnp.asarray(rng.rand(K, 8, 1, 16, 16, 3).astype(np.float32)),
        "video": jnp.asarray(rng.rand(K, 8, 1, 16, 16, 3).astype(np.float32)),
    }

    single = jax.jit(make_multi_train_step(models, tp, optimizer))
    ref_state, ref_out = single(state, stacked)

    sharded = make_sharded_multi_train_step(models_s, tp, optimizer_s,
                                            num_devices=8)
    new_state, out = sharded(state_s, stacked)

    np.testing.assert_allclose(
        np.asarray(out["metrics"]), np.asarray(ref_out["metrics"]),
        rtol=1e-4, atol=1e-5,
    )
    for pa, pb in zip(
        jax.tree.leaves(new_state.params["generator"]),
        jax.tree.leaves(ref_state.params["generator"]),
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-3, atol=1e-5
        )
