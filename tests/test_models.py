"""Golden-value parity tests: flax models vs the torch reference modules.

Strategy: build the torch reference module, copy its state_dict into our flax
model via the checkpoint importer, run both in eval mode on the same inputs,
compare outputs. This validates both the model math and the importer that
loads published checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monkeynet_tpu.models import (
    Discriminator,
    KPDetector,
    KeypointPredictor,
    MotionTransferGenerator,
    MovementEmbedding,
)
from monkeynet_tpu.utils.torch_import import import_state_dict

from .reference_shim import load_reference

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch reference unavailable")

B, D, K, H, W, C = 2, 2, 3, 32, 32, 3


def rand(*shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def make_kp(d=D, seed=1, matrix=True):
    rng = np.random.RandomState(seed)
    kp = {"mean": (rng.rand(B, d, K, 2).astype(np.float32) * 2 - 1) * 0.7}
    if matrix:
        a = rng.randn(B, d, K, 2, 2).astype(np.float32) * 0.05
        kp["var"] = np.matmul(a.transpose(0, 1, 2, 4, 3), a) + 0.02 * np.eye(
            2, dtype=np.float32
        )
    return kp


def to_torch_kp(kp):
    import torch

    return {k: torch.from_numpy(v) for k, v in kp.items()}


def to_jax_kp(kp):
    return {k: jnp.asarray(v) for k, v in kp.items()}


def state_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def t2j_video(x):  # torch (B, C, D, H, W) -> ours (B, D, H, W, C)
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 4, 1)))


def j2t_video(x):
    return np.ascontiguousarray(np.transpose(np.asarray(x), (0, 4, 1, 2, 3)))


@needs_ref
@pytest.mark.parametrize(
    "kwargs",
    [
        dict(use_heatmap=True, heatmap_type="gaussian", norm_const="sum"),
        dict(use_heatmap=True, heatmap_type="difference", norm_const=10),
        dict(
            use_heatmap=True,
            use_difference=True,
            use_deformed_source_image=True,
            add_bg_feature_map=True,
            heatmap_type="difference",
            norm_const=100,
        ),
        dict(use_heatmap=False, use_difference=True, add_bg_feature_map=True),
        dict(use_heatmap=True, scale_factor=0.5),
    ],
)
def test_movement_embedding_parity(kwargs):
    import torch
    from modules.movement_embedding import MovementEmbeddingModule

    ref = MovementEmbeddingModule(
        num_kp=K, kp_variance="matrix", num_channels=C, **kwargs
    )
    ours = MovementEmbedding(num_kp=K, kp_variance="matrix", num_channels=C, **kwargs)

    kp_d, kp_s = make_kp(seed=2), make_kp(d=1, seed=3)
    src = rand(B, C, 1, H, W, seed=4)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(src), to_torch_kp(kp_d), to_torch_kp(kp_s)
        ).numpy()  # (B, C', D, H, W)

    out = ours.apply(
        {}, jnp.asarray(t2j_video(src)), to_jax_kp(kp_d), to_jax_kp(kp_s)
    )
    assert ours.out_channels == ref_out.shape[1]
    np.testing.assert_allclose(j2t_video(out), ref_out, atol=2e-5)


@needs_ref
@pytest.mark.parametrize("variance,clip", [("matrix", None), ("matrix", 0.1), (0.01, None)])
def test_kp_detector_parity(variance, clip):
    import torch
    from modules.keypoint_detector import KPDetector as RefKP

    kwargs = dict(
        block_expansion=8,
        num_kp=K,
        num_channels=C,
        max_features=64,
        num_blocks=3,
        temperature=0.1,
        kp_variance=variance,
        clip_variance=clip,
    )
    torch.manual_seed(0)
    ref = RefKP(**kwargs).eval()
    ours = KPDetector(**kwargs)

    x = rand(B, C, D, H, W, seed=5)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(t2j_video(x)), False)
    variables = import_state_dict(variables, state_np(ref))

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    out = ours.apply(variables, jnp.asarray(t2j_video(x)), False)

    np.testing.assert_allclose(
        np.asarray(out["mean"]), ref_out["mean"].numpy(), atol=1e-4
    )
    if variance == "matrix":
        np.testing.assert_allclose(
            np.asarray(out["var"]), ref_out["var"].numpy(), atol=1e-4
        )


@needs_ref
def test_generator_parity():
    import torch
    from modules.generator import MotionTransferGenerator as RefGen

    common = dict(num_channels=C, num_kp=K, kp_variance="matrix")
    gen_params = dict(
        block_expansion=8,
        max_features=64,
        num_blocks=3,
        num_refinement_blocks=2,
        dense_motion_params=dict(
            block_expansion=8,
            max_features=64,
            num_blocks=3,
            use_mask=True,
            use_correction=True,
            num_group_blocks=1,
            mask_embedding_params=dict(
                use_heatmap=True,
                use_deformed_source_image=True,
                heatmap_type="difference",
                norm_const=10,
            ),
        ),
        kp_embedding_params=dict(
            use_heatmap=True, norm_const=10, heatmap_type="difference"
        ),
    )
    torch.manual_seed(0)
    ref = RefGen(**gen_params, **common).eval()
    ours = MotionTransferGenerator(**gen_params, **common)

    src = rand(B, C, 1, H, W, seed=6)
    kp_d, kp_s = make_kp(seed=7), make_kp(d=1, seed=8)

    variables = ours.init(
        jax.random.PRNGKey(0),
        jnp.asarray(t2j_video(src)),
        to_jax_kp(kp_d),
        to_jax_kp(kp_s),
        False,
    )
    variables = import_state_dict(variables, state_np(ref))

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(src), to_torch_kp(kp_d), to_torch_kp(kp_s))
    out = ours.apply(
        variables,
        jnp.asarray(t2j_video(src)),
        to_jax_kp(kp_d),
        to_jax_kp(kp_s),
        False,
    )

    np.testing.assert_allclose(
        j2t_video(out["video_deformed"]),
        ref_out["video_deformed"].numpy(),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        j2t_video(out["video_prediction"]),
        ref_out["video_prediction"].numpy(),
        atol=2e-4,
    )


@needs_ref
def test_discriminator_parity():
    import torch
    from modules.discriminator import Discriminator as RefDisc

    kwargs = dict(
        num_channels=C,
        num_kp=K,
        kp_variance="matrix",
        block_expansion=8,
        max_features=64,
        num_blocks=3,
        kp_embedding_params=dict(norm_const=10),
    )
    torch.manual_seed(0)
    ref = RefDisc(**kwargs).eval()
    ours = Discriminator(**kwargs)

    x = rand(B, C, D, H, W, seed=9)
    kp_d, kp_s = make_kp(seed=10), make_kp(d=1, seed=11)

    variables = ours.init(
        jax.random.PRNGKey(0),
        jnp.asarray(t2j_video(x)),
        to_jax_kp(kp_d),
        to_jax_kp(kp_s),
    )
    variables = import_state_dict(variables, state_np(ref))

    with torch.no_grad():
        ref_maps = ref(torch.from_numpy(x), to_torch_kp(kp_d), to_torch_kp(kp_s))
    maps = ours.apply(
        variables, jnp.asarray(t2j_video(x)), to_jax_kp(kp_d), to_jax_kp(kp_s)
    )

    assert len(maps) == len(ref_maps)
    for m, rm in zip(maps, ref_maps):
        np.testing.assert_allclose(j2t_video(m), rm.numpy(), atol=2e-4)


@needs_ref
@pytest.mark.parametrize("with_var", [True, False])
def test_keypoint_predictor_parity(with_var):
    import torch
    from modules.prediction_module import PredictionModule

    torch.manual_seed(0)
    ref = PredictionModule(
        num_kp=K,
        kp_variance="matrix" if with_var else 0.01,
        num_features=32,
        num_layers=1,
        dropout=0,
    ).eval()
    ours = KeypointPredictor(
        num_kp=K,
        kp_variance="matrix" if with_var else 0.01,
        num_features=32,
        num_layers=1,
        dropout=0,
    )

    kp = make_kp(d=6, seed=12, matrix=with_var)
    variables = ours.init(jax.random.PRNGKey(0), to_jax_kp(kp))
    variables = import_state_dict(variables, state_np(ref))

    with torch.no_grad():
        ref_out = ref(to_torch_kp(kp))
    out = ours.apply(variables, to_jax_kp(kp))

    np.testing.assert_allclose(
        np.asarray(out["mean"]), ref_out["mean"].numpy(), atol=1e-5
    )
    if with_var:
        np.testing.assert_allclose(
            np.asarray(out["var"]), ref_out["var"].numpy(), atol=1e-5
        )


@needs_ref
def test_kp_detector_scale_factor_parity():
    import torch
    from modules.keypoint_detector import KPDetector as RefKP

    kwargs = dict(
        block_expansion=8, num_kp=K, num_channels=C, max_features=64,
        num_blocks=2, temperature=0.1, kp_variance="matrix", scale_factor=0.5,
    )
    torch.manual_seed(0)
    ref = RefKP(**kwargs).eval()
    ours = KPDetector(**kwargs)
    x = rand(B, C, D, H, W, seed=20)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(t2j_video(x)), False)
    variables = import_state_dict(variables, state_np(ref))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    out = ours.apply(variables, jnp.asarray(t2j_video(x)), False)
    np.testing.assert_allclose(np.asarray(out["mean"]), ref_out["mean"].numpy(), atol=1e-4)


@needs_ref
def test_kp_detector_single_variance_parity():
    import torch
    from modules.keypoint_detector import KPDetector as RefKP

    kwargs = dict(
        block_expansion=8, num_kp=K, num_channels=C, max_features=64,
        num_blocks=2, temperature=0.1, kp_variance="single",
    )
    torch.manual_seed(0)
    ref = RefKP(**kwargs).eval()
    ours = KPDetector(**kwargs)
    x = rand(B, C, D, H, W, seed=21)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(t2j_video(x)), False)
    variables = import_state_dict(variables, state_np(ref))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    out = ours.apply(variables, jnp.asarray(t2j_video(x)), False)
    np.testing.assert_allclose(np.asarray(out["mean"]), ref_out["mean"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["var"]), ref_out["var"].numpy(), atol=1e-4)


@needs_ref
def test_generator_trilinear_and_scale_parity():
    """vox-style recipe: trilinear skip resize + scale_factor'd dense motion
    and kp embedding (modules/generator.py:51-58 trilinear branch)."""
    import torch
    from modules.generator import MotionTransferGenerator as RefGen

    common = dict(num_channels=C, num_kp=K, kp_variance="matrix")
    gen_params = dict(
        interpolation_mode="trilinear",
        block_expansion=8,
        max_features=64,
        num_blocks=3,
        num_refinement_blocks=1,
        dense_motion_params=dict(
            block_expansion=8,
            max_features=64,
            num_blocks=2,
            use_mask=True,
            use_correction=True,
            scale_factor=0.5,
            mask_embedding_params=dict(
                use_heatmap=True,
                use_difference=True,
                heatmap_type="difference",
                norm_const=100,
            ),
        ),
        kp_embedding_params=dict(
            scale_factor=0.5, use_heatmap=True, norm_const=100,
            heatmap_type="difference",
        ),
    )
    torch.manual_seed(0)
    ref = RefGen(**gen_params, **common).eval()
    ours = MotionTransferGenerator(**gen_params, **common)

    src = rand(B, C, 1, H, W, seed=22)
    kp_d, kp_s = make_kp(seed=23), make_kp(d=1, seed=24)
    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(t2j_video(src)),
        to_jax_kp(kp_d), to_jax_kp(kp_s), False,
    )
    variables = import_state_dict(variables, state_np(ref))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(src), to_torch_kp(kp_d), to_torch_kp(kp_s))
    out = ours.apply(
        variables, jnp.asarray(t2j_video(src)),
        to_jax_kp(kp_d), to_jax_kp(kp_s), False,
    )
    np.testing.assert_allclose(
        j2t_video(out["video_prediction"]),
        ref_out["video_prediction"].numpy(),
        atol=2e-4,
    )


@needs_ref
def test_temporal_hourglass_parity():
    """temporal=True (3,3,3) conv path (modules/util.py:139-140), unused by the
    shipped configs but part of the blocks API."""
    import torch
    from modules.util import Hourglass as RefHourglass

    from monkeynet_tpu.models.blocks import Hourglass

    torch.manual_seed(0)
    ref = RefHourglass(
        block_expansion=4, in_features=C, out_features=2, num_blocks=2,
        max_features=16, temporal=True,
    ).eval()
    ours = Hourglass(
        block_expansion=4, out_features=2, num_blocks=2, max_features=16,
        temporal=True,
    )

    x = rand(B, C, 4, 16, 16, seed=30)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(t2j_video(x)), False)
    variables = import_state_dict(variables, state_np(ref))

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = ours.apply(variables, jnp.asarray(t2j_video(x)), False)
    np.testing.assert_allclose(j2t_video(out), ref_out, atol=1e-4)
