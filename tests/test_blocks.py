"""Unit tests for blocks.py edge cases (ADVICE round 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monkeynet_tpu.models.blocks import Conv3D


def test_grouped_conv_rejects_indivisible_channels():
    # 10 in-channels over 3 groups: floor division would silently drop the
    # trailing input channel; must raise instead (flax nn.Conv parity).
    m = Conv3D(features=9, kernel_size=(1, 1, 1), padding=(0, 0, 0), groups=3)
    x = jnp.ones((2, 1, 4, 4, 10))
    with pytest.raises(ValueError, match="divisible by groups"):
        m.init(jax.random.PRNGKey(0), x)

    m2 = Conv3D(features=10, kernel_size=(1, 1, 1), padding=(0, 0, 0), groups=3)
    x2 = jnp.ones((2, 1, 4, 4, 9))
    with pytest.raises(ValueError, match="divisible by groups"):
        m2.init(jax.random.PRNGKey(0), x2)


def test_grouped_conv_promotes_bf16_input_like_nn_conv():
    # dtype=None + bf16 input + f32 params: must promote (like
    # flax.linen.Conv) instead of raising a lax dtype-mismatch error.
    m = Conv3D(features=8, kernel_size=(1, 3, 3), padding=(0, 1, 1), groups=2)
    x32 = jnp.asarray(np.random.RandomState(0).rand(2, 1, 4, 4, 8), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x32)
    y16 = m.apply(variables, x32.astype(jnp.bfloat16))
    assert y16.dtype == jnp.float32  # promoted to param dtype
    y32 = m.apply(variables, x32)
    np.testing.assert_allclose(
        np.asarray(y16), np.asarray(y32), rtol=0, atol=0.05
    )


class TestFusedUpsampleConv:
    """_PhaseUpConv2D == resize_nearest(2x) |> conv3x3 SAME, exactly.

    The fused lhs-dilated (transposed-conv) formulation must be
    value-equivalent (up to float summation order) to the materialized form
    for every (H, W) including odd sizes, must keep the (3,3,Cin,Cout) param
    tree of the plain conv, and must carry gradients through the tap-sum
    reparameterization.
    """

    def _both(self, H, W, cin=5, cout=7, seed=0):
        from monkeynet_tpu.models.blocks import _PhaseUpConv2D
        from monkeynet_tpu.ops.sampling import resize_nearest

        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(2, H, W, cin).astype(np.float32))
        m = _PhaseUpConv2D(
            cout, True, None,
            jax.nn.initializers.normal(1.0),
            jax.nn.initializers.normal(1.0),
        )
        variables = m.init(jax.random.PRNGKey(seed), x)
        fused = m.apply(variables, x)

        k = variables["params"]["kernel"]
        b = variables["params"]["bias"]
        up = resize_nearest(x, (2 * H, 2 * W))
        ref = jax.lax.conv_general_dilated(
            up, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return fused, ref, variables, x, m

    @pytest.mark.parametrize("hw", [(4, 4), (5, 3), (1, 1), (7, 8)])
    def test_value_equivalence(self, hw):
        fused, ref, *_ = self._both(*hw)
        assert fused.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_param_tree_matches_plain_conv(self):
        *_, variables, _, _ = self._both(4, 4, cin=5, cout=7)
        assert variables["params"]["kernel"].shape == (3, 3, 5, 7)
        assert variables["params"]["bias"].shape == (7,)

    def test_gradients_match_materialized_form(self):
        from monkeynet_tpu.ops.sampling import resize_nearest

        fused, ref, variables, x, m = self._both(4, 6)

        def loss_fused(p):
            return jnp.sum(m.apply({"params": p}, x) ** 2)

        def loss_ref(p):
            up = resize_nearest(x, (2 * x.shape[1], 2 * x.shape[2]))
            y = jax.lax.conv_general_dilated(
                up, p["kernel"], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["bias"]
            return jnp.sum(y ** 2)

        g1 = jax.grad(loss_fused)(variables["params"])
        g2 = jax.grad(loss_ref)(variables["params"])
        for k in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-4, atol=1e-4
            )

    def test_env_gate_switches_paths_and_values_match(self, monkeypatch):
        # MONKEYNET_FUSED_UPCONV=0 must restore the materialized
        # upsample+conv (no lhs_dilation in the jaxpr), with the same param
        # tree and the same values — bench.py counts model-formulation
        # FLOPs through this gate.
        from monkeynet_tpu.models.blocks import UpBlock

        x = jnp.asarray(
            np.random.RandomState(1).randn(2, 1, 6, 6, 5).astype(np.float32)
        )
        m = UpBlock(features=4)
        variables = m.init(jax.random.PRNGKey(1), x, True)
        y_fused = m.apply(variables, x, False)
        jaxpr_fused = str(jax.make_jaxpr(lambda v: m.apply(v, x, False))(variables))
        assert "lhs_dilation=(2, 2)" in jaxpr_fused

        monkeypatch.setenv("MONKEYNET_FUSED_UPCONV", "0")
        y_plain = m.apply(variables, x, False)
        jaxpr_plain = str(jax.make_jaxpr(lambda v: m.apply(v, x, False))(variables))
        assert "lhs_dilation=(2, 2)" not in jaxpr_plain
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_plain), rtol=1e-5, atol=1e-5
        )

    def test_upblock_uses_fused_path_with_same_checkpoint_tree(self):
        # An UpBlock initialized before this change must restore bit-for-bit:
        # same param names, shapes, and (torch-default) init distribution.
        from monkeynet_tpu.models.blocks import UpBlock

        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 1, 4, 4, 6).astype(np.float32)
        )
        m = UpBlock(features=8)
        variables = m.init(jax.random.PRNGKey(0), x, True)
        p = variables["params"]
        assert p["conv"]["conv"]["kernel"].shape == (3, 3, 6, 8)
        assert p["conv"]["conv"]["bias"].shape == (8,)
        y = m.apply(variables, x, False)
        assert y.shape == (2, 1, 8, 8, 8)
